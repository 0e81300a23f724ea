"""Shared CLI plumbing for the serving frontends (wss, openai_http).

Both servers sit on the same continuous-batching core and take the
same engine knobs; keeping the argparse surface and the
LLMContext-construction in one place stops the two mains drifting
apart (they had already diverged on the --kv_cache spelling)."""

from __future__ import annotations

import argparse


def add_engine_args(ap: argparse.ArgumentParser, port: int) -> None:
    """Engine/serving flags shared by every .bin-serving frontend."""
    ap.add_argument("--model", required=True, help=".bin model path")
    ap.add_argument("--lora", default=None, action="append",
                    help="LoRA .bin; bare path = attach to the base "
                         "model, name=path (repeatable) = serve it as a "
                         "selectable variant sharing the base weights "
                         "(route with {\"model\": name})")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=port)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--burst", type=int, default=1,
                    help="tokens decoded per dispatch (multi-step "
                         "scheduling; higher = more throughput, chunkier "
                         "streaming)")
    ap.add_argument("--replicas", type=int, default=1,
                    help="data-parallel serving: copy the model to N "
                         "devices, one continuous-batching engine each")
    ap.add_argument("--max_seq_len", type=int, default=None)
    ap.add_argument("--kv_cache", default="int8",
                    choices=["model", "int8", "bf16"],
                    help="int8 (the serving default) halves KV-cache HBM "
                         "and lifted 32-slot aggregate throughput 57%% at "
                         "the 0.6B shape (PERF.md); 'model' keeps the "
                         "model dtype for C-engine value parity ('bf16' "
                         "is an alias for 'model')")
    ap.add_argument("--spec", type=int, default=0, metavar="K",
                    help="speculative serving: draft K tokens per slot by "
                         "n-gram prompt lookup; greedy streams (any "
                         "rep-penalty) emit up to K+1 tokens per sweep "
                         "with identical output (serve/batching.py)")
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile every prefill/decode bucket before "
                         "accepting connections (a few minutes on a cold "
                         "compile cache; no client then hits an XLA "
                         "compile pause)")
    ap.add_argument("-t", "--temperature", type=float, default=1.0)
    ap.add_argument("-p", "--top_p", type=float, default=0.8)
    ap.add_argument("-r", "--repetition_penalty", type=float, default=1.05)


def build_ctx(args):
    """LLMContext + routable-adapter registry from parsed engine args."""
    import jax.numpy as jnp

    from nano_tpu.infer import engine
    from nano_tpu.ops import sampling

    loader = (engine.LLMContext.from_gguf
              if args.model.endswith(".gguf")
              else engine.LLMContext.from_bin)
    ctx = loader(
        args.model, max_seq_len=args.max_seq_len,
        kv_cache_dtype=jnp.int8 if args.kv_cache == "int8" else None,
        spec_k=args.spec,
        sampler=sampling.SamplerConfig(
            temperature=args.temperature, top_p=args.top_p,
            repetition_penalty=args.repetition_penalty))
    adapters = {}
    for entry in args.lora or []:
        if "=" in entry:
            name, path = entry.split("=", 1)
            adapters[name] = path
        else:
            ctx.load_lora(entry)       # attach to the base model
    return ctx, (adapters or None)
