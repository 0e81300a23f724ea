#!/usr/bin/env python
"""Interactive inference REPL (TPU engine).

Mirrors the reference PyTorch CLI (reference: infer.py): loads a training
checkpoint (.npz) or an exported .bin, wraps prompts in the instruct
template, streams tokens typewriter-style, reports TPS, supports LoRA and
the denoise decode mode.

    python infer.py -i -m checkpoint.npz [-l lora.npz] [-p]
    python infer.py -i -m model.bin [-l lora.bin]
    python infer.py -m model.bin -q "one-shot prompt"
    python infer.py -d -m denoise_model.npz        # denoise generation
"""

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser(description="Nano TPU inference")
    ap.add_argument("-m", "--model", required=True,
                    help=".npz checkpoint or .bin model file")
    ap.add_argument("-l", "--lora", default=None)
    ap.add_argument("-i", "--instruct", action="store_true",
                    help="wrap prompts in the instruct/chat template")
    ap.add_argument("-p", "--profile", action="store_true",
                    help="print tokens/sec")
    ap.add_argument("-d", "--denoise", action="store_true")
    ap.add_argument("-q", "--prompt", default=None, help="one-shot prompt")
    ap.add_argument("-n", "--max_new_tokens", type=int, default=512)
    ap.add_argument("-c", "--max_seq_len", type=int, default=None)
    ap.add_argument("-t", "--temperature", type=float, default=1.0)
    ap.add_argument("--top_p", type=float, default=0.8)
    ap.add_argument("-r", "--repetition_penalty", type=float, default=1.05)
    ap.add_argument("-s", "--seed", type=int, default=39)
    ap.add_argument("--spec", type=int, default=0, metavar="K",
                    help="speculative greedy decode: draft K tokens by "
                         "n-gram prompt lookup, verify in one forward "
                         "(greedy only — any repetition penalty; "
                         "identical output, fewer dispatches)")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the whole run "
                         "into DIR (TensorBoard/Perfetto); the XLA-level "
                         "complement of the per-phase --observe tap")
    ap.add_argument("-o", "--observe", action="store_true",
                    help="visualize per-layer activity and top-6 next-token "
                         "candidates per step (the reference Pod renders "
                         "the same hook on its LCD, infer/ui_app.c:798-855)")
    args = ap.parse_args()

    import jax.numpy as jnp
    from nano_tpu.infer import engine
    from nano_tpu.ops import sampling

    sampler = sampling.SamplerConfig(
        temperature=args.temperature, top_p=args.top_p,
        repetition_penalty=args.repetition_penalty)
    observer = None
    if args.observe:
        from nano_tpu import observe as obs

        state = {"acts": {}, "logits": None, "top": None}

        def observer(o):
            # works in both modes: full activations (host callbacks) or
            # bounded summary rows (tunnel-TPU fallback, observe.deliver)
            if o.phase == obs.Phase.RESIDUAL:
                state["acts"][o.layer] = (o.mean_abs if o.summary
                                          else float(abs(o.data).mean()))
            elif o.phase == obs.Phase.LOGITS:
                if o.summary:
                    state["top"] = (o.top_ids, o.top_vals)
                else:
                    state["logits"] = o.data
            elif o.phase == obs.Phase.SAMPLE and (
                    state["logits"] is not None or state["top"] is not None):
                bars = "".join(
                    " ▁▂▃▄▅▆▇█"[min(8, int(state["acts"].get(l, 0.0) * 4))]
                    for l in sorted(state["acts"]))
                if state["top"] is not None:
                    ids, vals = state["top"]
                    z = vals - vals.max()
                    probs = __import__("numpy").exp(z)
                    probs = probs / probs.sum()   # normalized over top-6
                else:
                    ids, probs = obs.top_candidates(state["logits"], 6)
                cand = " ".join(f"{ctx.decode([int(i)])!r}:{p:.2f}"
                                for i, p in zip(ids, probs))
                print(f"\n[layers {bars}] top6: {cand}", file=sys.stderr)
                state["acts"].clear()
                state["top"] = None

    loader = (engine.LLMContext.from_bin if args.model.endswith(".bin")
              else engine.LLMContext.from_gguf
              if args.model.endswith(".gguf")
              else engine.LLMContext.from_checkpoint)
    ctx = loader(args.model, max_seq_len=args.max_seq_len,
                 sampler=sampler, random_seed=args.seed,
                 observation=observer, spec_k=args.spec)
    if args.lora:
        if args.lora.endswith(".bin"):
            ctx.load_lora(args.lora)
        else:
            ctx.load_lora_checkpoint(args.lora)
    cfg = ctx.cfg
    print(f"loaded {args.model}: {cfg.n_layer}L/{cfg.n_embd}E/"
          f"{cfg.n_head}H vocab={cfg.vocab_size} ctx={ctx.max_seq_len}",
          file=sys.stderr)

    def run(prompt: str):
        if args.denoise:
            ids = ctx.encode(prompt)
            out = engine.denoise_generate(ctx, ids, args.max_new_tokens,
                                          temperature=max(args.temperature,
                                                          1e-3))
            print(ctx.decode(list(out)))
            return
        t0 = time.time()
        n_tok = [0]
        stamps = []

        def on_decoding(session, tok, text):
            print(text, end="", flush=True)
            n_tok[0] += 1
            if args.profile:
                # sliding 4-token TPS window (reference: infer.py:91-99)
                stamps.append(time.time())
                if len(stamps) > 4:
                    del stamps[0]
                if len(stamps) == 4:
                    tps = 3.0 / max(stamps[-1] - stamps[0], 1e-9)
                    print(f" [{tps:.1f} tok/s]", end="", flush=True)

        engine.generate_sync(ctx, prompt,
                             max_new_tokens=args.max_new_tokens,
                             template=args.instruct,
                             on_decoding=on_decoding)
        print()
        if args.profile and n_tok[0]:
            dt = time.time() - t0
            print(f"[{n_tok[0]} tokens, {n_tok[0]/dt:.1f} tok/s]",
                  file=sys.stderr)

    if args.prompt is not None:
        if args.trace:
            from nano_tpu import observe as obs_mod
            with obs_mod.profile_trace(args.trace, annotate="infer"):
                run(args.prompt)
            print(f"[trace written to {args.trace}]", file=sys.stderr)
        else:
            run(args.prompt)
        return
    print("REPL — empty line or EOF quits", file=sys.stderr)
    while True:
        try:
            line = input(">> ")
        except EOFError:
            break
        if not line:
            break
        run(line)


if __name__ == "__main__":
    main()
