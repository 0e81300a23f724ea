"""Benchmark: single-stream greedy decode throughput on Nano-168M.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference C engine decodes Nano-168M Q80 at 65 tok/s on an
Intel N150 (reference README.md:415-418; BASELINE.md).  We measure our
TPU engine's steady-state decode tokens/sec (batch 1, bf16, KV cache,
on-device greedy sampling) on the same model shape.

Methodology notes (the TPU tunnel memoizes value-identical dispatches and
`block_until_ready` does not force completion): every timed call chains
its inputs from the previous call's outputs, and timing brackets a full
host readback (np.asarray).  First call is an untimed warmup that
compiles the same (n_steps-specialized) program.

n_steps=512 (a full-context generation for this 512-block model): the
tunnel adds a ~30 ms fixed cost per dispatched program, which real
serving amortizes over long generations exactly like this scan does.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.ops import sampling
from nano_tpu.infer import engine

BASELINE_TOK_S = 65.0
NANO_168M = dict(block_size=512, vocab_size=16384, n_layer=24, n_embd=768,
                 n_head=16, n_kv_head=8, n_hidden=2048)


def main():
    cfg = ModelConfig(**NANO_168M)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg,
                             param_dtype=jnp.bfloat16)
    n_steps = 512
    s = sampling.SamplerConfig(temperature=0.0, repetition_penalty=1.0)

    cache = gpt.KVCache.create(cfg, 1, cfg.block_size, jnp.bfloat16)
    seen = jnp.zeros((1, cfg.vocab_size), jnp.bool_)
    key = jax.random.PRNGKey(0)
    tok = jnp.zeros((1,), jnp.int32)

    def run(tok, cache, seen, key):
        return engine._decode_scan(
            params, None, 0.0, tok, jnp.int32(4), cache, seen, key,
            jnp.float32(s.temperature), jnp.float32(s.top_p),
            jnp.float32(s.repetition_penalty), cfg, jnp.bfloat16,
            s.top_k, n_steps, True)

    # warmup / compile (same program as the timed runs)
    toks, cache, seen, key = run(tok, cache, seen, key)
    np.asarray(toks)

    best = 0.0
    for it in range(3):
        tok = (toks[-1] + it + 1) % cfg.vocab_size   # chain values
        t0 = time.time()
        toks, cache, seen, key = run(tok, cache, seen, key)
        np.asarray(toks)                              # force full execution
        tok_s = n_steps / (time.time() - t0)
        best = max(best, tok_s)

    print(json.dumps({
        "metric": "nano168m_bf16_decode_tok_s_batch1",
        "value": round(best, 2),
        "unit": "tok/s",
        "vs_baseline": round(best / BASELINE_TOK_S, 2),
    }))


if __name__ == "__main__":
    main()
