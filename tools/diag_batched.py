"""Decompose the batched-serving step cost at the 0.6B shape.

agg@32 ~ 2020 tok/s = 15.8 ms per 32-slot step, but the memory floor is
~3 ms (weights ~0.8 GB int8 + int8 KV at attn 512 ~0.9 GB + head table).
This sweeps one axis at a time through the REAL serving scan
(serve/batching._batched_scan) to find where the rest goes:

  * slot scaling (1/8/16/32/64) at fixed attn_len
  * attended cache length (None/512/256) at 32 slots
  * sampler settings (top_p on/off; greedy)
  * KV cache dtype (int8 vs bf16)

Methodology (PERF.md): one long scan per variant amortizes the ~30 ms
tunnel dispatch; inputs chain from previous outputs; full readback
brackets each timing.  Run from /root/repo with the tunnel UP.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.bench_stages import QWEN3_06B, q80_params
from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.serve import batching


def run_variant(params, cfg, slots, attn_len, kv_dtype, top_p_val,
                n_steps=64, start_pos=384, reps=2, greedy=False):
    if os.environ.get("DIAG_START_POS"):
        start_pos = int(os.environ["DIAG_START_POS"])
    cache_len = int(os.environ.get("DIAG_CACHE_LEN", cfg.block_size))
    cache = gpt.KVCache.create(cfg, slots, cache_len, kv_dtype)
    pos = jnp.full((slots,), start_pos, jnp.int32)
    tok = jnp.arange(slots, dtype=jnp.int32) % 997
    seen = jnp.zeros((slots, cfg.vocab_size), jnp.bool_)
    key = jax.random.PRNGKey(1)
    temp = jnp.zeros((slots,), jnp.float32)
    topp = jnp.full((slots,), top_p_val, jnp.float32)
    rp = jnp.ones((slots,), jnp.float32)

    def run(tok, pos, cache, seen, key):
        return batching._batched_scan(
            params, None, 0.0, tok, pos, cache, seen, key, temp, topp,
            rp, cfg, jnp.bfloat16, 0, n_steps, attn_len, greedy=greedy)

    toks, tok, pos2, cache, seen, key = run(tok, pos, cache, seen, key)
    np.asarray(toks)
    best = float("inf")
    for it in range(reps):
        tok = (tok + it + 1) % cfg.vocab_size
        pos2 = jnp.full((slots,), start_pos, jnp.int32)
        t0 = time.time()
        toks, tok, pos2, cache, seen, key = run(tok, pos2, cache, seen, key)
        np.asarray(toks)
        best = min(best, time.time() - t0)
    ms_step = best / n_steps * 1e3
    agg = slots * n_steps / best
    return ms_step, agg


def main():
    cfg = ModelConfig(**QWEN3_06B)
    params = q80_params(cfg, np.random.RandomState(0))
    only = os.environ.get("DIAG_ONLY")  # comma list of variant names

    variants = [
        # name, slots, attn_len, kv_dtype, top_p, greedy(static)
        ("b32_a512_int8_tp.8", 32, 512, jnp.int8, 0.8, False),  # r4 baseline
        ("b32_a512_int8_GREEDY", 32, 512, jnp.int8, 0.8, True), # static argmax
        ("b32_aNone_int8",     32, None, jnp.int8, 0.8, False),
        ("b32_a256_int8",      32, 256, jnp.int8, 0.8, False),  # undersized: timing only
        ("b32_a512_bf16",      32, 512, jnp.bfloat16, 0.8, False),
        ("b1_a512_int8",       1, 512, jnp.int8, 0.8, False),
        ("b8_a512_int8",       8, 512, jnp.int8, 0.8, False),
        ("b16_a512_int8",      16, 512, jnp.int8, 0.8, False),
        ("b64_a512_int8",      64, 512, jnp.int8, 0.8, False),
        ("b64_a512_int8_GREEDY", 64, 512, jnp.int8, 0.8, True),
        ("b32_a256_GREEDY",    32, 256, jnp.int8, 0.8, True),
        ("b32_aNone_GREEDY",   32, None, jnp.int8, 0.8, True),
        ("b32_a512_bf16_GREEDY", 32, 512, jnp.bfloat16, 0.8, True),
        ("b8_a512_GREEDY",     8, 512, jnp.int8, 0.8, True),
        ("b16_a512_GREEDY",    16, 512, jnp.int8, 0.8, True),
        # with DIAG_START_POS=16: near-zero attended prefix — isolates
        # the attention+cache share of the step
        ("b32_a128_GREEDY",    32, 128, jnp.int8, 0.8, True),
        ("b8_a128_GREEDY",     8, 128, jnp.int8, 0.8, True),
    ]
    print(f"{'variant':24s} {'ms/step':>8s} {'agg tok/s':>10s}", flush=True)
    for name, slots, attn, kvd, tp, gr in variants:
        if only and name not in only.split(","):
            continue
        try:
            ms, agg = run_variant(params, cfg, slots, attn, kvd, tp,
                                  greedy=gr)
            print(f"{name:24s} {ms:8.2f} {agg:10.1f}", flush=True)
        except Exception as e:  # keep sweeping on OOM etc.
            print(f"{name:24s} ERROR {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
