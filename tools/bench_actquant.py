"""Microbench: Q4K activation fake-quant variants on the real TPU.

Methodology (PERF.md): chain values through one compiled lax.scan,
difference two scan lengths to cancel the fixed dispatch cost.  Each
iteration fake-quants a (1, n) activation and feeds the result back into
the carry (so nothing is loop-invariant / memoizable).

Run from /root/repo:  python tools/bench_actquant.py
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from nano_tpu.ops.q4k import (
    fake_quant_act, nearest_int_jnp, BLOCK_LEN, GROUP_LEN,
    GROUPS_PER_BLOCK, _FLT_MAX, _FLT_TRUE_MIN)


def fq_v1(x2d):
    """Aligned fast path: no padding, no validity masks."""
    B, n = x2d.shape
    nbpl = n // BLOCK_LEN
    vals = x2d.astype(jnp.float32).reshape(B, nbpl, GROUPS_PER_BLOCK,
                                           GROUP_LEN)
    vmax = jnp.maximum(jnp.max(vals, -1), _FLT_TRUE_MIN)
    vmin = jnp.min(vals, -1)
    neg = vmin <= 0.0
    s = jnp.where(neg, (vmax - vmin) / 15.0, vmax / 15.0)
    b = jnp.where(neg, -vmin, 0.0)
    safe_s = jnp.where(s == 0.0, 1.0, s)
    v = nearest_int_jnp((vals + b[..., None]) / safe_s[..., None]) & 0x0F
    v = jnp.where(s[..., None] == 0.0, 0, v)
    s_max = jnp.maximum(jnp.max(s, -1), _FLT_TRUE_MIN)
    b_max = jnp.maximum(jnp.max(b, -1), _FLT_TRUE_MIN)
    s_scale = s_max / 63.0
    s_bias = b_max / 63.0
    safe_ss = jnp.where(s_scale == 0.0, 1.0, s_scale)
    safe_sb = jnp.where(s_bias == 0.0, 1.0, s_bias)
    sq = jnp.where(s_scale[..., None] == 0.0, 0,
                   nearest_int_jnp(s / safe_ss[..., None]) & 0x3F)
    bq = jnp.where(s_bias[..., None] == 0.0, 0,
                   nearest_int_jnp(b / safe_sb[..., None]) & 0x3F)
    s_eff = sq.astype(jnp.float32) * s_scale[..., None]
    b_eff = bq.astype(jnp.float32) * s_bias[..., None]
    deq = v.astype(jnp.float32) * s_eff[..., None] - b_eff[..., None]
    return deq.reshape(B, n)


def fq_v2(x2d):
    """v1 + single-reduce max/min (concat trick) + single-reduce s/b max."""
    B, n = x2d.shape
    nbpl = n // BLOCK_LEN
    vals = x2d.astype(jnp.float32).reshape(B, nbpl, GROUPS_PER_BLOCK,
                                           GROUP_LEN)
    both = jnp.concatenate([vals, -vals], axis=2)      # (B, nb, 16, 32)
    m = jnp.max(both, -1)                              # (B, nb, 16)
    vmax = jnp.maximum(m[..., :GROUPS_PER_BLOCK], _FLT_TRUE_MIN)
    vmin = -m[..., GROUPS_PER_BLOCK:]
    neg = vmin <= 0.0
    s = jnp.where(neg, (vmax - vmin) / 15.0, vmax / 15.0)
    b = jnp.where(neg, -vmin, 0.0)
    safe_s = jnp.where(s == 0.0, 1.0, s)
    v = nearest_int_jnp((vals + b[..., None]) / safe_s[..., None]) & 0x0F
    v = jnp.where(s[..., None] == 0.0, 0, v)
    sb = jnp.concatenate([s, b], axis=2)               # (B, nb, 16)
    mm = jnp.max(sb.reshape(B, nbpl, 2, GROUPS_PER_BLOCK), -1)
    s_max = jnp.maximum(mm[..., 0], _FLT_TRUE_MIN)
    b_max = jnp.maximum(mm[..., 1], _FLT_TRUE_MIN)
    s_scale = (s_max / 63.0)[..., None]
    s_bias = (b_max / 63.0)[..., None]
    safe_ss = jnp.where(s_scale == 0.0, 1.0, s_scale)
    safe_sb = jnp.where(s_bias == 0.0, 1.0, s_bias)
    sq = jnp.where(s_scale == 0.0, 0, nearest_int_jnp(s / safe_ss) & 0x3F)
    bq = jnp.where(s_bias == 0.0, 0, nearest_int_jnp(b / safe_sb) & 0x3F)
    s_eff = sq.astype(jnp.float32) * s_scale
    b_eff = bq.astype(jnp.float32) * s_bias
    deq = v.astype(jnp.float32) * s_eff[..., None] - b_eff[..., None]
    return deq.reshape(B, n)


def fq_v3(x2d):
    """2D-shapes variant: reductions run on (B*G, 32) / (B*nb, 8)."""
    B, n = x2d.shape
    G = n // GROUP_LEN
    nbpl = n // BLOCK_LEN
    vals = x2d.astype(jnp.float32).reshape(B * G, GROUP_LEN)
    vmax = jnp.maximum(jnp.max(vals, -1), _FLT_TRUE_MIN)
    vmin = jnp.min(vals, -1)
    neg = vmin <= 0.0
    s = jnp.where(neg, (vmax - vmin) / 15.0, vmax / 15.0)
    b = jnp.where(neg, -vmin, 0.0)
    safe_s = jnp.where(s == 0.0, 1.0, s)
    v = nearest_int_jnp((vals + b[..., None]) / safe_s[..., None]) & 0x0F
    v = jnp.where(s[..., None] == 0.0, 0, v)
    s2 = s.reshape(B * nbpl, GROUPS_PER_BLOCK)
    b2 = b.reshape(B * nbpl, GROUPS_PER_BLOCK)
    s_max = jnp.maximum(jnp.max(s2, -1), _FLT_TRUE_MIN)
    b_max = jnp.maximum(jnp.max(b2, -1), _FLT_TRUE_MIN)
    s_scale = (s_max / 63.0)[..., None]
    s_bias = (b_max / 63.0)[..., None]
    safe_ss = jnp.where(s_scale == 0.0, 1.0, s_scale)
    safe_sb = jnp.where(s_bias == 0.0, 1.0, s_bias)
    sq = jnp.where(s_scale == 0.0, 0, nearest_int_jnp(s2 / safe_ss) & 0x3F)
    bq = jnp.where(s_bias == 0.0, 0, nearest_int_jnp(b2 / safe_sb) & 0x3F)
    s_eff = (sq.astype(jnp.float32) * s_scale).reshape(B * G)
    b_eff = (bq.astype(jnp.float32) * s_bias).reshape(B * G)
    deq = v.astype(jnp.float32) * s_eff[..., None] - b_eff[..., None]
    return deq.reshape(B, n)


def fq_v4(x2d):
    """Aligned minimal-ops path.

    Dead-code eliminations valid when every group is fully valid:
      * vmax >= FLT_TRUE_MIN > 0 so s > 0 always — no safe_s, no zero-mask
        on v;
      * (x+b)/s is in [0, 15+eps] so nearest_int is already in [0,15] —
        the & 0xF wrap is a no-op (same for the 6-bit & 0x3F);
      * b == 0 groups produce bq == 0 -> b_eff exactly 0 automatically.
    s_scale/s_bias keep their zero guards: TRUE_MIN/63 underflows to 0.
    """
    B, n = x2d.shape
    nbpl = n // BLOCK_LEN
    vals = x2d.astype(jnp.float32).reshape(B, nbpl, GROUPS_PER_BLOCK,
                                           GROUP_LEN)
    vmax = jnp.maximum(jnp.max(vals, -1), _FLT_TRUE_MIN)
    vmin = jnp.min(vals, -1)
    neg = vmin <= 0.0
    s = jnp.where(neg, (vmax - vmin) / 15.0, vmax / 15.0)
    b = jnp.where(neg, -vmin, 0.0)
    v = nearest_int_jnp((vals + b[..., None]) / s[..., None])
    s_max = jnp.maximum(jnp.max(s, -1), _FLT_TRUE_MIN)
    b_max = jnp.maximum(jnp.max(b, -1), _FLT_TRUE_MIN)
    s_scale = (s_max / 63.0)[..., None]
    s_bias = (b_max / 63.0)[..., None]
    safe_ss = jnp.where(s_scale == 0.0, 1.0, s_scale)
    safe_sb = jnp.where(s_bias == 0.0, 1.0, s_bias)
    sq = jnp.where(s_scale == 0.0, 0, nearest_int_jnp(s / safe_ss))
    bq = jnp.where(s_bias == 0.0, 0, nearest_int_jnp(b / safe_sb))
    s_eff = sq.astype(jnp.float32) * s_scale
    b_eff = bq.astype(jnp.float32) * s_bias
    deq = v.astype(jnp.float32) * s_eff[..., None] - b_eff[..., None]
    return deq.reshape(B, n)


def fq_v5(x2d):
    """v4 + select-free s/b: b = relu(-vmin), s = (vmax + b) / 15.

    Bit-exact: when vmin <= 0, b == -vmin and vmax + b is the same float
    op as vmax - vmin; when vmin > 0, b == 0 and vmax + 0 == vmax.
    """
    B, n = x2d.shape
    nbpl = n // BLOCK_LEN
    vals = x2d.astype(jnp.float32).reshape(B, nbpl, GROUPS_PER_BLOCK,
                                           GROUP_LEN)
    vmax = jnp.maximum(jnp.max(vals, -1), _FLT_TRUE_MIN)
    vmin = jnp.min(vals, -1)
    b = jnp.maximum(-vmin, 0.0)
    s = (vmax + b) / 15.0
    v = nearest_int_jnp((vals + b[..., None]) / s[..., None])
    s_max = jnp.maximum(jnp.max(s, -1), _FLT_TRUE_MIN)
    b_max = jnp.maximum(jnp.max(b, -1), _FLT_TRUE_MIN)
    s_scale = (s_max / 63.0)[..., None]
    s_bias = (b_max / 63.0)[..., None]
    safe_ss = jnp.where(s_scale == 0.0, 1.0, s_scale)
    safe_sb = jnp.where(s_bias == 0.0, 1.0, s_bias)
    sq = jnp.where(s_scale == 0.0, 0, nearest_int_jnp(s / safe_ss))
    bq = jnp.where(s_bias == 0.0, 0, nearest_int_jnp(b / safe_sb))
    s_eff = sq.astype(jnp.float32) * s_scale
    b_eff = bq.astype(jnp.float32) * s_bias
    deq = v.astype(jnp.float32) * s_eff[..., None] - b_eff[..., None]
    return deq.reshape(B, n)


VARIANTS = {
    "v0_current": lambda x: fake_quant_act(x),
    "v1_nomask": fq_v1,
    "v2_fusedreduce": fq_v2,
    "v3_2d": fq_v3,
    "v4_minimal": fq_v4,
    "v5_selectfree": fq_v5,
    "baseline_noop": lambda x: x * 1.0,
}


def timed(fn, n, n_steps):
    @partial(jax.jit, static_argnames=("steps",))
    def run(x0, steps):
        def body(x, i):
            y = fn(x)
            # feed back so nothing is loop-invariant; keep values bounded
            return y * 0.999 + (i.astype(jnp.float32) % 7) * 1e-4, ()
        x, _ = jax.lax.scan(body, x0, jnp.arange(steps))
        return x

    N1, N2 = 512, 16384
    x0 = jnp.asarray(np.random.RandomState(0).randn(1, n).astype(np.float32))
    np.asarray(run(x0, N1))
    np.asarray(run(x0, N2))            # compile both lengths
    best = np.inf
    for rep in range(4):
        x0 = x0 + rep * 1e-3
        t0 = time.time(); r1 = np.asarray(run(x0, N1)); t1 = time.time()
        x0 = jnp.asarray(r1)
        t2 = time.time(); r2 = np.asarray(run(x0, N2)); t3 = time.time()
        x0 = jnp.asarray(r2) * 0.01
        per = ((t3 - t2) - (t1 - t0)) / (N2 - N1)
        best = min(best, per)
    return best * 1e6


def main():
    print("backend:", jax.default_backend())
    # correctness first (vs current impl)
    x = np.random.RandomState(1).randn(2, 1024).astype(np.float32) * 0.3
    ref = np.asarray(fake_quant_act(jnp.asarray(x)))
    for name, fn in VARIANTS.items():
        if name == "baseline_noop":
            continue
        got = np.asarray(fn(jnp.asarray(x)))
        ok = np.array_equal(ref, got)
        print(f"  {name}: bit-exact vs current = {ok}")
        assert ok, name

    for n in (1024, 3072):
        print(f"-- n={n} --")
        for name, fn in VARIANTS.items():
            us = timed(fn, n, 4096)
            print(f"  {name:18s} {us:8.3f} us/call")


if __name__ == "__main__":
    main()
