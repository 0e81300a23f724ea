"""Fused decode-attention Pallas kernel (S=1, static KV cache).

Single-stream decode on this chip is PER-OP-LATENCY-bound, not
FLOP-bound (PERF.md: attention/cache handling ~684 us of a 1.72 ms step
at the 0.6B shape, T=1024).  The XLA decode-attention path is ~8 ops per
layer (score einsum, scale folds, mask add, softmax trio, prob einsum),
each paying fixed dispatch latency inside the layer scan; this kernel
collapses them into ONE launch per layer:

    scores = (K_cache @ q) * k_scale / sqrt(D)      MXU, f32 acc
    masked softmax over the cache length (t <= pos)
    out    = (probs * v_scale)^T @ V_cache          MXU, f32 acc

int8-KV scales are folded into the score/prob matmuls exactly like the
XLA path (models/gpt.py attention): q.(k*s) == (q.k)*s per position, so
the cache is read int8 straight from HBM.  bf16/f32 caches pass unit
scales.  GQA runs grouped — K/V are never expanded; the grid is one
program per batch row and the KV heads unroll STATICALLY inside the
kernel (Mosaic cannot lower dynamic indexing of a middle ref dim, and
the last two dims of every block must divide (8, 128) or equal the
array's, so the cache block carries all heads of one row).

Numerics: f32 scores and softmax (like the XLA path); the normalization
divide happens after the V matmul (linear, so equivalent up to f32
rounding).  Masked positions get -1e30 (finite: -inf would NaN a fully
masked row; t=0 is always visible so rows never are).

Used by models/gpt.py for TPU decode when shapes qualify
(`NANO_TPU_DECODE_ATTN=xla` restores the einsum path).
Reference counterpart: the C engine's per-head score/softmax/weighted-sum
loops (reference: infer/infer.c:848-907) — same math, MXU-shaped.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
            *, scale: float, n_kv: int):
    """One batch-row program; KV heads unroll statically.

    pos_ref: SMEM (B,) int32 — per-slot absolute position (cache row of
             the CURRENT token; visible keys are t <= pos).
    q_ref:  (1, KV, REP, D) f32    k_ref/v_ref: (1, T, KV, D) int8|bf16
    ks_ref/vs_ref: (1, T, KV) f32  o_ref: (1, KV, REP, D) f32
    """
    b = pl.program_id(0)
    pos = pos_ref[b]
    T = k_ref.shape[1]
    t = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    visible = t <= pos

    for h in range(n_kv):                             # static unroll
        q = q_ref[0, h]                               # (REP, D) f32
        k = k_ref[0, :, h, :]                         # (T, D)
        s = jax.lax.dot_general(
            k.astype(jnp.float32), q,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (T, REP)
        s = s * (ks_ref[0, :, h] * scale)[:, None]
        s = jnp.where(visible, s, -1e30)

        m = jnp.max(s, axis=0, keepdims=True)         # (1, REP)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=0, keepdims=True)     # (1, REP)
        # normalize BEFORE the V matmul: (T,REP)/(1,REP) broadcasts
        # directly (Mosaic can't lower the post-matmul denom reindex),
        # and the linearity makes it equivalent up to f32 rounding
        p = p / denom
        p = p * vs_ref[0, :, h][:, None]              # fold v scales

        o_ref[0, h] = jax.lax.dot_general(
            p, v_ref[0, :, h, :].astype(jnp.float32),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (REP, D)


@functools.partial(jax.jit,
                   static_argnames=("n_kv", "rep", "interpret"))
def decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                     v_cache: jnp.ndarray, k_scale, v_scale,
                     pos: jnp.ndarray, n_kv: int, rep: int,
                     interpret: bool = False) -> jnp.ndarray:
    """q: (B, H, D) f32/bf16; caches: (B, T, KV, D); scales: (B, T, KV)
    f32 or None; pos: (B,) int32.  -> (B, H*D) f32.
    """
    B, H, D = q.shape
    T = k_cache.shape[1]
    assert H == n_kv * rep
    qg = q.astype(jnp.float32).reshape(B, n_kv, rep, D)
    if k_scale is None:
        k_scale = jnp.ones((B, T, n_kv), jnp.float32)
        v_scale = k_scale
    scale = 1.0 / math.sqrt(D)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_kv=n_kv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, n_kv, rep, D), lambda b, pos: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, n_kv, D), lambda b, pos: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, n_kv, D), lambda b, pos: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, n_kv), lambda b, pos: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, n_kv), lambda b, pos: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n_kv, rep, D),
                                   lambda b, pos: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_kv, rep, D), jnp.float32),
        interpret=interpret,
    )(pos.astype(jnp.int32), qg, k_cache, v_cache, k_scale, v_scale)
    return out.reshape(B, H * D)


def supported(T: int, D: int, rep: int, backend_tpu: bool) -> bool:
    """Kernel preconditions: TPU backend, lane-aligned head dim, tileable
    cache length.  Everything else falls back to the XLA einsum path.

    DEFAULT OFF (``NANO_TPU_DECODE_ATTN=pallas`` opts in): measured
    end-to-end at the 0.6B shape the kernel LOSES — 436 vs 588 tok/s
    Q80+int8KV — because in situ the XLA attention chain costs only
    ~5-8 us/layer (near HBM speed-of-light for the 2x1 MB int8 cache
    read, elementwise folds fused into the dots) while every Mosaic
    launch pays ~12-14 us; a per-layer kernel therefore cannot win at
    decode sizes on this chip, and a per-STEP kernel is impossible
    (layer i's Q depends on layer i-1's output through the QKV matmul).
    Third confirmation of the Mosaic-launch-bound pattern (PERF.md:
    fused-dequant and flash-attention kernels lost the same way)."""
    import os
    if os.environ.get("NANO_TPU_DECODE_ATTN", "xla") != "pallas":
        return False
    return backend_tpu and D % 128 == 0 and T % 128 == 0 and rep >= 1
