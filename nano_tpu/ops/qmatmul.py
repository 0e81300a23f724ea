"""Quantized matmul: weights stay int8 in HBM, dequantize on-chip.

Implements the TPU equivalent of the reference's Q80 quantized matmul
(reference: infer/infer.c:654-679, infer/tensor.c:15-69): weights are
symmetric per-group int8 with fp32 scales; groups run along the INPUT
dimension within each output row (the file stores (out, in) row-major and
groups the flattened tensor, reference export.py:40-63).

TPU-native design: a Pallas kernel tiles the weight matrix over the
output dimension; each grid step DMAs an int8 tile (1 byte/weight of HBM
traffic — the whole point), dequantizes it in VMEM registers (int8 ->
f32 * scale -> bf16) and feeds the MXU.  HBM traffic is ~1/2 of bf16 and
~1/4 of f32 weights, which is the decode-throughput ceiling.

`Q80Tensor` is a registered pytree so quantized weights flow through the
same model code as dense ones — `models.gpt._dense` dispatches on type.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.tree_util.register_pytree_node_class
@dataclass
class Q80Tensor:
    """Per-group symmetric int8 tensor.

    q:      int8, shape (..., out, in)  — matches the .bin file layout
    scales: f32,  shape (..., out, in // group_size)
    """
    q: jnp.ndarray
    scales: jnp.ndarray
    group_size: int

    def tree_flatten(self):
        return (self.q, self.scales), self.group_size

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(q=children[0], scales=children[1], group_size=aux)

    @property
    def out_dim(self) -> int:
        return self.q.shape[-2]

    @property
    def in_dim(self) -> int:
        return self.q.shape[-1]

    def dequantize(self, dtype=jnp.float32) -> jnp.ndarray:
        *lead, out, inn = self.q.shape
        g = self.group_size
        w = self.q.astype(jnp.float32).reshape(*lead, out, inn // g, g)
        w = w * self.scales[..., None]
        return w.reshape(*lead, out, inn).astype(dtype)

    @classmethod
    def from_numpy(cls, q: np.ndarray, scales: np.ndarray, group_size: int
                   ) -> "Q80Tensor":
        out, inn = q.shape[-2], q.shape[-1]
        scales = np.asarray(scales, np.float32).reshape(
            *q.shape[:-2], out, inn // group_size)
        return cls(q=jnp.asarray(q, jnp.int8),
                   scales=jnp.asarray(scales), group_size=group_size)


# =====================================================================
# reference (jnp) implementation — correctness oracle + CPU fallback
# =====================================================================

def q80_matmul_ref(x: jnp.ndarray, w: Q80Tensor,
                   dtype=jnp.bfloat16) -> jnp.ndarray:
    """x (..., in) @ dequant(w).T -> (..., out)."""
    wf = w.dequantize(dtype)
    return jnp.dot(x.astype(dtype), wf.T.astype(dtype),
                   preferred_element_type=dtype)


# =====================================================================
# Pallas kernel
# =====================================================================

def _q80_kernel(x_ref, q_ref, s_ref, o_ref, *, group_size: int):
    """One output tile: dequantize (TILE_O, IN) int8 in VMEM, MXU dot.

    Dequantization stays in f32 (matching the C engine's f32 dequant,
    infer/tensor.c:39-47) — decode is HBM-bandwidth-bound on the int8
    reads, so the f32 MXU pass costs nothing and keeps logits within
    ~1e-6 of the dequantize-at-load path.

    x_ref: (B, IN) f32; q_ref: (TILE_O, IN) int8;
    s_ref: (TILE_O, IN // gs) f32; o_ref: (B, TILE_O) f32.
    """
    tile_o, inn = q_ref.shape
    n_groups = inn // group_size
    w = q_ref[:].astype(jnp.float32).reshape(tile_o, n_groups, group_size)
    w = w * s_ref[:][:, :, None]
    w = w.reshape(tile_o, inn)
    # HIGHEST: true f32 MXU passes — without it the MXU rounds operands
    # to bf16 and logits drift ~1% off the C engine's f32 dequant math
    o_ref[:] = jnp.dot(x_ref[:], w.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)


def _pick_tile(out_dim: int) -> int:
    for t in (512, 256, 128):
        if out_dim % t == 0:
            return t
    return 0


@partial(jax.jit, static_argnames=("group_size", "interpret"))
def _q80_matmul_2d(x: jnp.ndarray, q: jnp.ndarray, scales: jnp.ndarray,
                   group_size: int, interpret: bool = False) -> jnp.ndarray:
    """x (B, in) bf16, q (out, in) int8 -> (B, out) f32 via Pallas."""
    B, inn = x.shape
    out = q.shape[0]
    tile_o = _pick_tile(out)
    n_groups = inn // group_size

    grid = (out // tile_o,)
    return pl.pallas_call(
        partial(_q80_kernel, group_size=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, inn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_o, inn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_o, n_groups), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), q, scales)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# Implementation selector.  Measured on the target TPU (chained scan of
# 2048x768 B=8 matmuls, fixed dispatch cost differenced out):
#     dense bf16 XLA dot          2.1 us
#     XLA dequant + f32-HIGHEST   6.5 us   <- default ("xla")
#     XLA dequant + bf16 dot      2.3 us
#     Pallas fused kernel        ~14 us    (fixed Mosaic launch overhead
#                                           dominates at decode sizes)
# XLA fuses the (int8 -> f32 * scale) dequant into the dot — weights are
# read from HBM as int8 either way, so the Pallas kernel buys nothing at
# these sizes and costs ~12 us/call; it remains available for
# experimentation via NANO_TPU_QMATMUL=pallas.
import os as _os
_IMPL = _os.environ.get("NANO_TPU_QMATMUL", "xla")
# dequant/dot precision: "f32" (default) matches the C engine's f32 math;
# "bf16" halves MXU passes and dequant traffic — measured 2-3x faster at
# Qwen3-0.6B scale with greedy outputs that may occasionally diverge from
# the C engine on near-ties.
_DEQ = _os.environ.get("NANO_TPU_DEQUANT", "f32")


def q80_matmul(x: jnp.ndarray, w: Q80Tensor, dtype=jnp.bfloat16
               ) -> jnp.ndarray:
    """x (..., in) @ dequant(w).T -> (..., out), dequant fused into the dot.

    Dequantization is f32 (matching the C engine's f32 dequant,
    infer/tensor.c:39-47) and the dot runs at f32-HIGHEST precision so
    logits track the reference engine's f32 math.
    """
    assert w.q.ndim == 2, "use vmap/scan indexing for stacked weights"
    out, inn = w.q.shape
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    if (_IMPL == "pallas" and _on_tpu() and _pick_tile(out)
            and inn % w.group_size == 0):
        Bp = max(8, -(-B // 8) * 8)   # pad rows to the f32 sublane tile
        x2 = x.reshape(B, inn)
        if Bp != B:
            x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
        y = _q80_matmul_2d(x2, w.q, w.scales, w.group_size)
        if Bp != B:
            y = y[:B]
        return y.reshape(*lead, out).astype(dtype)
    if _DEQ == "bf16":
        wf = w.dequantize(jnp.bfloat16)
        y = jnp.dot(x.reshape(B, inn).astype(jnp.bfloat16), wf.T,
                    preferred_element_type=jnp.float32)
    else:
        wf = w.dequantize(jnp.float32)
        y = jnp.dot(x.reshape(B, inn).astype(jnp.float32), wf.T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return y.reshape(*lead, out).astype(dtype)
