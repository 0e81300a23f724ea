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
    """Per-group symmetric int8 tensor.  Two device layouts:

    layout="rows" (file layout, reference export.py:40-63):
        q:      int8, shape (..., out, in)
        scales: f32,  shape (..., out, in // group_size)
    layout="grouped" (TPU int8-MXU layout, see to_grouped()):
        q:      int8, shape (..., G, out, group_size) with G = in // gs
        scales: f32,  shape (..., out, G)
    """
    q: jnp.ndarray
    scales: jnp.ndarray
    group_size: int
    layout: str = "rows"

    def tree_flatten(self):
        return (self.q, self.scales), (self.group_size, self.layout)

    @classmethod
    def tree_unflatten(cls, aux, children):
        gs, layout = aux if isinstance(aux, tuple) else (aux, "rows")
        return cls(q=children[0], scales=children[1], group_size=gs,
                   layout=layout)

    @property
    def out_dim(self) -> int:
        return self.q.shape[-2]     # (out, in) rows / (G, out, gs) grouped

    @property
    def in_dim(self) -> int:
        if self.layout == "rows":
            return self.q.shape[-1]
        return self.q.shape[-3] * self.q.shape[-1]

    def to_grouped(self) -> "Q80Tensor":
        """Re-layout (..., out, in) -> (..., G, out, gs) once at load.

        The int8 MXU path runs one batched int8 dot per quantization
        group; without this re-layout XLA materializes a transposed copy
        of the whole weight inside the decode loop (measured 10x slower
        at LM-head size)."""
        if self.layout == "grouped":
            return self
        *lead, out, inn = self.q.shape
        g = self.group_size
        q = self.q.reshape(*lead, out, inn // g, g)
        perm = tuple(range(len(lead))) + (len(lead) + 1, len(lead),
                                          len(lead) + 2)
        return Q80Tensor(q=jnp.transpose(q, perm), scales=self.scales,
                         group_size=g, layout="grouped")

    def dequantize(self, dtype=jnp.float32) -> jnp.ndarray:
        # the scale multiply runs directly in `dtype`: a bf16 request
        # must not materialize an f32 intermediate (measured 4x slower
        # at LM-head size on the v5e)
        if self.layout == "grouped":
            *lead, G, out, g = self.q.shape
            perm = tuple(range(len(lead))) + (len(lead) + 1, len(lead),
                                              len(lead) + 2)
            w = jnp.transpose(self.q, perm).astype(dtype)
            w = w * self.scales[..., None].astype(dtype)  # (..., out, G, g)
            return w.reshape(*lead, out, G * g)
        *lead, out, inn = self.q.shape
        g = self.group_size
        w = self.q.astype(dtype).reshape(*lead, out, inn // g, g)
        w = w * self.scales[..., None].astype(dtype)
        return w.reshape(*lead, out, inn)

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
# stacked per-layer weights, fixed dispatch cost differenced out; 28
# layers of 1024->4096 matvecs, per full pass — see PERF.md):
#     bf16 dense                          306 us
#     int8 grouped dot, gs=64             557 us   (batched-G dot is slow)
#     int8 grouped dot, gs=128            315 us
#     int8 grouped dot, gs>=256           207 us   <- fastest Q80
#     int8->bf16 fused dequant dot        258 us
#     f32-HIGHEST fused dequant dot       327 us
#     Q4K packed-nibble bf16 dequant dot  214 us   <- fastest of all
# Modes:
#     "int8"  (default)  Q80 with group_size >= 256 runs activations-
#                        quantized int8xint8->int32 MXU dots (integer
#                        decisions EXACTLY the C engine's,
#                        infer/infer.c:654-679; only f32 sum order
#                        differs).  Smaller groups and Q4K run the
#                        bf16-dequant dot (weights read quantized from
#                        HBM, dequant fused into the dot).
#     "xla"   (parity)   f32 dequant + f32-HIGHEST dots everywhere —
#                        value-for-value with the C engine's f32 math.
#     "pallas"           fused-dequant Pallas kernels (fixed ~12 us
#                        Mosaic launch overhead dominates at decode).
import os as _os
_IMPL = _os.environ.get("NANO_TPU_QMATMUL", "int8")

# minimum group size for the grouped int8 MXU path: below 256 the
# batched-per-group dot underutilizes the MXU contraction tile and loses
# to the fused-dequant dot (measured above)
MIN_GROUPED_GS = 256


def _resolve_deq() -> str:
    """Dequant-dot precision for the non-integer paths: explicit env
    wins; else bf16 in fast mode, f32 in parity mode."""
    if _os.environ.get("NANO_TPU_DEQUANT"):
        return _os.environ["NANO_TPU_DEQUANT"]
    return "f32" if _IMPL == "xla" else "bf16"


def n_row_chunks(out_dim: int, max_rows: int = 32768) -> int:
    """Row-chunk count for huge dequant matmuls (the LM head).

    XLA fuses the (int8 -> scale) dequant into the dot at layer sizes but
    MATERIALIZES the dequantized matrix beyond ~tens of MB (measured: the
    152k x 1024 Q4K head ran 868 us unchunked vs the ~200 us bandwidth
    bound).  lax.map over row chunks keeps every chunk inside the fusion
    threshold."""
    if out_dim <= max_rows:
        return 1
    for k in range(2, 65):
        if out_dim % k == 0 and out_dim // k <= max_rows:
            return k
    return 1


def c_round(x: jnp.ndarray) -> jnp.ndarray:
    """C round(): half away from zero (jnp.round is half-to-even)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def act_quant_q80(x: jnp.ndarray, group_size: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize activations per group along the last axis, C semantics
    (reference: infer/tensor.c:21-47): scale = absmax/127 in f32,
    values = round(x/scale) half-away-from-zero.

    x (B, K) f32 -> (int8 (B, G, gs), scales f32 (B, G)).  An all-zero
    group gets scale 0 and values 0 (the C code divides by zero there;
    real activations never hit it).
    """
    B, K = x.shape
    G = K // group_size
    xg = x.astype(jnp.float32).reshape(B, G, group_size)
    sa = jnp.max(jnp.abs(xg), axis=-1) / np.float32(127.0)
    aq = c_round(xg / jnp.where(sa == 0.0, 1.0, sa)[..., None])
    return aq.astype(jnp.int8), sa


def q80_matmul_int8(x: jnp.ndarray, w: Q80Tensor,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    """Integer MXU path: int8 activations x int8 weights -> int32 partials
    per quantization group, f32 scale combine.

    The integer group dots are EXACTLY the C engine's `ival` accumulators
    (infer/infer.c:663-673); the f32 combine differs only in summation
    order (XLA tree-sum over G vs the C engine's sequential loop).
    Requires w.layout == "grouped" (one-time re-layout at load).
    """
    B, K = x.shape
    gs = w.group_size
    wq, sw = w.q, w.scales                 # (G, out, gs), (out, G)
    aq, sa = act_quant_q80(x, gs)          # (B, G, gs), (B, G)
    P = jax.lax.dot_general(
        aq.transpose(1, 0, 2), wq,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)  # (G, B, out)
    y = jnp.einsum("gbo,bg,og->bo", P.astype(jnp.float32), sa, sw)
    return y.astype(dtype) if dtype != jnp.float32 else y


def q80_matmul(x: jnp.ndarray, w: Q80Tensor, dtype=jnp.bfloat16
               ) -> jnp.ndarray:
    """x (..., in) @ dequant(w).T -> (..., out).

    Grouped-layout weights take the int8 MXU path; row-major weights use
    the fused-dequant dot in f32 (matching the C engine's f32 dequant,
    infer/tensor.c:39-47) at f32-HIGHEST precision.
    """
    if w.layout == "grouped":
        assert w.q.ndim == 3, "use vmap/scan indexing for stacked weights"
        lead = x.shape[:-1]
        K = w.in_dim
        B = int(np.prod(lead)) if lead else 1
        y = q80_matmul_int8(x.reshape(B, K), w, dtype)
        return y.reshape(*lead, w.out_dim)
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

    deq_bf16 = _resolve_deq() == "bf16"
    xd = (x.reshape(B, inn).astype(jnp.bfloat16) if deq_bf16
          else x.reshape(B, inn).astype(jnp.float32))

    def rows_dot(qc, sc):
        t = Q80Tensor(q=qc, scales=sc, group_size=w.group_size)
        if deq_bf16:
            return jnp.dot(xd, t.dequantize(jnp.bfloat16).T,
                           preferred_element_type=jnp.float32)
        return jnp.dot(xd, t.dequantize(jnp.float32).T,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    k = n_row_chunks(out)
    if k == 1:
        y = rows_dot(w.q, w.scales)
    else:
        G = w.scales.shape[-1]
        yc = jax.lax.map(lambda ab: rows_dot(ab[0], ab[1]),
                         (w.q.reshape(k, out // k, inn),
                          w.scales.reshape(k, out // k, G)))
        y = jnp.transpose(yc, (1, 0, 2)).reshape(B, out)
    return y.reshape(*lead, out).astype(dtype)
