"""Q4K 4-bit k-quant: host-side bit-exact pack/unpack + fused TPU matmul.

Implements the reference's Q4K scheme (reference: infer/tensor.c:71-483,
infer/tensor.h:95-135): the last axis of a tensor is split into 256-value
blocks; each block holds 8 sub-groups of 32 values quantized asymmetrically
to 4 bits (``x ~= v * s_g - b_g``, ``b_g >= 0``), with the 8 per-group
scales/biases themselves quantized to 6 bits against two per-block fp32
super-scales.  One block = 160 bytes: u32 header, u32 length, u32 meta,
f32 s_scale, f32 s_bias, 12 B packed 6-bit scale/bias table, 128 B packed
nibbles.  A packed tensor frame is: u64 total_bytes, u32 header, u32 ndim,
u32 shape[6], u32 num_blocks, then blocks (reference: infer/tensor.c:71-110).

The reference also quantizes the *activation* to Q4K before every quantized
matmul (reference: infer/infer.c:781-785,930-933) and computes the dot in
expanded integer form (infer/tensor.c:359-434); that expansion is exactly
``sum(dequant(w) * dequant(x))``, so this module reproduces it as
``fake_quant_act`` (quantize->dequantize the activation with identical
rounding) followed by an f32 dot — integer/rounding decisions are
bit-exact, only the f32 accumulation order differs.

TPU-native design: weights stay packed in HBM as one nibble-pair byte per
two values (0.5 B/value) plus f32 per-group scales/biases (0.25 B/value);
a Pallas kernel DMAs a (TILE_O, n/2) uint8 tile, unpacks nibbles and
applies ``v*s-b`` in VMEM, and feeds the MXU in f32.  To avoid an in-kernel
nibble interleave, bytes are re-laid out at load time so the low nibbles of
a 16-byte group hold values 0..15 of that group and the high nibbles hold
values 16..31 — the activation is permuted identically outside the kernel
(a shared permutation of the contraction axis leaves the dot invariant).

NOTE on a reference divergence: for line lengths > 256 that are not
multiples of 256, the reference indexes partial blocks at ``j*d`` instead
of ``j*256`` (infer/tensor.c:307,339) — a bug its models never hit (all
real dims are multiples of 256).  This module uses correct offsets;
cross-engine parity tests therefore stick to dims that are <= 256 or
multiples of 256.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_LEN = 256
GROUP_LEN = 32
GROUPS_PER_BLOCK = 8
BLOCK_BYTES = 160
QUANT_TYPE_Q4K = 0x42

_FLT_MAX = np.float32(np.finfo(np.float32).max)
_FLT_TRUE_MIN = np.float32(1.401298464324817e-45)  # smallest denormal
_MAGIC = np.float32(12582912.0)  # 1.5 * 2**23


# =====================================================================
# rounding — bit-exact with the C engine's nearest_int
# (reference: infer/tensor.c:4-9: add 1.5*2^23, read mantissa bits)
# =====================================================================

def nearest_int_np(x: np.ndarray) -> np.ndarray:
    val = (np.asarray(x, np.float32) + _MAGIC).view(np.int32)
    return (val & 0x007FFFFF) - 0x00400000


def nearest_int_jnp(x: jnp.ndarray) -> jnp.ndarray:
    val = jax.lax.bitcast_convert_type(
        x.astype(jnp.float32) + _MAGIC, jnp.int32)
    return (val & 0x007FFFFF) - 0x00400000


# =====================================================================
# host-side quantize / pack (numpy, vectorized over blocks)
# =====================================================================

def _n_blocks_per_line(n: int) -> int:
    return -(-n // BLOCK_LEN)


def _group_params_np(vals: np.ndarray, valid: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-group (s, b) from (nb, 8, 32) values + validity mask.

    Matches the C loop semantics (infer/tensor.c:157-170): max starts at
    FLT_TRUE_MIN, min at FLT_MAX, only valid values update them.
    """
    vmax = np.max(np.where(valid, vals, -_FLT_MAX), axis=-1)
    vmax = np.maximum(vmax, _FLT_TRUE_MIN).astype(np.float32)
    vmin = np.min(np.where(valid, vals, _FLT_MAX), axis=-1).astype(np.float32)
    neg = vmin <= np.float32(0.0)
    s = np.where(neg, (vmax - vmin) / np.float32(15.0),
                 vmax / np.float32(15.0)).astype(np.float32)
    b = np.where(neg, -vmin, np.float32(0.0)).astype(np.float32)
    return s, b


def quantize_lines_np(lines: np.ndarray) -> np.ndarray:
    """(rows, n) f32 -> (rows * n_blocks_per_line, 160) uint8 blocks."""
    lines = np.ascontiguousarray(lines, np.float32)
    rows, n = lines.shape
    nbpl = _n_blocks_per_line(n)
    npad = nbpl * BLOCK_LEN
    x = np.zeros((rows, npad), np.float32)
    x[:, :n] = lines
    valid = np.zeros((npad,), bool)
    valid[:n] = True

    nb = rows * nbpl
    vals = x.reshape(nb, GROUPS_PER_BLOCK, GROUP_LEN)
    vmask = np.broadcast_to(
        valid.reshape(nbpl, GROUPS_PER_BLOCK, GROUP_LEN), (rows, nbpl, GROUPS_PER_BLOCK, GROUP_LEN)
    ).reshape(nb, GROUPS_PER_BLOCK, GROUP_LEN)

    s, b = _group_params_np(vals, vmask)                       # (nb, 8)

    # 4-bit values: nearest_int((x+b)/s) & 0xF, 0 where s==0 or invalid
    safe_s = np.where(s == 0.0, np.float32(1.0), s)
    v = nearest_int_np((vals + b[..., None]).astype(np.float32)
                       / safe_s[..., None]) & 0x0F
    v = np.where((s[..., None] == 0.0) | ~vmask, 0, v).astype(np.uint8)
    v = v.reshape(nb, BLOCK_LEN)

    # 6-bit quantization of s/b against per-block super-scales
    s_max = s.max(axis=1).astype(np.float32)
    b_max = np.maximum(b.max(axis=1), _FLT_TRUE_MIN).astype(np.float32)
    # C initializes b_max at FLT_TRUE_MIN, so all-zero biases still give a
    # tiny positive s_bias (reference: infer/tensor.c:209-219)
    s_max = np.maximum(s_max, _FLT_TRUE_MIN).astype(np.float32)
    s_scale = (s_max / np.float32(63.0)).astype(np.float32)
    s_bias = (b_max / np.float32(63.0)).astype(np.float32)
    safe_ss = np.where(s_scale == 0.0, np.float32(1.0), s_scale)
    safe_sb = np.where(s_bias == 0.0, np.float32(1.0), s_bias)
    sq = np.where(s_scale[:, None] == 0.0, 0,
                  nearest_int_np(s / safe_ss[:, None]) & 0x3F).astype(np.uint8)
    bq = np.where(s_bias[:, None] == 0.0, 0,
                  nearest_int_np(b / safe_sb[:, None]) & 0x3F).astype(np.uint8)

    # pack (layout: reference infer/tensor.c:228-241)
    sb = np.zeros((nb, 12), np.uint8)
    sb[:, 0:4] = ((sq[:, 4:8] & 0x30) << 2) | (sq[:, 0:4] & 0x3F)
    sb[:, 4:8] = ((bq[:, 4:8] & 0x30) << 2) | (bq[:, 0:4] & 0x3F)
    sb[:, 8:12] = ((bq[:, 4:8] & 0x0F) << 4) | (sq[:, 4:8] & 0x0F)

    packed_v = (v[:, 0::2] & 0x0F) | (v[:, 1::2] << 4)          # (nb, 128)

    # per-block actual length (last block of each line may be partial)
    lens = np.full((rows, nbpl), BLOCK_LEN, np.uint32)
    rem = n - (nbpl - 1) * BLOCK_LEN
    lens[:, -1] = rem
    lens = lens.reshape(nb)

    blocks = np.zeros((nb, BLOCK_BYTES), np.uint8)
    blocks[:, 0:4] = np.frombuffer(
        np.full(nb, QUANT_TYPE_Q4K, np.uint32).tobytes(), np.uint8
    ).reshape(nb, 4)
    blocks[:, 4:8] = lens.astype("<u4").view(np.uint8).reshape(nb, 4)
    # meta (bytes 8:12) left zero
    blocks[:, 12:16] = s_scale.astype("<f4").view(np.uint8).reshape(nb, 4)
    blocks[:, 16:20] = s_bias.astype("<f4").view(np.uint8).reshape(nb, 4)
    blocks[:, 20:32] = sb
    blocks[:, 32:160] = packed_v
    return blocks


def unpack_blocks_np(blocks: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(nb, 160) uint8 -> (values uint8 (nb,256), s f32 (nb,8), b f32 (nb,8),
    lengths u32 (nb,)).  s/b are the *dequantized* per-group params
    (reference: infer/tensor.c:113-141)."""
    blocks = np.ascontiguousarray(blocks, np.uint8).reshape(-1, BLOCK_BYTES)
    nb = blocks.shape[0]
    lens = blocks[:, 4:8].copy().view("<u4").reshape(nb)
    s_scale = blocks[:, 12:16].copy().view("<f4").reshape(nb)
    s_bias = blocks[:, 16:20].copy().view("<f4").reshape(nb)
    sb = blocks[:, 20:32]
    sq = np.zeros((nb, 8), np.uint8)
    bq = np.zeros((nb, 8), np.uint8)
    sq[:, 0:4] = sb[:, 0:4] & 0x3F
    sq[:, 4:8] = (((sb[:, 0:4] >> 6) << 4) | (sb[:, 8:12] & 0x0F)) & 0x3F
    bq[:, 0:4] = sb[:, 4:8] & 0x3F
    bq[:, 4:8] = (((sb[:, 4:8] >> 6) << 4) | (sb[:, 8:12] >> 4)) & 0x3F
    s = (sq.astype(np.float32) * s_scale[:, None]).astype(np.float32)
    b = (bq.astype(np.float32) * s_bias[:, None]).astype(np.float32)
    pv = blocks[:, 32:160]
    v = np.zeros((nb, BLOCK_LEN), np.uint8)
    v[:, 0::2] = pv & 0x0F
    v[:, 1::2] = pv >> 4
    return v, s, b, lens


def dequantize_lines_np(blocks: np.ndarray, rows: int, n: int) -> np.ndarray:
    """Inverse of quantize_lines_np -> (rows, n) f32."""
    v, s, b, _lens = unpack_blocks_np(blocks)
    nbpl = _n_blocks_per_line(n)
    vals = (v.reshape(-1, GROUPS_PER_BLOCK, GROUP_LEN).astype(np.float32)
            * s[:, :, None] - b[:, :, None])
    out = vals.reshape(rows, nbpl * BLOCK_LEN)[:, :n]
    return np.ascontiguousarray(out, np.float32)


# =====================================================================
# packed tensor frame (reference: infer/tensor.c:71-110, tensor.h:129-135)
# =====================================================================

def pack_tensor_frame(t: np.ndarray) -> bytes:
    """fp32 tensor -> self-describing Q4K frame bytes.

    Lines are the last axis; all leading axes flatten to rows
    (reference: infer/tensor.c:281-310).
    """
    shape = t.shape
    assert 1 <= len(shape) <= 6
    n = shape[-1]
    rows = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    blocks = quantize_lines_np(np.asarray(t, np.float32).reshape(rows, n))
    nb = blocks.shape[0]
    total = 8 + 4 + 4 + 24 + 4 + nb * BLOCK_BYTES
    head = np.zeros(44, np.uint8)
    head[0:8] = np.array([total], "<u8").view(np.uint8)
    head[8:12] = np.array([QUANT_TYPE_Q4K], "<u4").view(np.uint8)
    head[12:16] = np.array([len(shape)], "<u4").view(np.uint8)
    shp = np.zeros(6, "<u4")
    shp[: len(shape)] = shape
    head[16:40] = shp.view(np.uint8)
    head[40:44] = np.array([nb], "<u4").view(np.uint8)
    return head.tobytes() + blocks.tobytes()


def parse_tensor_frame(data: bytes, offset: int
                       ) -> Tuple[np.ndarray, Tuple[int, ...], int]:
    """-> (blocks uint8 (nb, 160), shape, next offset)."""
    total = int(np.frombuffer(data, "<u8", 1, offset)[0])
    header, ndim = np.frombuffer(data, "<u4", 2, offset + 8)
    assert header == QUANT_TYPE_Q4K, hex(header)
    shape = tuple(int(x) for x in
                  np.frombuffer(data, "<u4", 6, offset + 16)[:ndim])
    nb = int(np.frombuffer(data, "<u4", 1, offset + 40)[0])
    blocks = np.frombuffer(data, np.uint8, nb * BLOCK_BYTES,
                           offset + 44).reshape(nb, BLOCK_BYTES)
    assert total == 44 + nb * BLOCK_BYTES
    return blocks, shape, offset + total


# =====================================================================
# device tensor (pytree) — SoA re-layout of the packed blocks
# =====================================================================

@jax.tree_util.register_pytree_node_class
@dataclass
class Q4KTensor:
    """Q4K weight in TPU layout.  Two device layouts:

    layout="packed" (load layout):
        packed: uint8 (..., out, n_pad//2); byte ``g*16+j`` of a row holds
                value ``g*32+j`` in its low nibble and value ``g*32+16+j``
                in its high nibble (de-interleaved at load so the kernel
                never shuffles lanes).
        scales/biases: f32 (..., out, n_pad//32) dequantized per-group
                params.
    layout="unpacked" (see to_unpacked()):
        packed: int8 VALUES (..., out, n_pad) in true value order —
                bit-identical weights, 2x the HBM of "packed", zero
                per-step nibble ops (decode is per-op-latency-bound).
        scales/biases: as "packed".
    layout="grouped" (int8-MXU layout, see to_grouped()):
        packed: int8 4-bit VALUES (..., G, out, 32) with G = n_pad//32
        scales/biases: f32 (..., out, G)
        qsum:   f32 (..., out, 2, G) — precombined correction weights
                [biases ; scales·Σq] so the affine expansion's three
                non-MXU terms collapse into ONE dot per step (decode is
                per-op-latency-bound; see q4k_matmul_int8).
    in_dim: true contraction length (n_pad rounds up to 256).
    """
    packed: jnp.ndarray
    scales: jnp.ndarray
    biases: jnp.ndarray
    in_dim: int
    layout: str = "packed"
    qsum: jnp.ndarray = None

    def tree_flatten(self):
        return ((self.packed, self.scales, self.biases, self.qsum),
                (self.in_dim, self.layout))

    @classmethod
    def tree_unflatten(cls, aux, children):
        in_dim, layout = aux if isinstance(aux, tuple) else (aux, "packed")
        qsum = children[3] if len(children) > 3 else None
        return cls(packed=children[0], scales=children[1],
                   biases=children[2], in_dim=in_dim, layout=layout,
                   qsum=qsum)

    @property
    def out_dim(self) -> int:
        return self.packed.shape[-2]

    @property
    def n_pad(self) -> int:
        if self.layout == "grouped":
            return self.packed.shape[-3] * GROUP_LEN
        if self.layout == "unpacked":
            return self.packed.shape[-1]
        return self.packed.shape[-1] * 2

    def to_unpacked(self) -> "Q4KTensor":
        """Unpack nibbles to int8 values (..., out, n_pad) once at load.

        Bit-identical weights (the [lo | hi] nibble split per 32-group
        IS the file's value order); trades 2x weight HBM for zero
        per-step unpack ops.  NANO_TPU_Q4K_LAYOUT=unpacked selects this
        at load (binfmt._q4k_device_params) for the block weights."""
        if self.layout == "unpacked":
            return self
        assert self.layout == "packed", self.layout
        *lead, out, nh = self.packed.shape
        ng = nh // (GROUP_LEN // 2)
        p = self.packed.astype(jnp.int32)
        lo = (p & 0x0F).reshape(*lead, out, ng, GROUP_LEN // 2)
        hi = ((p >> 4) & 0x0F).reshape(*lead, out, ng, GROUP_LEN // 2)
        v = jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)
        return Q4KTensor(packed=v.reshape(*lead, out, ng * GROUP_LEN),
                         scales=self.scales, biases=self.biases,
                         in_dim=self.in_dim, layout="unpacked")

    def to_grouped(self) -> "Q4KTensor":
        """Unpack nibbles to int8 values in (..., G, out, 32) layout once
        at load, zeroing scale/bias/values of fully-padded groups so they
        contribute nothing to the affine expansion.  Requires
        in_dim % 32 == 0 (partial sub-groups stay on the packed path)."""
        if self.layout == "grouped":
            return self
        assert self.layout == "packed", self.layout
        assert self.in_dim % GROUP_LEN == 0, self.in_dim
        *lead, out, nh = self.packed.shape
        G = nh // (GROUP_LEN // 2)
        p = self.packed.astype(jnp.int32)
        lo = (p & 0x0F).reshape(*lead, out, G, GROUP_LEN // 2)
        hi = ((p >> 4) & 0x0F).reshape(*lead, out, G, GROUP_LEN // 2)
        v = jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)
        n_valid_groups = self.in_dim // GROUP_LEN
        gmask = jnp.arange(G) < n_valid_groups          # (G,)
        v = jnp.where(gmask[:, None], v, 0)
        scales = jnp.where(gmask, self.scales, 0.0)
        biases = jnp.where(gmask, self.biases, 0.0)
        qsum = jnp.sum(v.astype(jnp.int32), axis=-1).astype(jnp.float32)
        # correction weights for the affine expansion, precombined so the
        # per-step path pays one dot instead of three einsums (padded
        # groups have scales=biases=0, so corr is 0 there too)
        corr = jnp.stack([biases, scales * qsum], axis=-2)
        perm = tuple(range(len(lead))) + (len(lead) + 1, len(lead),
                                          len(lead) + 2)
        return Q4KTensor(packed=jnp.transpose(v, perm), scales=scales,
                         biases=biases, in_dim=self.in_dim,
                         layout="grouped", qsum=corr)

    @classmethod
    def from_blocks(cls, blocks: np.ndarray, out_dim: int, in_dim: int
                    ) -> "Q4KTensor":
        v, s, b, _l = unpack_blocks_np(blocks)          # (nb,256),(nb,8)x2
        nbpl = _n_blocks_per_line(in_dim)
        npad = nbpl * BLOCK_LEN
        v = v.reshape(out_dim, npad // GROUP_LEN, 2, GROUP_LEN // 2)
        packed = (v[:, :, 0, :] | (v[:, :, 1, :] << 4)).reshape(
            out_dim, npad // 2)
        return cls(packed=jnp.asarray(packed),
                   scales=jnp.asarray(s.reshape(out_dim, -1)),
                   biases=jnp.asarray(b.reshape(out_dim, -1)),
                   in_dim=in_dim)

    @classmethod
    def stack(cls, tensors) -> "Q4KTensor":
        """List of (out, ...) Q4KTensors -> one with leading layer axis,
        concatenating along out when given a list of lists."""
        t0 = tensors[0]
        return cls(
            packed=jnp.stack([t.packed for t in tensors]),
            scales=jnp.stack([t.scales for t in tensors]),
            biases=jnp.stack([t.biases for t in tensors]),
            in_dim=t0.in_dim, layout=t0.layout,
            qsum=(None if t0.qsum is None else
                  jnp.stack([t.qsum for t in tensors])))

    @classmethod
    def concat_out(cls, tensors) -> "Q4KTensor":
        t0 = tensors[0]
        return cls(
            packed=jnp.concatenate([t.packed for t in tensors], axis=-2),
            scales=jnp.concatenate([t.scales for t in tensors], axis=-2),
            biases=jnp.concatenate([t.biases for t in tensors], axis=-2),
            in_dim=t0.in_dim, layout=t0.layout,
            qsum=(None if t0.qsum is None else
                  jnp.concatenate([t.qsum for t in tensors], axis=-2)))

    def dequantize(self, dtype=jnp.float32) -> jnp.ndarray:
        """-> (..., out, in_dim) dense weight.

        The affine runs directly in `dtype`: requesting bf16 must not
        materialize an f32 intermediate (at LM-head size that is a 622 MB
        round-trip per step — measured 4x slower than the fused bf16
        form on the v5e)."""
        if self.layout == "grouped":
            *lead, G, out, gl = self.packed.shape
            perm = tuple(range(len(lead))) + (len(lead) + 1, len(lead),
                                              len(lead) + 2)
            v = jnp.transpose(self.packed, perm).astype(dtype)
            w = (v * self.scales[..., None].astype(dtype)
                 - self.biases[..., None].astype(dtype))
            # padded groups have scale=bias=0, so their values are 0
            return w.reshape(*lead, out, G * gl)[..., :self.in_dim]
        if self.layout == "unpacked":
            *lead, out, npad = self.packed.shape
            v = self.packed.reshape(*lead, out, npad // GROUP_LEN,
                                    GROUP_LEN).astype(dtype)
            w = (v * self.scales[..., None].astype(dtype)
                 - self.biases[..., None].astype(dtype))
            return w.reshape(*lead, out, npad)[..., :self.in_dim]
        *lead, out, nh = self.packed.shape
        ng = nh // (GROUP_LEN // 2)
        p = self.packed.astype(jnp.int32)
        lo = (p & 0x0F).reshape(*lead, out, ng, GROUP_LEN // 2)
        hi = ((p >> 4) & 0x0F).reshape(*lead, out, ng, GROUP_LEN // 2)
        v = jnp.concatenate([lo, hi], axis=-1).astype(dtype)
        w = (v * self.scales[..., None].astype(dtype)
             - self.biases[..., None].astype(dtype))
        w = w.reshape(*lead, out, ng * GROUP_LEN)[..., :self.in_dim]
        return w

    @classmethod
    def quantize(cls, w_out_in: np.ndarray) -> "Q4KTensor":
        """fp32 (out, in) -> Q4KTensor (host-side quantization)."""
        out, inn = w_out_in.shape
        return cls.from_blocks(quantize_lines_np(
            np.asarray(w_out_in, np.float32)), out, inn)

    def dequantize_rows(self, ids: jnp.ndarray, dtype=jnp.float32
                        ) -> jnp.ndarray:
        """Gather + dequantize rows (embedding lookup on a Q4K table)."""
        # packed/unpacked layouts only: a grouped tensor's leading axis
        # is the quantization GROUP, not the vocab row — gathering it by
        # token id would silently return garbage embeddings
        assert self.layout in ("packed", "unpacked"), self.layout
        sub = Q4KTensor(packed=jnp.take(self.packed, ids, axis=0),
                        scales=jnp.take(self.scales, ids, axis=0),
                        biases=jnp.take(self.biases, ids, axis=0),
                        in_dim=self.in_dim, layout=self.layout)
        return sub.dequantize(dtype)


# =====================================================================
# activation fake-quant (bit-exact quantize->dequantize, jnp)
# (reference: infer/infer.c:781-785 quantizes s->xb before each matmul)
# =====================================================================

def act_quant_q4k(x2d: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quantize activations with Q4K semantics, returning the INTEGER form.

    x2d (B, n) f32 -> (values int8 (B, G, 32) in [0, 15],
                       s_eff f32 (B, G), b_eff f32 (B, G))
    with G = n rounded up to 256 then / 32; the dequantized activation is
    ``v * s_eff - b_eff`` (padded groups produce exactly 0).  Bit-exact
    with the C engine's quantize_one_block_q4k_in_situ
    (reference: infer/tensor.c:144-251).

    Block-aligned inputs (every real model dim) take a minimal-op fast
    path — decode is per-op-latency-bound, and this quantizer runs before
    every quantized matmul (4x per layer), so dead ops cost real tok/s
    (measured ~2x: 1.7 vs 3.7 us/call at n=1024).  The eliminations are
    all value-preserving:
      * no padding, no validity masks (every lane is valid);
      * b = relu(-vmin) and s = (vmax + b)/15 replace the two selects —
        identical float ops in both sign cases;
      * vmax >= FLT_TRUE_MIN > 0 makes s > 0, so no safe-divide and no
        zero-mask on v (s is additionally clamped to FLT_TRUE_MIN: an
        all-zero group underflows s to 0 and the clamp keeps v at 0
        instead of NaN — the C engine hits 0/0 UB there, real
        activations never do);
      * (x+b)/s <= 15 + ulp so nearest_int lands in [0,15] and the
        & 0xF wrap is a no-op (same argument for the 6-bit & 0x3F).
    """
    B, n = x2d.shape
    if n % BLOCK_LEN == 0:
        return _act_quant_aligned(x2d)
    nbpl = _n_blocks_per_line(n)
    npad = nbpl * BLOCK_LEN
    xf = x2d.astype(jnp.float32)
    if npad != n:
        xf = jnp.pad(xf, ((0, 0), (0, npad - n)))
    valid = (jnp.arange(npad) < n).reshape(nbpl, GROUPS_PER_BLOCK, GROUP_LEN)
    vals = xf.reshape(B, nbpl, GROUPS_PER_BLOCK, GROUP_LEN)

    vmax = jnp.max(jnp.where(valid, vals, -_FLT_MAX), axis=-1)
    vmax = jnp.maximum(vmax, _FLT_TRUE_MIN)
    vmin = jnp.min(jnp.where(valid, vals, _FLT_MAX), axis=-1)
    neg = vmin <= 0.0
    s = jnp.where(neg, (vmax - vmin) / 15.0, vmax / 15.0)
    b = jnp.where(neg, -vmin, 0.0)

    safe_s = jnp.where(s == 0.0, 1.0, s)
    v = nearest_int_jnp((vals + b[..., None]) / safe_s[..., None]) & 0x0F
    v = jnp.where((s[..., None] == 0.0) | ~valid, 0, v)

    s_max = jnp.maximum(jnp.max(s, axis=-1), _FLT_TRUE_MIN)
    b_max = jnp.maximum(jnp.max(b, axis=-1), _FLT_TRUE_MIN)
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
    # fully-padded groups: v is 0 already; zero b_eff/s_eff so the affine
    # form contributes nothing (b_eff is 0 there anyway: b=0 -> bq=0)
    G = nbpl * GROUPS_PER_BLOCK
    return (v.reshape(B, G, GROUP_LEN).astype(jnp.int8),
            s_eff.reshape(B, G), b_eff.reshape(B, G))


def _tree_max(x: jnp.ndarray) -> jnp.ndarray:
    """max over the last axis as a log2 tree of ELEMENTWISE maximums.

    Bit-identical to jnp.max (max is associative/commutative) but lowers
    to plain elementwise ops instead of a reduce primitive, so XLA can
    fuse the whole activation quantizer into one kernel — decode is
    per-op-latency-bound, and each un-fused reduce is a kernel boundary.
    Requires a power-of-two axis length.
    """
    n = x.shape[-1]
    while n > 1:
        n //= 2
        x = jnp.maximum(x[..., :n], x[..., n:])
    return x[..., 0]


def _tree_min(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[-1]
    while n > 1:
        n //= 2
        x = jnp.minimum(x[..., :n], x[..., n:])
    return x[..., 0]


def _act_quant_aligned(x2d: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Minimal-op quantizer for n % 256 == 0 (see act_quant_q4k)."""
    import os as _os
    # default "max" (plain jnp.max reduce): measured 435 vs 402 tok/s for
    # the log2-tree form at the Qwen3-0.6B Q4K decode shape on the v5e —
    # the fused-elementwise-tree hypothesis lost to XLA's native reduce.
    # Both forms are bit-identical (max/min are associative/commutative).
    tree = _os.environ.get("NANO_TPU_Q4K_FQ", "max") == "tree"
    B, n = x2d.shape
    nbpl = n // BLOCK_LEN
    vals = x2d.astype(jnp.float32).reshape(B, nbpl, GROUPS_PER_BLOCK,
                                           GROUP_LEN)
    if tree:
        vmax = jnp.maximum(_tree_max(vals), _FLT_TRUE_MIN)
        vmin = _tree_min(vals)
    else:
        vmax = jnp.maximum(jnp.max(vals, -1), _FLT_TRUE_MIN)
        vmin = jnp.min(vals, -1)
    b = jnp.maximum(-vmin, 0.0)
    s = jnp.maximum((vmax + b) / 15.0, _FLT_TRUE_MIN)
    v = nearest_int_jnp((vals + b[..., None]) / s[..., None])

    if tree:
        s_max = _tree_max(s)
        b_max = _tree_max(b)
    else:
        s_max = jnp.max(s, -1)
        b_max = jnp.max(b, -1)
    s_scale = jnp.maximum(s_max, _FLT_TRUE_MIN)[..., None] / 63.0
    s_bias = jnp.maximum(b_max, _FLT_TRUE_MIN)[..., None] / 63.0
    safe_ss = jnp.where(s_scale == 0.0, 1.0, s_scale)
    safe_sb = jnp.where(s_bias == 0.0, 1.0, s_bias)
    sq = jnp.where(s_scale == 0.0, 0, nearest_int_jnp(s / safe_ss))
    bq = jnp.where(s_bias == 0.0, 0, nearest_int_jnp(b / safe_sb))
    s_eff = sq.astype(jnp.float32) * s_scale
    b_eff = bq.astype(jnp.float32) * s_bias
    G = nbpl * GROUPS_PER_BLOCK
    return (v.reshape(B, G, GROUP_LEN).astype(jnp.int8),
            s_eff.reshape(B, G), b_eff.reshape(B, G))


def _fround(x: jnp.ndarray) -> jnp.ndarray:
    """Float-domain nearest_int: bit-identical to
    ``nearest_int_jnp(x).astype(f32)`` for |x| < 2**22 (all 4-/6-bit
    quantization ratios qualify).  The f32 addition of the magic
    constant rounds to integer at ULP=1 exactly like the C mantissa
    trick (same add, same round-to-nearest-even hardware mode), and
    subtracting the magic back is exact (the result is an integer
    < 2**23).  Two elementwise ops instead of bitcast/and/sub/convert —
    decode is per-op-latency-bound."""
    return (x + _MAGIC) - _MAGIC


def _fake_quant_aligned_lean(x2d: jnp.ndarray) -> jnp.ndarray:
    """Minimal-op fused quantize->dequantize for n % 256 == 0, staying in
    the float domain end to end (no int round-trips on the big array).

    Value-identical to the act_quant_q4k + dequant composition — the
    same reductions and float ops in the same order, with _fround
    replacing the integer mantissa extraction (see _fround) — pinned by
    tests/test_q4k.py::test_fake_quant_act_matches_host_quantizer and
    ::test_fake_quant_lean_matches_int_path."""
    B, n = x2d.shape
    nbpl = n // BLOCK_LEN
    vals = x2d.astype(jnp.float32).reshape(B, nbpl, GROUPS_PER_BLOCK,
                                           GROUP_LEN)
    # one reduce for both extrema: max over [vals, -vals]
    both = jnp.max(jnp.stack([vals, -vals], axis=3), axis=-1)
    vmax = jnp.maximum(both[..., 0], _FLT_TRUE_MIN)
    b = jnp.maximum(both[..., 1], 0.0)          # relu(-vmin)
    s = jnp.maximum((vmax + b) / 15.0, _FLT_TRUE_MIN)
    # XLA flushes the _FLT_TRUE_MIN clamp to 0 (FTZ), so an all-zero
    # group reaches s == 0; guard the divisor on the SMALL array (when
    # s == 0 every |val + b| is sub-denormal, so _fround gives the same
    # 0 the int path's NaN/inf mantissa wrap produces)
    safe_s = jnp.where(s == 0.0, 1.0, s)
    vf = _fround((vals + b[..., None]) / safe_s[..., None])
    # 6-bit second level (tiny (B, nbpl, 8) arrays).  s >= FLT_TRUE_MIN,
    # but FLT_TRUE_MIN/63 underflows to 0, so the zero guards stay.
    s_scale = jnp.max(s, -1, keepdims=True) / 63.0
    b_scale = jnp.maximum(jnp.max(b, -1, keepdims=True),
                          _FLT_TRUE_MIN) / 63.0
    sq = jnp.where(s_scale == 0.0, 0.0,
                   _fround(s / jnp.where(s_scale == 0.0, 1.0, s_scale)))
    bq = jnp.where(b_scale == 0.0, 0.0,
                   _fround(b / jnp.where(b_scale == 0.0, 1.0, b_scale)))
    s_eff = sq * s_scale
    b_eff = bq * b_scale
    deq = vf * s_eff[..., None] - b_eff[..., None]
    return deq.reshape(B, n)


def fake_quant_act(x: jnp.ndarray) -> jnp.ndarray:
    """Quantize-dequantize the last axis with Q4K semantics -> f32.

    Block-aligned inputs default to the all-float lean path
    (_fake_quant_aligned_lean); NANO_TPU_Q4K_FQ=int/max/tree forces the
    integer-form path (act_quant_q4k + dequant) — all modes are
    bit-identical, the knob exists for speed A/Bs on hardware."""
    import os as _os
    *lead, n = x.shape
    B = 1
    for d in lead:
        B *= d
    if (n % BLOCK_LEN == 0
            and _os.environ.get("NANO_TPU_Q4K_FQ", "lean") == "lean"):
        return _fake_quant_aligned_lean(x.reshape(B, n)).reshape(*lead, n)
    v, s_eff, b_eff = act_quant_q4k(x.reshape(B, n))
    deq = v.astype(jnp.float32) * s_eff[..., None] - b_eff[..., None]
    npad = deq.shape[1] * GROUP_LEN
    return deq.reshape(B, npad)[:, :n].reshape(*lead, n)


# =====================================================================
# matmul — jnp reference + Pallas fused kernel
# =====================================================================

def q4k_matmul_ref(x: jnp.ndarray, w: Q4KTensor,
                   dtype=jnp.bfloat16) -> jnp.ndarray:
    """Fake-quant x, dot with dequantized w (the default XLA-fused path).

    The dot runs in bf16 by default and f32-HIGHEST in parity mode (see
    ops/qmatmul.py).  Row-chunking keeps the LM-head-size dequant inside
    XLA's fusion threshold (qmatmul.n_row_chunks).
    """
    from nano_tpu.ops.qmatmul import _resolve_deq, n_row_chunks
    # The C engine quantizes ACTIVATIONS to Q4K because its integer dot
    # needs both sides quantized (infer/infer.c:781-785) — an
    # implementation cost, not a quality feature.  We reproduce it by
    # default for cross-engine value parity; NANO_TPU_Q4K_ACT=skip keeps
    # activations in float (higher fidelity AND faster — the fake-quant
    # costs ~1/3 of the Q4K layer pass, PERF.md).
    import os as _os
    if _os.environ.get("NANO_TPU_Q4K_ACT", "") == "skip":
        xq = x.astype(jnp.float32)
    else:
        xq = fake_quant_act(x)
    deq_bf16 = _resolve_deq() == "bf16"
    xd = xq.astype(jnp.bfloat16) if deq_bf16 else xq

    def rows_dot(packed, scales, biases):
        t = Q4KTensor(packed=packed, scales=scales, biases=biases,
                      in_dim=w.in_dim, layout=w.layout)
        if deq_bf16:
            return jnp.dot(xd, t.dequantize(jnp.bfloat16).T,
                           preferred_element_type=jnp.float32)
        return jnp.dot(xd, t.dequantize(jnp.float32).T,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    out = w.out_dim
    k = n_row_chunks(out)
    if k == 1:
        y = rows_dot(w.packed, w.scales, w.biases)
    else:
        nh, G = w.packed.shape[-1], w.scales.shape[-1]
        yc = jax.lax.map(
            lambda abc: rows_dot(abc[0], abc[1], abc[2]),
            (w.packed.reshape(k, out // k, nh),
             w.scales.reshape(k, out // k, G),
             w.biases.reshape(k, out // k, G)))
        y = jnp.transpose(yc, (1, 0, 2)).reshape(xq.shape[0], out)
    return y.astype(dtype)


def _q4k_kernel(x_ref, p_ref, s_ref, b_ref, o_ref):
    """One output tile: unpack nibbles, dequantize in VMEM, f32 MXU dot.

    x_ref: (B, n_pad) f32 — fake-quantized activation, PERMUTED to
           [lo-halves | hi-halves] order (see module docstring).
    p_ref: (TILE_O, n_pad//2) uint8; s_ref/b_ref: (TILE_O, n_groups) f32.
    """
    p = p_ref[:].astype(jnp.int32)
    lo = (p & 0x0F).astype(jnp.float32)
    hi = ((p >> 4) & 0x0F).astype(jnp.float32)
    tile_o, nh = p.shape
    ng = nh // (GROUP_LEN // 2)
    # per-group scale/bias expanded 16x along lanes (value j<16 of group g
    # sits at lane g*16+j in both halves).  Mosaic supports neither
    # jnp.repeat (scatter) nor the (T, ng, 16)->(T, nh) lane reshape, so
    # the expansion runs as a tiny MXU matmul against an iota-built 0/1
    # matrix — ~ng/16 of the main dot's FLOPs, negligible.
    grp = jax.lax.broadcasted_iota(jnp.int32, (ng, nh), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ng, nh), 1)
    expand = (lane // (GROUP_LEN // 2) == grp).astype(jnp.float32)
    s = jnp.dot(s_ref[:], expand, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    b = jnp.dot(b_ref[:], expand, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    w = jnp.concatenate([lo * s - b, hi * s - b], axis=1)   # (TILE_O, n_pad)
    o_ref[:] = jnp.dot(x_ref[:], w.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)


from nano_tpu.ops.qmatmul import _pick_tile, _on_tpu  # shared Pallas
# tiling/backend helpers — one tile ladder for both kernel families


@partial(jax.jit, static_argnames=("interpret",))
def _q4k_matmul_2d(xp: jnp.ndarray, packed: jnp.ndarray, scales: jnp.ndarray,
                   biases: jnp.ndarray, interpret: bool = False
                   ) -> jnp.ndarray:
    B, npad = xp.shape
    out = packed.shape[0]
    ng = npad // GROUP_LEN
    tile_o = _pick_tile(out)
    grid = (out // tile_o,)
    return pl.pallas_call(
        _q4k_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, npad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_o, npad // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_o, ng), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_o, ng), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out), jnp.float32),
        interpret=interpret,
    )(xp, packed, scales, biases)


def _permute_act(xq: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """(B, n) fake-quantized act -> (B, n_pad) in [lo | hi] kernel order."""
    B, n = xq.shape
    if n_pad != n:
        xq = jnp.pad(xq, ((0, 0), (0, n_pad - n)))
    ng = n_pad // GROUP_LEN
    x4 = xq.reshape(B, ng, 2, GROUP_LEN // 2)
    return jnp.transpose(x4, (0, 2, 1, 3)).reshape(B, n_pad)


def q4k_matmul_int8(x2d: jnp.ndarray, w: Q4KTensor,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    """Integer MXU path for Q4K: expand the affine dot into four
    integer-exact terms.

    With activation a = sa*va - ba and weight w = s*q - m per 32-group
    (both quantized with the SAME rounding as the C engine):

        y[b,o] = Σ_g [ sa·s·(va·q)  -  sa·m·Σva  -  ba·s·Σq  +  32·ba·m ]

    va·q runs as int8xint8->int32 group-batched dots on the MXU.  The
    three non-MXU terms collapse into ONE dot against the load-time
    precombined correction matrix w.qsum = [m ; s·Σq] (decode is
    per-op-latency-bound, so per-step op count — not FLOPs — sets the
    cost):

        y = t1 - Σ_g [ (sa·Σva − 32·ba)·m  +  ba·(s·Σq) ]

    Every integer matches the C engine's expansion
    (infer/tensor.c:359-434); only f32 multiply/sum order differs.
    """
    va, sa, ba = act_quant_q4k(x2d)        # (B,G,32), (B,G), (B,G)
    vq, s, corr = w.packed, w.scales, w.qsum
    P = jax.lax.dot_general(
        va.transpose(1, 0, 2), vq,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)  # (G, B, out)
    A = jnp.sum(va.astype(jnp.int32), axis=-1).astype(jnp.float32)  # (B,G)
    t1 = jnp.einsum("gbo,bg,og->bo", P.astype(jnp.float32), sa, s)
    left = jnp.stack([sa * A - np.float32(GROUP_LEN) * ba, ba],
                     axis=-2)              # (B, 2, G)
    y = t1 - jnp.einsum("bkg,okg->bo", left, corr)
    return y.astype(dtype) if dtype != jnp.float32 else y


def q4k_matmul(x: jnp.ndarray, w: Q4KTensor, dtype=jnp.bfloat16
               ) -> jnp.ndarray:
    """x (..., in) -> (..., out).

    Grouped-layout weights take the int8 MXU path (quantization decisions
    bit-exact with the C engine); packed-layout weights use the XLA-fused
    dequant dot with fake-quantized activations (value parity with the C
    engine's f32 expansion).  NANO_TPU_QMATMUL=pallas selects the Pallas
    dequant kernel instead.
    """
    from nano_tpu.ops.qmatmul import _IMPL
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    if w.layout == "grouped":
        assert w.packed.ndim == 3, "use scan indexing for stacked weights"
        y = q4k_matmul_int8(x.reshape(B, w.in_dim), w, dtype)
        return y.reshape(*lead, w.out_dim)
    assert w.packed.ndim == 2, "use scan indexing for stacked weights"
    out = w.out_dim
    if (_IMPL == "pallas" and w.layout == "packed" and _on_tpu()
            and _pick_tile(out)):
        xq = fake_quant_act(x.reshape(B, w.in_dim))
        xp = _permute_act(xq, w.n_pad)
        Bp = max(8, -(-B // 8) * 8)
        if Bp != B:
            xp = jnp.pad(xp, ((0, Bp - B), (0, 0)))
        y = _q4k_matmul_2d(xp, w.packed, w.scales, w.biases)
        if Bp != B:
            y = y[:B]
        return y.reshape(*lead, out).astype(dtype)
    return q4k_matmul_ref(x.reshape(B, w.in_dim), w, dtype).reshape(
        *lead, out)
