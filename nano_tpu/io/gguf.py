"""GGUF bridge: import llama.cpp-ecosystem checkpoints, export to it.

The reference serves GGUF models by linking llama.cpp into its "Mio"
gateway (/root/reference/infer/web/server.py:211-256).  TPU-natively we
go the other way: parse the GGUF container directly, dequantize the
ggml blocks with vectorized numpy, and map the weights into OUR layouts
— so a GGUF Qwen2/Qwen3 file runs on the same engine (and .bin format)
as everything else instead of through a second inference stack.

Reader scope: GGUF v2/v3; tensor types F32, F16, BF16, Q4_0, Q8_0,
Q4_K, Q6_K (the set that covers stock llama.cpp F16/Q8_0/Q4_K_M
exports).  Block layouts follow the public ggml spec (ggml-common.h);
the dequantizers are dual-implemented in tests/test_gguf.py (scalar
reference vs these vectorized ones) and round-trip-tested through the
writer.

Writer scope: F32, F16, Q8_0 tensors + the metadata llama.cpp needs to
load a qwen2/qwen3 model (arch keys + tokenizer.ggml.*), so models
trained here can flow back into that ecosystem.
"""

import mmap
import os
import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from nano_tpu.config import ModelConfig
from nano_tpu.io import binfmt
from nano_tpu.io.qwen import rope_permute_reverse
from nano_tpu.tokenizer.bpe import BpeTokenizer, gpt2_bytes_to_unicode

GGUF_MAGIC = 0x46554747          # "GGUF" little-endian

# metadata value types
_U8, _I8, _U16, _I16, _U32, _I32, _F32, _BOOL, _STR, _ARR, _U64, _I64, _F64 \
    = range(13)
_SCALAR = {
    _U8: ("<B", 1), _I8: ("<b", 1), _U16: ("<H", 2), _I16: ("<h", 2),
    _U32: ("<I", 4), _I32: ("<i", 4), _F32: ("<f", 4), _BOOL: ("<B", 1),
    _U64: ("<Q", 8), _I64: ("<q", 8), _F64: ("<d", 8),
}

# ggml tensor types: id -> (block_len, block_bytes)
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q8_0 = 2, 8
GGML_Q4_K, GGML_Q6_K = 12, 14
GGML_BF16 = 30
_TYPE_BLOCK = {
    GGML_F32: (1, 4), GGML_F16: (1, 2), GGML_BF16: (1, 2),
    GGML_Q4_0: (32, 18), GGML_Q8_0: (32, 34),
    GGML_Q4_K: (256, 144), GGML_Q6_K: (256, 210),
}
_TYPE_NAME = {GGML_F32: "f32", GGML_F16: "f16", GGML_BF16: "bf16",
              GGML_Q4_0: "q4_0", GGML_Q8_0: "q8_0",
              GGML_Q4_K: "q4_k", GGML_Q6_K: "q6_k"}


# =====================================================================
# block dequantizers (vectorized; layouts per ggml-common.h)
# =====================================================================

def dequant_q8_0(raw: np.ndarray, n: int) -> np.ndarray:
    """Q8_0: 32-elem blocks [d f16][qs i8 x32]; y = d * q."""
    blk = np.frombuffer(raw, dtype=np.dtype([("d", "<f2"), ("qs", "i1", 32)]))
    y = blk["d"].astype(np.float32)[:, None] * blk["qs"].astype(np.float32)
    return y.reshape(-1)[:n]


def dequant_q4_0(raw: np.ndarray, n: int) -> np.ndarray:
    """Q4_0: 32-elem blocks [d f16][qs u8 x16]; lower nibbles are elems
    0..15, upper nibbles 16..31; y = d * (q - 8)."""
    blk = np.frombuffer(raw, dtype=np.dtype([("d", "<f2"), ("qs", "u1", 16)]))
    d = blk["d"].astype(np.float32)[:, None]
    qs = blk["qs"]
    lo = (qs & 0x0F).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    y = np.concatenate([d * lo, d * hi], axis=1)
    return y.reshape(-1)[:n]


def _q4k_scale_min(scales: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Unpack the 12-byte 6-bit scale/min table of a Q4_K/Q5_K
    superblock into (N, 8) each (ggml get_scale_min_k4)."""
    s = scales.astype(np.uint8)
    sc = np.empty((s.shape[0], 8), np.uint8)
    mn = np.empty((s.shape[0], 8), np.uint8)
    sc[:, :4] = s[:, 0:4] & 63
    mn[:, :4] = s[:, 4:8] & 63
    sc[:, 4:] = (s[:, 8:12] & 0x0F) | ((s[:, 0:4] >> 6) << 4)
    mn[:, 4:] = (s[:, 8:12] >> 4) | ((s[:, 4:8] >> 6) << 4)
    return sc, mn


def dequant_q4_k(raw: np.ndarray, n: int) -> np.ndarray:
    """Q4_K: 256-elem superblocks [d f16][dmin f16][scales u8 x12]
    [qs u8 x128]; per 64-elem chunk j: lower nibbles of qs[32j:32j+32]
    are elems 64j..64j+31 (scale 2j), upper nibbles 64j+32..64j+63
    (scale 2j+1); y = d*sc*q - dmin*mn."""
    blk = np.frombuffer(raw, dtype=np.dtype(
        [("d", "<f2"), ("dmin", "<f2"), ("scales", "u1", 12),
         ("qs", "u1", 128)]))
    d = blk["d"].astype(np.float32)
    dmin = blk["dmin"].astype(np.float32)
    sc, mn = _q4k_scale_min(blk["scales"])
    qs = blk["qs"].reshape(-1, 4, 32)            # (N, chunk, 32)
    lo = (qs & 0x0F).astype(np.float32)          # elems 64j .. 64j+31
    hi = (qs >> 4).astype(np.float32)            # elems 64j+32 .. 64j+63
    dsc = d[:, None] * sc.astype(np.float32)     # (N, 8)
    dmn = dmin[:, None] * mn.astype(np.float32)
    y = np.empty((blk.shape[0], 4, 64), np.float32)
    y[:, :, :32] = dsc[:, 0::2, None] * lo - dmn[:, 0::2, None]
    y[:, :, 32:] = dsc[:, 1::2, None] * hi - dmn[:, 1::2, None]
    return y.reshape(-1)[:n]


def dequant_q6_k(raw: np.ndarray, n: int) -> np.ndarray:
    """Q6_K: 256-elem superblocks [ql u8 x128][qh u8 x64][scales i8 x16]
    [d f16]; 6-bit q = low nibble/high nibble of ql | 2 bits of qh,
    per the two-half layout of ggml dequantize_row_q6_K; y = d*sc*(q-32).
    """
    blk = np.frombuffer(raw, dtype=np.dtype(
        [("ql", "u1", 128), ("qh", "u1", 64), ("scales", "i1", 16),
         ("d", "<f2")]))
    d = blk["d"].astype(np.float32)[:, None, None]     # (N,1,1)
    ql = blk["ql"].reshape(-1, 2, 64)                  # two 128-halves
    qh = blk["qh"].reshape(-1, 2, 32)
    sc = blk["scales"].reshape(-1, 2, 8).astype(np.float32)
    q1 = (ql[:, :, :32] & 0x0F) | (((qh >> 0) & 3) << 4)   # elems l
    q2 = (ql[:, :, 32:] & 0x0F) | (((qh >> 2) & 3) << 4)   # elems l+32
    q3 = (ql[:, :, :32] >> 4) | (((qh >> 4) & 3) << 4)     # elems l+64
    q4 = (ql[:, :, 32:] >> 4) | (((qh >> 6) & 3) << 4)     # elems l+96
    y = np.empty((blk.shape[0], 2, 128), np.float32)
    # scale index: is = l // 16 (+0, +2, +4, +6 per quarter)
    sidx = np.arange(32) // 16                             # (32,)
    for qi, (q, off) in enumerate(((q1, 0), (q2, 2), (q3, 4), (q4, 6))):
        s = sc[:, :, sidx + off]                           # (N,2,32)
        y[:, :, 32 * qi:32 * (qi + 1)] = \
            d * s * (q.astype(np.float32) - 32.0)
    return y.reshape(-1)[:n]


_DEQUANT = {
    GGML_Q8_0: dequant_q8_0,
    GGML_Q4_0: dequant_q4_0,
    GGML_Q4_K: dequant_q4_k,
    GGML_Q6_K: dequant_q6_k,
}


# =====================================================================
# container reader
# =====================================================================

class _Reader:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def take(self, fmt: str):
        size = struct.calcsize(fmt)
        vals = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += size
        return vals[0] if len(vals) == 1 else vals

    def take_bytes(self, n: int) -> bytes:
        b = bytes(self.buf[self.pos:self.pos + n])
        self.pos += n
        return b

    def take_str(self) -> str:
        n = self.take("<Q")
        return self.take_bytes(n).decode("utf-8", errors="replace")

    def take_value(self, vtype: int):
        if vtype == _STR:
            return self.take_str()
        if vtype == _ARR:
            etype = self.take("<I")
            count = self.take("<Q")
            if etype in _SCALAR and etype != _BOOL:
                fmt, size = _SCALAR[etype]
                arr = np.frombuffer(self.buf, dtype=np.dtype(fmt),
                                    count=count, offset=self.pos)
                self.pos += size * count
                return arr
            return [self.take_value(etype) for _ in range(count)]
        if vtype == _BOOL:
            return bool(self.take("<B"))
        if vtype in _SCALAR:
            return self.take(_SCALAR[vtype][0])
        raise ValueError(f"unknown GGUF metadata value type {vtype}")


class GGUFTensor:
    def __init__(self, name: str, shape: Tuple[int, ...], ggml_type: int,
                 raw: np.ndarray):
        self.name = name
        self.shape = shape          # row-major (out, ..., in): ne reversed
        self.ggml_type = ggml_type
        self._raw = raw

    @property
    def type_name(self) -> str:
        return _TYPE_NAME.get(self.ggml_type, str(self.ggml_type))

    def to_f32(self) -> np.ndarray:
        n = int(np.prod(self.shape))
        t = self.ggml_type
        if t == GGML_F32:
            y = np.frombuffer(self._raw, dtype="<f4", count=n)
        elif t == GGML_F16:
            y = np.frombuffer(self._raw, dtype="<f2",
                              count=n).astype(np.float32)
        elif t == GGML_BF16:
            u = np.frombuffer(self._raw, dtype="<u2", count=n)
            y = (u.astype(np.uint32) << 16).view(np.float32)
        elif t in _DEQUANT:
            y = _DEQUANT[t](self._raw, n)
        else:
            raise ValueError(
                f"unsupported ggml tensor type {t} for {self.name!r} "
                f"(supported: {sorted(_TYPE_NAME.values())})")
        return np.ascontiguousarray(y.reshape(self.shape))


class GGUFFile:
    """Parsed GGUF container: .meta (dict) + .tensors ({name: GGUFTensor},
    raw bytes mmapped — dequantization happens per-tensor on access)."""

    def __init__(self, path: str):
        self.path = path
        f = open(path, "rb")
        try:
            self._mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        finally:
            f.close()
        r = _Reader(self._mm)
        magic = r.take("<I")
        if magic != GGUF_MAGIC:
            raise ValueError(f"{path}: not a GGUF file (magic {magic:#x})")
        self.version = r.take("<I")
        if self.version not in (2, 3):
            raise ValueError(f"{path}: unsupported GGUF v{self.version}")
        n_tensors = r.take("<Q")
        n_kv = r.take("<Q")
        self.meta: Dict[str, Any] = {}
        for _ in range(n_kv):
            key = r.take_str()
            vtype = r.take("<I")
            self.meta[key] = r.take_value(vtype)
        infos = []
        for _ in range(n_tensors):
            name = r.take_str()
            ndim = r.take("<I")
            ne = [r.take("<Q") for _ in range(ndim)]
            ggml_type = r.take("<I")
            offset = r.take("<Q")
            infos.append((name, ne, ggml_type, offset))
        align = int(self.meta.get("general.alignment", 32))
        data0 = (r.pos + align - 1) // align * align
        self.tensors: Dict[str, GGUFTensor] = {}
        for name, ne, t, off in infos:
            if t not in _TYPE_BLOCK:
                # keep the entry so load reports a precise error on use
                blk_len, blk_bytes = 1, 0
            else:
                blk_len, blk_bytes = _TYPE_BLOCK[t]
            n = int(np.prod(ne)) if ne else 1
            nbytes = (n // blk_len) * blk_bytes if blk_bytes else 0
            start = data0 + off
            if blk_bytes and start + nbytes > len(self._mm):
                raise ValueError(f"{path}: tensor {name!r} data "
                                 f"[{start}:{start + nbytes}] exceeds file "
                                 f"size {len(self._mm)}")
            raw = np.frombuffer(self._mm, dtype=np.uint8, count=nbytes,
                                offset=start)
            # ne is innermost-first; numpy row-major wants it reversed
            self.tensors[name] = GGUFTensor(name, tuple(reversed(ne)), t,
                                            raw)

    def close(self):
        mm, self._mm = self._mm, None
        if mm is not None:
            # tensors keep frombuffer views; only close when dropping all
            del self.tensors
            mm.close()


# =====================================================================
# qwen2 / qwen3 import
# =====================================================================

def gguf_header_only(g: GGUFFile, max_seq_len: Optional[int] = None
                     ) -> tuple[ModelConfig, int, BpeTokenizer]:
    """GGUF metadata -> (ModelConfig, model_type, tokenizer) without
    touching the tensor data (shared by the dense and quantized loads)."""
    arch = g.meta.get("general.architecture", "")
    if arch not in ("qwen2", "qwen3"):
        raise ValueError(
            f"unsupported GGUF architecture {arch!r}: the .bin format "
            "maps dense Qwen2/Qwen3 only (llama-family GGUFs carry "
            "incompatible rope/vocab conventions)")
    model_type = (binfmt.MODEL_TYPE_QWEN3 if arch == "qwen3"
                  else binfmt.MODEL_TYPE_QWEN2)
    m = g.meta

    def k(suffix, default=None):
        return m.get(f"{arch}.{suffix}", default)

    tokens = m.get("tokenizer.ggml.tokens")
    if tokens is None:
        raise ValueError(f"{g.path}: no tokenizer.ggml.tokens metadata")
    n_embd = int(k("embedding_length"))
    n_head = int(k("attention.head_count"))
    block_size = int(k("context_length", 32768))
    if max_seq_len:
        block_size = min(block_size, max_seq_len)
    cfg = ModelConfig(
        block_size=block_size,
        vocab_size=len(tokens),
        n_layer=int(k("block_count")),
        n_embd=n_embd,
        n_head=n_head,
        n_kv_head=int(k("attention.head_count_kv", n_head)),
        n_hidden=int(k("feed_forward_length")),
        norm_eps=float(k("attention.layer_norm_rms_epsilon", 1e-6)),
        rope_theta=float(k("rope.freq_base", 1e6)),
        head_dim=int(k("attention.key_length", n_embd // n_head)),
        use_qk_norm=(arch == "qwen3"),
        qkv_bias=(arch == "qwen2"),
        rope_style="half" if arch == "qwen3" else "interleaved",
        tie_embeddings="output.weight" not in g.tensors,
    )
    tokenizer = BpeTokenizer.from_gguf_metadata(
        tokens, m.get("tokenizer.ggml.merges"))
    return cfg, model_type, tokenizer


def load_gguf_qwen(path: str, max_seq_len: Optional[int] = None
                   ) -> tuple[ModelConfig, Dict[str, Any], int,
                              BpeTokenizer]:
    """-> (ModelConfig, params pytree in our layout, model_type,
    tokenizer).  Scope matches the HF importer: dense Qwen2/Qwen3 (the
    .bin format's non-Nano archs); other architectures error up front."""
    g = GGUFFile(path)
    cfg, model_type, tokenizer = gguf_header_only(g, max_seq_len)
    arch = g.meta["general.architecture"]

    D = cfg.head_dim
    qwen2 = arch == "qwen2"

    def get(name):
        if name not in g.tensors:
            raise KeyError(f"{path}: missing tensor {name!r}")
        return g.tensors[name].to_f32()

    def stack_T(fmt, permute_heads: int = 0):
        mats = []
        for l in range(cfg.n_layer):
            w = get(fmt.format(l))
            if permute_heads:
                w = rope_permute_reverse(w, permute_heads, D)
            mats.append(np.ascontiguousarray(w.T))
        return np.stack(mats)

    def stack(fmt, permute_heads: int = 0):
        vs = []
        for l in range(cfg.n_layer):
            v = get(fmt.format(l))
            if permute_heads:
                v = rope_permute_reverse(v, permute_heads, D)
            vs.append(v)
        return np.stack(vs)

    blocks: Dict[str, Any] = {
        "attn_norm": stack("blk.{}.attn_norm.weight"),
        "ffn_norm": stack("blk.{}.ffn_norm.weight"),
        "wq": stack_T("blk.{}.attn_q.weight", cfg.n_head if qwen2 else 0),
        "wk": stack_T("blk.{}.attn_k.weight", cfg.n_kv_head if qwen2 else 0),
        "wv": stack_T("blk.{}.attn_v.weight"),
        "wo": stack_T("blk.{}.attn_output.weight"),
        "w1": stack_T("blk.{}.ffn_gate.weight"),
        "w2": stack_T("blk.{}.ffn_down.weight"),
        "w3": stack_T("blk.{}.ffn_up.weight"),
    }
    if arch == "qwen3":
        blocks["q_norm"] = stack("blk.{}.attn_q_norm.weight")
        blocks["k_norm"] = stack("blk.{}.attn_k_norm.weight")
    else:
        blocks["bq"] = stack("blk.{}.attn_q.bias", cfg.n_head)
        blocks["bk"] = stack("blk.{}.attn_k.bias", cfg.n_kv_head)
        blocks["bv"] = stack("blk.{}.attn_v.bias")

    params: Dict[str, Any] = {
        "tok_embeddings": get("token_embd.weight"),
        "norm": get("output_norm.weight"),
        "blocks": blocks,
    }
    if not cfg.tie_embeddings:
        params["output"] = np.ascontiguousarray(get("output.weight").T)
    return cfg, params, model_type, tokenizer


def convert_gguf(path: str, out_path: str, quant: str = "q80",
                 group_size: int = 256,
                 max_seq_len: Optional[int] = None) -> ModelConfig:
    """GGUF -> self-contained .bin (any of our quants).  Default Q80
    group 256 unlocks the int8-MXU decode path."""
    cfg, params, model_type, tokenizer = load_gguf_qwen(path, max_seq_len)
    binfmt.write_model(out_path, params, cfg, tokenizer, quant=quant,
                       group_size=group_size, model_type=model_type)
    return cfg


# =====================================================================
# quantized device load: ggml blocks -> OUR quantized decode layouts
# =====================================================================
#
# ggml's per-group affines map LOSSLESSLY onto our device tensors:
#   Q8_0:  x = d*q            -> Q80Tensor, group_size 32 (same semantics)
#   Q4_K:  x = (d*sc)*q - (dmin*m) per 32-subgroup, q in 0..15
#          -> Q4KTensor (scales = d*sc, biases = dmin*m; our dequant is
#             exactly q*s - b with f32 group params on device)
#   Q6_K:  x = d*sc16*(q - 32) per 16-subgroup, q in 0..63
#          -> Q80Tensor with group_size 16 (q - 32 fits int8)
# so a GGUF Q8_0 / Q4_K_M checkpoint runs on the quantized decode path
# with NO requantization of the directly-mapped tensors.  llama.cpp
# varies tensor types per layer (Q4_K_M promotes some ffn_down/attn_v to
# Q6_K); stacked layers must share one leaf type, so a mixed name is
# unified by requantizing the minority to our Q4K from its dequantized
# values (error ~ one extra 4-bit quantization of already-4/6-bit data).

def q80_from_q8_0(t: GGUFTensor):
    from nano_tpu.ops.qmatmul import Q80Tensor
    inn = t.shape[-1]
    out = int(np.prod(t.shape[:-1]))
    blk = np.frombuffer(t._raw, dtype=np.dtype([("d", "<f2"),
                                                ("qs", "i1", 32)]))
    q = np.ascontiguousarray(blk["qs"].reshape(out, inn))
    s = blk["d"].astype(np.float32).reshape(out, inn // 32)
    return Q80Tensor.from_numpy(q, s, 32)


def q80_from_q6_k(t: GGUFTensor):
    from nano_tpu.ops.qmatmul import Q80Tensor
    inn = t.shape[-1]
    out = int(np.prod(t.shape[:-1]))
    blk = np.frombuffer(t._raw, dtype=np.dtype(
        [("ql", "u1", 128), ("qh", "u1", 64), ("scales", "i1", 16),
         ("d", "<f2")]))
    d = blk["d"].astype(np.float32)
    # 6-bit values in element order (same unpacking as dequant_q6_k)
    ql = blk["ql"].reshape(-1, 2, 64)
    qh = blk["qh"].reshape(-1, 2, 32)
    q6 = np.empty((blk.shape[0], 2, 128), np.int16)
    q6[:, :, 0:32] = (ql[:, :, :32] & 0x0F) | (((qh >> 0) & 3) << 4)
    q6[:, :, 32:64] = (ql[:, :, 32:] & 0x0F) | (((qh >> 2) & 3) << 4)
    q6[:, :, 64:96] = (ql[:, :, :32] >> 4) | (((qh >> 4) & 3) << 4)
    q6[:, :, 96:128] = (ql[:, :, 32:] >> 4) | (((qh >> 6) & 3) << 4)
    q = (q6.astype(np.int8) - 32).reshape(out, inn)
    # scales are already in element order: within a half, consecutive
    # 16-element groups use sc[0..7] in sequence (q1a,q1b,q2a,...)
    sc = blk["scales"].astype(np.float32)                # (N, 16)
    s = (d[:, None] * sc).reshape(out, inn // 16)
    return Q80Tensor.from_numpy(q, s, 16)


def q4k_from_q4_k(t: GGUFTensor):
    from nano_tpu.ops.q4k import Q4KTensor
    import jax.numpy as jnp_
    inn = t.shape[-1]
    out = int(np.prod(t.shape[:-1]))
    blk = np.frombuffer(t._raw, dtype=np.dtype(
        [("d", "<f2"), ("dmin", "<f2"), ("scales", "u1", 12),
         ("qs", "u1", 128)]))
    d = blk["d"].astype(np.float32)
    dmin = blk["dmin"].astype(np.float32)
    sc, mn = _q4k_scale_min(blk["scales"])
    scales = (d[:, None] * sc).reshape(out, inn // 32)
    biases = (dmin[:, None] * mn).reshape(out, inn // 32)
    qs = blk["qs"].reshape(-1, 4, 32)
    vals = np.empty((blk.shape[0], 8, 32), np.uint8)
    vals[:, 0::2] = qs & 0x0F            # group 2j: lower nibbles
    vals[:, 1::2] = qs >> 4              # group 2j+1: upper nibbles
    # our packed layout: byte g*16+j = value g*32+j | value g*32+16+j<<4
    v = vals.reshape(out, inn // 32, 2, 16)
    packed = (v[:, :, 0, :] | (v[:, :, 1, :] << 4)).reshape(out, inn // 2)
    return Q4KTensor(packed=jnp_.asarray(packed),
                     scales=jnp_.asarray(scales),
                     biases=jnp_.asarray(biases), in_dim=inn)


def q4k_from_q4_0(t: GGUFTensor):
    """Q4_0 -> Q4KTensor: x = d*(q-8) = q*d - 8d per 32-block, and the
    block's nibble layout (low nibbles = elems 0..15 of byte j, high =
    elems 16..31) is byte-identical to our packed group layout — the qs
    bytes pass through unchanged."""
    from nano_tpu.ops.q4k import Q4KTensor
    import jax.numpy as jnp_
    inn = t.shape[-1]
    out = int(np.prod(t.shape[:-1]))
    blk = np.frombuffer(t._raw, dtype=np.dtype([("d", "<f2"),
                                                ("qs", "u1", 16)]))
    d = blk["d"].astype(np.float32)
    packed = np.ascontiguousarray(blk["qs"]).reshape(out, inn // 2)
    scales = d.reshape(out, inn // 32)
    return Q4KTensor(packed=jnp_.asarray(packed),
                     scales=jnp_.asarray(scales),
                     biases=jnp_.asarray(8.0 * scales), in_dim=inn)


def _our_q4k_requant(dense: np.ndarray):
    """f32 (out, in) -> our Q4K tensor via the bit-exact Nano quantizer
    (type-unification fallback for mixed-type layer stacks)."""
    from nano_tpu.ops import q4k as q4k_mod
    blocks = q4k_mod.quantize_lines_np(np.ascontiguousarray(dense,
                                                            np.float32))
    return q4k_mod.Q4KTensor.from_blocks(blocks, dense.shape[0],
                                         dense.shape[1])


def _rope_row_perm(out: int, n_heads: int, D: int) -> np.ndarray:
    """Row-index permutation equivalent of rope_permute_reverse."""
    idx = np.empty(D, np.int64)
    idx[0::2] = np.arange(D // 2)
    idx[1::2] = np.arange(D // 2) + D // 2
    return (np.arange(n_heads)[:, None] * D + idx[None, :]).reshape(-1)


def _permute_rows(leaf, perm: np.ndarray):
    """Permute the out-dim rows of a quantized leaf (qwen2 q/k RoPE
    re-layout without dequantizing)."""
    from nano_tpu.ops.qmatmul import Q80Tensor
    from nano_tpu.ops.q4k import Q4KTensor
    if isinstance(leaf, Q80Tensor):
        return Q80Tensor(q=leaf.q[perm], scales=leaf.scales[perm],
                         group_size=leaf.group_size, layout=leaf.layout)
    if isinstance(leaf, Q4KTensor):
        return Q4KTensor(packed=leaf.packed[perm],
                         scales=leaf.scales[perm],
                         biases=leaf.biases[perm], in_dim=leaf.in_dim,
                         layout=leaf.layout)
    return np.asarray(leaf)[perm]


_BLOCK_WEIGHTS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")
_GGUF_NAMES = {"wq": "attn_q", "wk": "attn_k", "wv": "attn_v",
               "wo": "attn_output", "w1": "ffn_gate", "w2": "ffn_down",
               "w3": "ffn_up"}


def quantized_device_params(g: GGUFFile, cfg: ModelConfig,
                            arch: str) -> Dict[str, Any]:
    """GGUF tensors -> device pytree with the block matmuls kept in
    quantized form (our Q80/Q4K leaves; norms dense f32).  The head
    follows the .bin loader's rules (binfmt._maybe_int8_layout /
    q4k_head_requant): a Q4_K tied head is requantized host-side to
    grouped Q80 so XLA cannot hoist a dequantized table into HBM."""
    import jax.numpy as jnp_
    from nano_tpu.ops.qmatmul import Q80Tensor, MIN_GROUPED_GS

    def leaf(t: GGUFTensor):
        if t.ggml_type == GGML_Q8_0:
            return q80_from_q8_0(t)
        if t.ggml_type == GGML_Q4_K:
            return q4k_from_q4_k(t)
        if t.ggml_type == GGML_Q6_K:
            return q80_from_q6_k(t)
        if t.ggml_type == GGML_Q4_0:
            return q4k_from_q4_0(t)
        return None                      # dense fallback

    L = cfg.n_layer
    # our engine runs interleaved-pair RoPE for qwen2: permute the q/k
    # OUT rows in quantized form (a row permutation commutes with the
    # per-row group quantization)
    pq = _rope_row_perm(cfg.n_head * cfg.head_dim, cfg.n_head,
                        cfg.head_dim)
    pk = _rope_row_perm(cfg.n_kv_head * cfg.head_dim, cfg.n_kv_head,
                        cfg.head_dim)
    row_perm = ({"wq": pq, "wk": pk} if arch == "qwen2" else {})
    blocks: Dict[str, Any] = {}
    for ours, theirs in _GGUF_NAMES.items():
        ts = [g.tensors[f"blk.{l}.{theirs}.weight"] for l in range(L)]
        leaves = [leaf(t) for t in ts]
        # group_size participates in the kind: Q8_0 (gs32) and Q6_K
        # (gs16) both map to Q80Tensor but cannot stack
        kinds = {(type(x).__name__, getattr(x, "group_size", None))
                 for x in leaves}
        if None in leaves or len(kinds) > 1:
            # mixed or unsupported types across layers: unify via our
            # Q4K quantizer on the dequantized values
            leaves = [_our_q4k_requant(t.to_f32().reshape(
                -1, t.shape[-1])) for t in ts]
        if ours in row_perm:
            leaves = [_permute_rows(x, row_perm[ours]) for x in leaves]
        if isinstance(leaves[0], Q80Tensor):
            blocks[ours] = Q80Tensor(
                q=jnp_.stack([x.q for x in leaves]),
                scales=jnp_.stack([x.scales for x in leaves]),
                group_size=leaves[0].group_size)
        else:
            from nano_tpu.ops.q4k import Q4KTensor
            blocks[ours] = Q4KTensor.stack(leaves)

    fl32 = lambda n: jnp_.asarray(  # noqa: E731
        g.tensors[n].to_f32(), jnp_.float32)
    blocks["attn_norm"] = jnp_.stack(
        [fl32(f"blk.{l}.attn_norm.weight") for l in range(L)])
    blocks["ffn_norm"] = jnp_.stack(
        [fl32(f"blk.{l}.ffn_norm.weight") for l in range(L)])
    if arch == "qwen3":
        blocks["q_norm"] = jnp_.stack(
            [fl32(f"blk.{l}.attn_q_norm.weight") for l in range(L)])
        blocks["k_norm"] = jnp_.stack(
            [fl32(f"blk.{l}.attn_k_norm.weight") for l in range(L)])
    else:
        blocks["bq"] = jnp_.stack(
            [fl32(f"blk.{l}.attn_q.bias")[pq] for l in range(L)])
        blocks["bk"] = jnp_.stack(
            [fl32(f"blk.{l}.attn_k.bias")[pk] for l in range(L)])
        blocks["bv"] = jnp_.stack(
            [fl32(f"blk.{l}.attn_v.bias") for l in range(L)])

    params: Dict[str, Any] = {
        "norm": fl32("output_norm.weight"),
        "blocks": blocks,
    }
    emb = g.tensors["token_embd.weight"]
    emb_leaf = leaf(emb)
    params["tok_embeddings"] = (emb_leaf if emb_leaf is not None
                                else jnp_.asarray(emb.to_f32()))
    if not cfg.tie_embeddings:
        out_leaf = leaf(g.tensors["output.weight"])
        params["output"] = (out_leaf if out_leaf is not None else
                            jnp_.asarray(
                                g.tensors["output.weight"].to_f32().T))
    # TIED Q4K-family head: requantize to grouped Q80 — mirroring the
    # .bin loader exactly: HOST-SIDE from the file bytes (never a
    # device->host round-trip; binfmt.q4k_head_requant reads 622 MB
    # through the tunnel otherwise) and ONLY in int8-MXU mode (the
    # NANO_TPU_QMATMUL=xla value-parity oracle must not see an extra
    # quantization step).  compute_logits' tok-embeddings-type guard
    # then applies the Q4K activation fake-quant on the output_q path.
    # An UNTIED quantized head keeps its original leaf (binfmt conv()
    # semantics: the quantized matmul applies its own activation
    # treatment internally).
    from nano_tpu.ops.q4k import Q4KTensor as _Q4K
    from nano_tpu.ops import qmatmul as _qm
    if (cfg.tie_embeddings and _qm._IMPL == "int8"
            and isinstance(params["tok_embeddings"], _Q4K)):
        dense = emb.to_f32()                    # host-side, from raw blocks
        inn = dense.shape[-1]
        divisors = [gs for gs in (256, 128, 64, 32) if inn % gs == 0]
        if divisors:
            gs = max(divisors)
            q, scales, _e = binfmt.quantize_q80(dense, gs)
            from nano_tpu.ops.qmatmul import Q80Tensor as _Q80
            h = _Q80.from_numpy(q.reshape(dense.shape[0], inn), scales, gs)
            params["output_q"] = (h.to_grouped()
                                  if gs >= MIN_GROUPED_GS else h)
    binfmt._maybe_int8_layout(params)
    return params


# =====================================================================
# writer (f32 / f16 / q8_0)
# =====================================================================

def quantize_q8_0(x: np.ndarray) -> bytes:
    """ggml-compatible Q8_0 blocks for a flat f32 array (multiple of 32):
    per block d = max|x|/127 (f16-rounded), q = round(x/d)."""
    x = np.asarray(x, np.float32).reshape(-1, 32)
    amax = np.abs(x).max(axis=1)
    d = (amax / 127.0).astype(np.float16)
    inv = np.where(d > 0, 1.0 / d.astype(np.float32), 0.0)
    q = np.clip(np.rint(x * inv[:, None]), -128, 127).astype(np.int8)
    blk = np.empty(x.shape[0], dtype=np.dtype([("d", "<f2"),
                                               ("qs", "i1", 32)]))
    blk["d"] = d
    blk["qs"] = q
    return blk.tobytes()


def _meta_bytes(key: str, vtype: int, value) -> bytes:
    out = [struct.pack("<Q", len(key.encode())), key.encode(),
           struct.pack("<I", vtype)]
    if vtype == _STR:
        b = value.encode("utf-8")
        out += [struct.pack("<Q", len(b)), b]
    elif vtype == _ARR:
        etype, elems = value
        out.append(struct.pack("<IQ", etype, len(elems)))
        for e in elems:
            if etype == _STR:
                b = e.encode("utf-8")
                out += [struct.pack("<Q", len(b)), b]
            else:
                out.append(struct.pack(_SCALAR[etype][0], e))
    elif vtype == _BOOL:
        out.append(struct.pack("<B", int(value)))
    else:
        out.append(struct.pack(_SCALAR[vtype][0], value))
    return b"".join(out)


def write_gguf(path: str, params: Dict[str, Any], cfg: ModelConfig,
               tokenizer, arch: str = "qwen3",
               quant: str = "q8_0") -> None:
    """Export our params pytree (the load_hf_qwen/load_gguf_qwen layout:
    stacked per-layer blocks, in-dim-first matrices) as a GGUF file
    llama.cpp can load.  quant: f32 | f16 | q8_0 (block weights;
    norms/biases stay f32 as llama.cpp expects).

    `tokenizer` is a BpeTokenizer: _tokenizer_lists re-encodes its raw
    byte vocab through the GPT-2 printable-unicode map and reconstructs
    a merge list from the pair-score table (best-effort: llama.cpp only
    needs merges for encoding; decoding works from tokens alone)."""
    wq = {"f32": GGML_F32, "f16": GGML_F16, "q8_0": GGML_Q8_0}[quant]
    tensors: List[Tuple[str, np.ndarray, int]] = []

    def add(name, w, t=None):
        w = np.asarray(w, np.float32)
        if t is None:
            t = wq if w.ndim >= 2 and w.size % 32 == 0 else GGML_F32
        tensors.append((name, w, t))

    blocks = params["blocks"]
    L = cfg.n_layer
    D = cfg.head_dim

    def unstackT(w, l):
        return np.ascontiguousarray(np.asarray(w[l], np.float32).T)

    def unpermute(w, n_heads):
        """Inverse of rope_permute_reverse: our interleaved-pair rows
        back to the HF/GGUF rotate-half layout (qwen2 q/k only)."""
        out = np.asarray(w, np.float32).reshape(n_heads, D, *w.shape[1:])
        idx = np.empty(D, np.int64)
        idx[np.arange(D // 2)] = 2 * np.arange(D // 2)
        idx[np.arange(D // 2) + D // 2] = 2 * np.arange(D // 2) + 1
        return out[:, idx].reshape(w.shape)

    qwen2 = arch == "qwen2"

    add("token_embd.weight", params["tok_embeddings"])
    add("output_norm.weight", params["norm"], GGML_F32)
    if "output" in params:
        add("output.weight", np.asarray(params["output"], np.float32).T)
    for l in range(L):
        add(f"blk.{l}.attn_norm.weight", blocks["attn_norm"][l], GGML_F32)
        add(f"blk.{l}.ffn_norm.weight", blocks["ffn_norm"][l], GGML_F32)
        wq_l, wk_l = unstackT(blocks["wq"], l), unstackT(blocks["wk"], l)
        if qwen2:
            wq_l = unpermute(wq_l, cfg.n_head)
            wk_l = unpermute(wk_l, cfg.n_kv_head)
        add(f"blk.{l}.attn_q.weight", wq_l)
        add(f"blk.{l}.attn_k.weight", wk_l)
        add(f"blk.{l}.attn_v.weight", unstackT(blocks["wv"], l))
        add(f"blk.{l}.attn_output.weight", unstackT(blocks["wo"], l))
        add(f"blk.{l}.ffn_gate.weight", unstackT(blocks["w1"], l))
        add(f"blk.{l}.ffn_down.weight", unstackT(blocks["w2"], l))
        add(f"blk.{l}.ffn_up.weight", unstackT(blocks["w3"], l))
        if "q_norm" in blocks:
            add(f"blk.{l}.attn_q_norm.weight", blocks["q_norm"][l],
                GGML_F32)
            add(f"blk.{l}.attn_k_norm.weight", blocks["k_norm"][l],
                GGML_F32)
        if "bq" in blocks:
            bq_l, bk_l = blocks["bq"][l], blocks["bk"][l]
            if qwen2:
                bq_l = unpermute(np.asarray(bq_l), cfg.n_head)
                bk_l = unpermute(np.asarray(bk_l), cfg.n_kv_head)
            add(f"blk.{l}.attn_q.bias", bq_l, GGML_F32)
            add(f"blk.{l}.attn_k.bias", bk_l, GGML_F32)
            add(f"blk.{l}.attn_v.bias", blocks["bv"][l], GGML_F32)

    tokens, merges = _tokenizer_lists(tokenizer, cfg.vocab_size)
    meta = [
        ("general.architecture", _STR, arch),
        ("general.name", _STR, "nano_tpu export"),
        (f"{arch}.block_count", _U32, cfg.n_layer),
        (f"{arch}.context_length", _U32, cfg.block_size),
        (f"{arch}.embedding_length", _U32, cfg.n_embd),
        (f"{arch}.feed_forward_length", _U32, cfg.n_hidden),
        (f"{arch}.attention.head_count", _U32, cfg.n_head),
        (f"{arch}.attention.head_count_kv", _U32, cfg.n_kv_head),
        (f"{arch}.attention.key_length", _U32, cfg.head_dim),
        (f"{arch}.attention.value_length", _U32, cfg.head_dim),
        (f"{arch}.attention.layer_norm_rms_epsilon", _F32, cfg.norm_eps),
        (f"{arch}.rope.freq_base", _F32, cfg.rope_theta),
        ("tokenizer.ggml.model", _STR, "gpt2"),
        ("tokenizer.ggml.tokens", _ARR, (_STR, tokens)),
        ("tokenizer.ggml.merges", _ARR, (_STR, merges)),
    ]

    align = 32
    payloads = []
    infos = []
    off = 0
    for name, w, t in tensors:
        if t == GGML_F32:
            raw = w.astype("<f4").tobytes()
        elif t == GGML_F16:
            raw = w.astype("<f2").tobytes()
        else:
            raw = quantize_q8_0(w.reshape(-1))
        ne = list(reversed(w.shape))
        infos.append((name, ne, t, off))
        payloads.append(raw)
        off += (len(raw) + align - 1) // align * align

    with open(path, "wb") as f:
        f.write(struct.pack("<IIQQ", GGUF_MAGIC, 3, len(tensors),
                            len(meta)))
        for key, vtype, val in meta:
            f.write(_meta_bytes(key, vtype, val))
        for name, ne, t, o in infos:
            b = name.encode()
            f.write(struct.pack("<Q", len(b)) + b)
            f.write(struct.pack("<I", len(ne)))
            for d in ne:
                f.write(struct.pack("<Q", d))
            f.write(struct.pack("<IQ", t, o))
        pos = f.tell()
        f.write(b"\0" * ((pos + align - 1) // align * align - pos))
        for raw in payloads:
            f.write(raw)
            f.write(b"\0" * ((len(raw) + align - 1) // align * align
                             - len(raw)))


def _tokenizer_lists(tokenizer, vocab_size: int
                     ) -> Tuple[List[str], List[str]]:
    """(printable tokens, merges) for GGUF metadata.  BpeTokenizer keeps
    raw bytes — re-encode through the GPT-2 printable map; merges are
    reconstructed from pair scores (best-effort: llama.cpp only needs
    them for encoding, decoding works from tokens alone)."""
    enc = gpt2_bytes_to_unicode()
    toks = getattr(tokenizer, "vocab", None)
    if toks is None:
        raise ValueError("tokenizer must be a BpeTokenizer")
    printable = ["".join(enc[b] for b in t) for t in toks]
    printable += [""] * (vocab_size - len(printable))
    merges: List[str] = []
    pair = getattr(tokenizer, "_pair_merge", {})
    ranked = sorted(((score, l, r) for (l, r), (score, _m) in pair.items()),
                    reverse=True)
    for _score, l, r in ranked:
        merges.append(f"{printable[l]} {printable[r]}")
    return printable, merges
