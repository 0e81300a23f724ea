"""Self-contained ``.bin`` model format — reader/writer.

Bit-compatible with the reference format so the same file runs on the
reference C engine and this framework (format spec: reference
README.md:239-255; writer export.py:236-283,343-475; parser
infer/infer.c:220-320):

    [0..255]  header: magic "BD4SURLM" (2 x u32), major/minor version,
              model_type (0=Nano, 2=Qwen2, 3=Qwen3, 10=LoRA), config_length,
              9 x i32 config (block_size, vocab_size, n_layer, n_embd,
              n_head, n_kv_head, n_hidden, is_shared_classifier, head_dim),
              quant_type (0x00 F32 / 0x80 Q80 / 0x42 Q4K), group_size;
              zero-padded to 256 B
    [256..]   embedded tokenizer (length-prefixed; absent in LoRA files)
    [...]     weights, fixed order: attn_norm[L], ffn_norm[L], final_norm
              (always fp32), then tok_emb, wq[L], wk[L], wv[L], wo[L],
              w1[L], w2[L], w3[L] (fp32 or per-group int8+scales), RoPE
              cos/sin tables (fp32), classifier if untied.

This module is pure numpy (host-side IO); device code consumes the
returned arrays.  Matrices convert between the file's (out, in) row-major
layout (torch nn.Linear) and this framework's (in, out) right-multiply
layout at the boundary.
"""

from __future__ import annotations

import io
import math
import os as _os
import struct
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from nano_tpu.config import ModelConfig

MAGIC_0 = 0x42443453  # "BD4S" (LE)
MAGIC_1 = 0x55524C4D  # "URLM"
VERSION = (2026, 1)

MODEL_TYPE_NANO = 0
MODEL_TYPE_QWEN2 = 2
MODEL_TYPE_QWEN3 = 3
MODEL_TYPE_LORA = 10

QUANT_F32 = 0x00
QUANT_Q80 = 0x80
QUANT_Q4K = 0x42

HEADER_BYTES = 256


# =====================================================================
# Q80 quantization (symmetric per-group int8; reference: export.py:40-63,
# infer/tensor.c:15-69)
# =====================================================================

def quantize_q80(w: np.ndarray, group_size: int) -> Tuple[np.ndarray, np.ndarray, float]:
    """-> (int8 values, fp32 scales per group, max abs error)."""
    flat = np.ascontiguousarray(w, dtype=np.float32).reshape(-1)
    assert flat.size % group_size == 0, (flat.size, group_size)
    groups = flat.reshape(-1, group_size)
    absmax = np.max(np.abs(groups), axis=1)
    scale = absmax / 127.0
    safe = np.where(scale == 0.0, 1.0, scale)
    q = np.rint(groups / safe[:, None]).astype(np.int8)
    deq = q.astype(np.float32) * scale[:, None]
    err = float(np.max(np.abs(deq - groups))) if groups.size else 0.0
    return q.reshape(-1), scale.astype(np.float32), err


def dequantize_q80(q: np.ndarray, scale: np.ndarray, group_size: int) -> np.ndarray:
    g = q.astype(np.float32).reshape(-1, group_size)
    return (g * scale.reshape(-1, 1)).reshape(-1)


def pick_group_size(n_embd: int, group_size: int) -> int:
    """Halve group size until it divides n_embd (reference: export.py:418-420)."""
    while n_embd % group_size != 0:
        group_size //= 2
    return group_size


def _q80_group_size(cfg: ModelConfig, group_size: int) -> int:
    """Group size must divide EVERY matmul contraction dim (E, H*D, F):
    the engines index per-row scale groups, so groups must not straddle
    rows.  (The reference only checks n_embd — a latent bug for odd
    n_hidden.)  Halve until it divides the gcd."""
    g = math.gcd(math.gcd(cfg.n_embd, cfg.n_hidden),
                 cfg.n_head * cfg.head_dim)
    return pick_group_size(g, group_size)


# =====================================================================
# tokenizer field (BNF at reference export.py:72-114)
# =====================================================================

def serialize_tokenizer_field(tokenizer_config: dict) -> bytes:
    itos: List[str] = tokenizer_config["itos"]
    specials = set(tokenizer_config["special_tokens"])
    buf = io.BytesIO()
    total = 8 + sum((len(t) + 2) * 4 for t in itos)
    buf.write(struct.pack("<II", total, len(itos)))
    for i, t in enumerate(itos):
        buf.write(struct.pack("<BBBB", len(t), 1 if t in specials else 0, 255, 255))
        buf.write(struct.pack("<I", i))
        for ch in t:
            buf.write(struct.pack("<I", ord(ch)))
    return buf.getvalue()


def parse_tokenizer_field(data: bytes, offset: int) -> Tuple[dict, int]:
    """-> (tokenizer config dict, next offset)."""
    total, vocab_size = struct.unpack_from("<II", data, offset)
    pos = offset + 8
    itos: List[Optional[str]] = [None] * vocab_size
    special_flags = [False] * vocab_size
    for _ in range(vocab_size):
        length, is_special, _, _ = struct.unpack_from("<BBBB", data, pos)
        (tid,) = struct.unpack_from("<I", data, pos + 4)
        chars = struct.unpack_from(f"<{length}I", data, pos + 8)
        itos[tid] = "".join(chr(c) for c in chars)
        special_flags[tid] = bool(is_special)
        pos += 8 + 4 * length
    assert pos - offset == total, "tokenizer field length mismatch"
    itos_final = [t if t is not None else "" for t in itos]
    return {
        "vocab_size": vocab_size,
        "itos": itos_final,
        "stoi": {t: i for i, t in enumerate(itos_final)},
        "special_tokens": {t: i for i, t in enumerate(itos_final)
                           if special_flags[i]},
    }, pos


# =====================================================================
# header
# =====================================================================

def _pack_header(model_type: int, cfg: ModelConfig, shared_classifier: bool,
                 quant_type: int, group_size: int,
                 rope_theta: float = 0.0) -> bytes:
    buf = io.BytesIO()
    buf.write(struct.pack("<II", MAGIC_0, MAGIC_1))
    buf.write(struct.pack("<ii", *VERSION))
    buf.write(struct.pack("<ii", model_type, 36))
    buf.write(struct.pack(
        "<9i", cfg.block_size, cfg.vocab_size, cfg.n_layer, cfg.n_embd,
        cfg.n_head, cfg.n_kv_head, cfg.n_hidden, int(shared_classifier),
        cfg.head_dim))
    buf.write(struct.pack("<i", quant_type))
    if quant_type != QUANT_F32 or rope_theta:
        buf.write(struct.pack("<i", group_size))
    # extension (zero-padded region in reference files, ignored by the C
    # engine): rope_theta at offset 68, so non-default-theta models
    # (e.g. long-context Qwen variants) round-trip exactly
    if rope_theta:
        buf.write(struct.pack("<f", float(rope_theta)))
    raw = buf.getvalue()
    return raw + b"\0" * (HEADER_BYTES - len(raw))


@dataclass
class BinHeader:
    model_type: int
    major: int
    minor: int
    block_size: int
    vocab_size: int
    n_layer: int
    n_embd: int
    n_head: int
    n_kv_head: int
    n_hidden: int
    shared_classifier: bool
    head_dim: int
    quant_type: int
    group_size: int
    rope_theta: float = 0.0    # header extension; 0 in reference files

    def to_model_config(self, model_type_overrides: Optional[dict] = None
                        ) -> ModelConfig:
        kw: Dict[str, Any] = dict(
            block_size=self.block_size, vocab_size=self.vocab_size,
            n_layer=self.n_layer, n_embd=self.n_embd, n_head=self.n_head,
            n_kv_head=self.n_kv_head, n_hidden=self.n_hidden,
            head_dim=self.head_dim,
            tie_embeddings=self.shared_classifier)
        # norm_eps is not stored in the header; Qwen uses 1e-6 (HF config).
        # The reference C engine hardcodes 1e-5 for every arch
        # (infer/infer.c:608) — we use the model-correct value instead.
        if self.model_type == MODEL_TYPE_QWEN2:
            kw.update(qkv_bias=True, rope_theta=1e6, norm_eps=1e-6)
        elif self.model_type == MODEL_TYPE_QWEN3:
            # Qwen3: half-split RoPE, theta 1e6, per-head q/k norm
            # (reference: infer/infer.c:189-204,692-712,824-835)
            kw.update(use_qk_norm=True, rope_theta=1e6, rope_style="half",
                      norm_eps=1e-6)
        if self.rope_theta > 0:
            # our writer records the true theta in the header's padding;
            # non-default-theta models (e.g. long-context Qwen) round-trip
            kw.update(rope_theta=float(self.rope_theta))
        if model_type_overrides:
            kw.update(model_type_overrides)
        return ModelConfig(**kw)


def parse_header(data: bytes) -> BinHeader:
    m0, m1 = struct.unpack_from("<II", data, 0)
    if (m0, m1) != (MAGIC_0, MAGIC_1):
        raise ValueError("not a BD4SURLM .bin file")
    major, minor = struct.unpack_from("<ii", data, 8)
    model_type, _cfg_len = struct.unpack_from("<ii", data, 16)
    fields = struct.unpack_from("<9i", data, 24)
    quant_type, group_size = struct.unpack_from("<ii", data, 60)
    (rope_theta,) = struct.unpack_from("<f", data, 68)
    if not (rope_theta > 0) or rope_theta != rope_theta:   # 0/garbage
        rope_theta = 0.0
    return BinHeader(
        model_type=model_type, major=major, minor=minor,
        block_size=fields[0], vocab_size=fields[1], n_layer=fields[2],
        n_embd=fields[3], n_head=fields[4], n_kv_head=fields[5],
        n_hidden=fields[6], shared_classifier=bool(fields[7]),
        head_dim=fields[8], quant_type=quant_type, group_size=group_size,
        rope_theta=float(rope_theta))


# =====================================================================
# weight export — takes OUR pytree layout (see models/gpt.py)
# =====================================================================

def _file_order_tensors(params: Dict[str, Any], cfg: ModelConfig,
                        include_quantizable: bool = True
                        ) -> Tuple[List[np.ndarray], List[np.ndarray], List[np.ndarray]]:
    """-> (norms fp32, quantizable in file order, rope/extra fp32).

    Our layout is stacked (L, in, out); the file wants per-layer (out, in)
    row-major.  include_quantizable=False skips materializing the large
    transposed copies (used by the Q4K path, which repacks itself).
    """
    b = params["blocks"]

    def per_layer_T(name):
        arr = np.asarray(b[name], dtype=np.float32)
        return [np.ascontiguousarray(arr[l].T) for l in range(cfg.n_layer)]

    norms = (
        [np.asarray(b["attn_norm"][l], np.float32) for l in range(cfg.n_layer)]
        + [np.asarray(b["ffn_norm"][l], np.float32) for l in range(cfg.n_layer)]
        + [np.asarray(params["norm"], np.float32)]
    )
    if not include_quantizable:
        return norms, [], []
    quantizable = (
        [np.asarray(params["tok_embeddings"], np.float32)]
        + per_layer_T("wq") + per_layer_T("wk") + per_layer_T("wv")
        + per_layer_T("wo") + per_layer_T("w1") + per_layer_T("w2")
        + per_layer_T("w3")
    )
    return norms, quantizable, []


def _rope_tables(cfg: ModelConfig) -> Tuple[np.ndarray, np.ndarray]:
    dim = cfg.head_dim  # == n_embd//n_head for Nano; explicit for Qwen3
    freqs = 1.0 / (cfg.rope_theta ** (np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim))
    t = np.arange(cfg.block_size, dtype=np.float32)
    angles = np.outer(t, freqs).astype(np.float32)
    return np.cos(angles), np.sin(angles)


def write_model(path: str, params: Dict[str, Any], cfg: ModelConfig,
                tokenizer_config: dict, quant: str = "f32",
                group_size: int = 128,
                model_type: int = MODEL_TYPE_NANO,
                rope_tables: Optional[Tuple[np.ndarray, np.ndarray]] = None
                ) -> None:
    """Export to .bin (quant: 'f32' or 'q80').

    rope_tables: optional (cos, sin) to embed verbatim — pass the tables
    read from an existing file to keep re-exports bit-identical (the C
    engine consumes these tables directly, infer/infer.c:185-188).
    """
    shared = "output" not in params
    # header theta extension ONLY for non-default thetas: default-theta
    # files stay byte-identical with the reference exporter (readers
    # reconstruct 1e4/1e6 from the model type)
    theta_ext = (0.0 if cfg.rope_theta in (10000.0, 1e6)
                 else cfg.rope_theta)

    def build_quantizable():
        # deferred: the q4k branch never uses these transposed copies
        # (it repacks stacked tensors itself) — building them up front
        # doubled peak export memory at 0.6B scale
        norms_, quantizable_, _ = _file_order_tensors(params, cfg)
        if not shared:
            quantizable_.append(np.ascontiguousarray(
                np.asarray(params["output"], np.float32).T))
        return norms_, quantizable_

    norms, _q, _ = _file_order_tensors(params, cfg, include_quantizable=False)
    quantizable = None

    # arch extras written fp32 after the main matmul weights
    # (reference: infer/infer.c:175-183, infer/tools/export_qwen.py:516-546)
    extras: List[np.ndarray] = []
    b = params["blocks"]
    if model_type == MODEL_TYPE_QWEN2:
        for name in ("bq", "bk", "bv"):
            extras += [np.asarray(b[name][l], np.float32)
                       for l in range(cfg.n_layer)]
    elif model_type == MODEL_TYPE_QWEN3:
        for name in ("q_norm", "k_norm"):
            extras += [np.asarray(b[name][l], np.float32)
                       for l in range(cfg.n_layer)]

    cos, sin = rope_tables if rope_tables is not None else _rope_tables(cfg)

    if isinstance(tokenizer_config, dict):
        tok_field = serialize_tokenizer_field(tokenizer_config)
    else:  # BpeTokenizer
        tok_field = tokenizer_config.serialize_field()

    with open(path, "wb") as f:
        if quant == "f32":
            f.write(_pack_header(model_type, cfg, shared, QUANT_F32, 0,
                                 theta_ext))
            f.write(tok_field)
            for w in norms:
                f.write(w.astype("<f4").tobytes())
            _, quantizable = build_quantizable()
            classifier = None if shared else quantizable.pop()
            for w in quantizable:
                f.write(w.astype("<f4").tobytes())
            for w in extras:
                f.write(w.astype("<f4").tobytes())
            f.write(cos.astype("<f4").tobytes())
            f.write(sin.astype("<f4").tobytes())
            if classifier is not None:
                f.write(classifier.astype("<f4").tobytes())
        elif quant == "q80":
            gs = _q80_group_size(cfg, group_size)
            f.write(_pack_header(model_type, cfg, shared, QUANT_Q80, gs,
                                 theta_ext))
            f.write(tok_field)
            for w in norms:
                f.write(w.astype("<f4").tobytes())
            _, quantizable = build_quantizable()
            classifier = None if shared else quantizable.pop()
            for w in quantizable:
                q, s, _err = quantize_q80(w, gs)
                f.write(q.tobytes())
                f.write(s.astype("<f4").tobytes())
            for w in extras:
                f.write(w.astype("<f4").tobytes())
            f.write(cos.astype("<f4").tobytes())
            f.write(sin.astype("<f4").tobytes())
            if classifier is not None:
                q, s, _err = quantize_q80(classifier, gs)
                f.write(q.tobytes())
                f.write(s.astype("<f4").tobytes())
        elif quant == "q4k":
            # Q4K layout (reference: infer/tools/export_q4k.c:28-224,
            # infer/infer.c:140-216): f32 norms, then EIGHT self-describing
            # stacked Q4K tensor frames (tok_emb 2-D; wq..w3 3-D with a
            # leading layer axis), then arch extras, then RoPE tables for
            # Nano/Qwen2 only.  The classifier is always the shared
            # embedding (infer/infer.c:210-212), and the reference repack
            # tool drops Qwen2's qkv biases — so Q4K supports Nano/Qwen3
            # shared-classifier models only.
            from nano_tpu.ops.q4k import pack_tensor_frame
            if not shared:
                raise ValueError("Q4K requires a shared classifier")
            if model_type == MODEL_TYPE_QWEN2:
                raise ValueError("Q4K does not support Qwen2 (reference "
                                 "drops its qkv biases)")
            f.write(_pack_header(model_type, cfg, shared, QUANT_Q4K, 0,
                                 theta_ext))
            f.write(tok_field)
            for w in norms:
                f.write(w.astype("<f4").tobytes())
            bl = params["blocks"]

            def stacked_T(name):  # ours (L, in, out) -> file (L, out, in)
                arr = np.asarray(bl[name], np.float32)
                return np.ascontiguousarray(arr.transpose(0, 2, 1))

            f.write(pack_tensor_frame(
                np.asarray(params["tok_embeddings"], np.float32)))
            for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
                f.write(pack_tensor_frame(stacked_T(name)))
            for w in extras:
                f.write(w.astype("<f4").tobytes())
            if model_type == MODEL_TYPE_NANO:
                f.write(cos.astype("<f4").tobytes())
                f.write(sin.astype("<f4").tobytes())
        else:
            raise ValueError(f"unsupported quant: {quant}")


# =====================================================================
# weight import
# =====================================================================

class _Reader:
    def __init__(self, data: bytes, offset: int):
        self.data = data
        self.pos = offset

    def f32(self, count: int) -> np.ndarray:
        out = np.frombuffer(self.data, dtype="<f4", count=count, offset=self.pos)
        self.pos += 4 * count
        return np.asarray(out)

    def i8(self, count: int) -> np.ndarray:
        out = np.frombuffer(self.data, dtype=np.int8, count=count, offset=self.pos)
        self.pos += count
        return np.asarray(out)


@dataclass
class QuantTensor:
    """A per-group int8 tensor as stored in the file."""
    q: np.ndarray          # int8, logical shape
    scale: np.ndarray      # fp32, (numel // group_size,)
    group_size: int

    def dequantize(self) -> np.ndarray:
        return dequantize_q80(self.q.reshape(-1), self.scale,
                              self.group_size).reshape(self.q.shape)


@dataclass
class Q4KFrame:
    """One self-describing Q4K tensor frame as stored in the file."""
    blocks: np.ndarray          # (nb, 160) uint8
    shape: Tuple[int, ...]

    def dequantize(self) -> np.ndarray:
        from nano_tpu.ops.q4k import dequantize_lines_np
        rows = int(np.prod(self.shape[:-1])) if len(self.shape) > 1 else 1
        return dequantize_lines_np(self.blocks, rows,
                                   self.shape[-1]).reshape(self.shape)


@dataclass
class BinModel:
    header: BinHeader
    config: ModelConfig
    tokenizer_config: dict
    params: Dict[str, Any]                     # fp32 pytree (our layout)
    qparams: Optional[Dict[str, Any]] = None   # QuantTensor pytree (Q80 files)
    rope_cos: Optional[np.ndarray] = None
    rope_sin: Optional[np.ndarray] = None


def _read_tensor(r: _Reader, shape: Tuple[int, ...], quant_type: int,
                 group_size: int, dense: bool = True):
    numel = int(np.prod(shape))
    if quant_type == QUANT_F32:
        return r.f32(numel).reshape(shape), None
    if quant_type == QUANT_Q80:
        q = r.i8(numel).reshape(shape)
        s = r.f32(numel // group_size)
        qt = QuantTensor(q=q, scale=s, group_size=group_size)
        if not dense:
            return None, qt
        return qt.dequantize().astype(np.float32), qt
    raise ValueError(f"unsupported quant_type 0x{quant_type:x}")


def read_model(path: str, dense: bool = True) -> BinModel:
    """Parse a Nano .bin (F32 or Q80) into our stacked-params layout.

    Weight order must match the C engine's pointer walk
    (reference: infer/infer.c:100-217).

    dense=False skips the f32 dequantized copies of quantized matmul
    weights (params then carries only norms/extras/rope): the default
    quantized-load path consumes only qparams, and the discarded dense
    copies cost ~4 B/weight of transient host memory (~2.4 GB at 0.6B)
    plus dequant time at every load.  F32 files ignore the flag.
    """
    with open(path, "rb") as f:
        data = f.read()
    hdr = parse_header(data)
    if hdr.model_type == MODEL_TYPE_LORA:
        raise ValueError("use read_lora for LoRA files")
    if hdr.model_type in (MODEL_TYPE_QWEN2, MODEL_TYPE_QWEN3):
        from nano_tpu.tokenizer.bpe import BpeTokenizer
        bpe, pos = BpeTokenizer.parse_field(data, HEADER_BYTES,
                                            hdr.vocab_size)
        tok_cfg = {"type": "bpe", "tokenizer": bpe}
    else:
        tok_cfg, pos = parse_tokenizer_field(data, HEADER_BYTES)
    cfg = hdr.to_model_config()
    r = _Reader(data, pos)

    L, E, V = cfg.n_layer, cfg.n_embd, cfg.vocab_size
    H, KV, D, F = cfg.n_head, cfg.n_kv_head, cfg.head_dim, cfg.n_hidden
    gs = hdr.group_size

    attn_norm = np.stack([r.f32(E) for _ in range(L)])
    ffn_norm = np.stack([r.f32(E) for _ in range(L)])
    final_norm = r.f32(E)

    if hdr.quant_type == QUANT_Q4K:
        return _read_model_q4k(data, hdr, cfg, tok_cfg, r,
                               attn_norm, ffn_norm, final_norm, dense)

    if hdr.quant_type == QUANT_F32:
        dense = True                       # no quantized form exists

    def read_stack(shape_out_in):
        """L matrices stored (out, in); return stacked (L, in, out) + quants."""
        fs, qs = [], []
        for _ in range(L):
            w, qt = _read_tensor(r, shape_out_in, hdr.quant_type, gs, dense)
            fs.append(np.ascontiguousarray(w.T) if dense else None)
            qs.append(qt)
        return (np.stack(fs) if dense else None), qs

    tok_emb, tok_emb_q = _read_tensor(r, (V, E), hdr.quant_type, gs, dense)
    wq, wq_q = read_stack((H * D, E))
    wk, wk_q = read_stack((KV * D, E))
    wv, wv_q = read_stack((KV * D, E))
    wo, wo_q = read_stack((E, H * D))
    w1, w1_q = read_stack((F, E))
    w2, w2_q = read_stack((E, F))
    w3, w3_q = read_stack((F, E))

    # arch extras after w3 (reference: infer/infer.c:175-183)
    extras: Dict[str, Any] = {}
    if hdr.model_type == MODEL_TYPE_QWEN2:
        extras["bq"] = np.stack([r.f32(H * D) for _ in range(L)])
        extras["bk"] = np.stack([r.f32(KV * D) for _ in range(L)])
        extras["bv"] = np.stack([r.f32(KV * D) for _ in range(L)])
    elif hdr.model_type == MODEL_TYPE_QWEN3:
        extras["q_norm"] = np.stack([r.f32(D) for _ in range(L)])
        extras["k_norm"] = np.stack([r.f32(D) for _ in range(L)])

    rope_cos = r.f32(cfg.block_size * (D // 2)).reshape(cfg.block_size, -1)
    rope_sin = r.f32(cfg.block_size * (D // 2)).reshape(cfg.block_size, -1)

    params: Dict[str, Any] = {
        "norm": final_norm,
        "blocks": {"attn_norm": attn_norm, "ffn_norm": ffn_norm,
                   **extras},
    }
    if dense:
        params["tok_embeddings"] = tok_emb
        params["blocks"].update(wq=wq, wk=wk, wv=wv, wo=wo,
                                w1=w1, w2=w2, w3=w3)
    qparams = None
    if hdr.quant_type == QUANT_Q80:
        qparams = {
            "tok_embeddings": tok_emb_q,
            "blocks": {"wq": wq_q, "wk": wk_q, "wv": wv_q, "wo": wo_q,
                       "w1": w1_q, "w2": w2_q, "w3": w3_q},
        }

    if not hdr.shared_classifier:
        clf, clf_q = _read_tensor(r, (V, E), hdr.quant_type, gs, dense)
        if dense:
            params["output"] = np.ascontiguousarray(clf.T)
        if qparams is not None:
            qparams["output"] = clf_q

    return BinModel(header=hdr, config=cfg, tokenizer_config=tok_cfg,
                    params=params, qparams=qparams,
                    rope_cos=rope_cos, rope_sin=rope_sin)


def _read_model_q4k(data: bytes, hdr: BinHeader, cfg: ModelConfig,
                    tok_cfg: dict, r: _Reader,
                    attn_norm, ffn_norm, final_norm,
                    dense: bool = True) -> "BinModel":
    """Q4K tail: 8 stacked tensor frames, extras, RoPE for Nano/Qwen2
    (reference: infer/infer.c:140-216, infer/tools/export_q4k.c)."""
    from nano_tpu.ops.q4k import parse_tensor_frame

    L, E, V = cfg.n_layer, cfg.n_embd, cfg.vocab_size
    H, KV, D, F = cfg.n_head, cfg.n_kv_head, cfg.head_dim, cfg.n_hidden

    order = [("tok_embeddings", (V, E)), ("wq", (L, H * D, E)),
             ("wk", (L, KV * D, E)), ("wv", (L, KV * D, E)),
             ("wo", (L, E, H * D)), ("w1", (L, F, E)),
             ("w2", (L, E, F)), ("w3", (L, F, E))]
    frames: Dict[str, Q4KFrame] = {}
    for name, shape in order:
        blocks, fshape, r.pos = parse_tensor_frame(data, r.pos)
        assert fshape == shape, (name, fshape, shape)
        frames[name] = Q4KFrame(blocks=blocks, shape=shape)

    extras: Dict[str, Any] = {}
    if hdr.model_type == MODEL_TYPE_QWEN3:
        extras["q_norm"] = np.stack([r.f32(D) for _ in range(L)])
        extras["k_norm"] = np.stack([r.f32(D) for _ in range(L)])
    elif hdr.model_type == MODEL_TYPE_QWEN2:
        raise ValueError("Q4K Qwen2 files are not well-formed "
                         "(reference drops the qkv biases)")

    if hdr.model_type == MODEL_TYPE_NANO:
        rope_cos = r.f32(cfg.block_size * (D // 2)).reshape(cfg.block_size, -1)
        rope_sin = r.f32(cfg.block_size * (D // 2)).reshape(cfg.block_size, -1)
    else:  # Qwen3 recomputes theta=1e6 tables (infer/infer.c:189-204)
        rope_cos, rope_sin = _rope_tables(cfg)

    def deq_T(name):  # (L, out, in) -> ours (L, in, out)
        return np.ascontiguousarray(
            frames[name].dequantize().transpose(0, 2, 1))

    params: Dict[str, Any] = {
        "norm": final_norm,
        "blocks": {"attn_norm": attn_norm, "ffn_norm": ffn_norm,
                   **extras},
    }
    if dense:
        params["tok_embeddings"] = frames["tok_embeddings"].dequantize()
        params["blocks"].update(
            wq=deq_T("wq"), wk=deq_T("wk"), wv=deq_T("wv"),
            wo=deq_T("wo"), w1=deq_T("w1"), w2=deq_T("w2"),
            w3=deq_T("w3"))
    qparams = {"tok_embeddings": frames["tok_embeddings"],
               "blocks": {n: frames[n] for n in
                          ("wq", "wk", "wv", "wo", "w1", "w2", "w3")}}
    return BinModel(header=hdr, config=cfg, tokenizer_config=tok_cfg,
                    params=params, qparams=qparams,
                    rope_cos=rope_cos, rope_sin=rope_sin)


def _q4k_device_params(bm: "BinModel", fuse: bool,
                       clf_dequant: str = "f32") -> Dict[str, Any]:
    """Q4K frames -> device pytree of stacked Q4KTensors (SoA re-layout)."""
    from nano_tpu.ops.q4k import Q4KTensor
    import jax.numpy as jnp

    L = bm.config.n_layer

    def per_layer(frame: Q4KFrame):
        Lf, out, inn = frame.shape
        blocks = frame.blocks.reshape(Lf, -1, 160)
        return [Q4KTensor.from_blocks(blocks[l], out, inn)
                for l in range(Lf)]

    qb = bm.qparams["blocks"]
    layers = {n: per_layer(qb[n]) for n in
              ("wq", "wk", "wv", "wo", "w1", "w2", "w3")}

    blocks: Dict[str, Any] = {
        "attn_norm": jnp.asarray(bm.params["blocks"]["attn_norm"]),
        "ffn_norm": jnp.asarray(bm.params["blocks"]["ffn_norm"]),
        "wo": Q4KTensor.stack(layers["wo"]),
        "w2": Q4KTensor.stack(layers["w2"]),
    }
    for name in ("q_norm", "k_norm"):
        if name in bm.params["blocks"]:
            blocks[name] = jnp.asarray(bm.params["blocks"][name])
    if fuse:
        blocks["wqkv"] = Q4KTensor.stack(
            [Q4KTensor.concat_out([layers["wq"][l], layers["wk"][l],
                                   layers["wv"][l]]) for l in range(L)])
        blocks["w13"] = Q4KTensor.stack(
            [Q4KTensor.concat_out([layers["w1"][l], layers["w3"][l]])
             for l in range(L)])
    else:
        blocks.update({n: Q4KTensor.stack(layers[n])
                       for n in ("wq", "wk", "wv", "w1", "w3")})
    layout_env = _os.environ.get("NANO_TPU_Q4K_LAYOUT", "")
    if layout_env == "unpacked":
        # pre-unpack nibbles to int8 values at load: bit-identical
        # weights, 2x weight HBM, zero per-step unpack ops (the
        # embedding/head stay packed — row gather wants the small form)
        for name, t in list(blocks.items()):
            if isinstance(t, Q4KTensor):
                blocks[name] = t.to_unpacked()
    elif layout_env == "grouped":
        # int8-MXU layout: group-batched int8xint8->int32 dots with the
        # affine correction folded into one precombined dot
        # (ops/q4k.py q4k_matmul_int8) — quantization decisions stay
        # bit-exact with the C engine, float combine order differs
        for name, t in list(blocks.items()):
            if isinstance(t, Q4KTensor) and t.in_dim % 32 == 0:
                blocks[name] = t.to_grouped()
    V, E = bm.config.vocab_size, bm.config.n_embd
    tok = Q4KTensor.from_blocks(bm.qparams["tok_embeddings"].blocks, V, E)
    params = {"tok_embeddings": tok,
              "norm": jnp.asarray(bm.params["norm"]), "blocks": blocks}
    from nano_tpu.ops import qmatmul as _qm
    if (_qm._IMPL == "int8"
            and _os.environ.get("NANO_TPU_CLF_Q4K", "") != "packed"):
        head = q4k_head_requant(bm.qparams["tok_embeddings"].blocks, V, E)
        if head is not None:       # None: E not 32-aligned, keep packed
            params["output_q"] = head
    if not _maybe_int8_layout(params):
        _attach_clf_dequant(params, bm, clf_dequant)
    return params


def quantized_device_params(bm: "BinModel", fuse: bool = True,
                            clf_dequant: str = "f32") -> Dict[str, Any]:
    """Build a device params pytree keeping matmul weights quantized.

    Matmul weights become stacked Q80Tensors (int8 + scales, (L, out, in)
    file layout); norms stay fp32.  Consumed by models.gpt via the fused
    dequant matmul (ops/qmatmul.py).

    fuse=True concatenates wq/wk/wv -> wqkv and w1/w3 -> w13 along the
    output dim (valid because Q80 groups run along the input dim) — fewer,
    larger kernel launches per decode step.
    """
    from nano_tpu.ops.qmatmul import Q80Tensor
    import jax.numpy as jnp

    assert bm.qparams is not None, "not a quantized model file"
    if bm.header.quant_type == QUANT_Q4K:
        return _q4k_device_params(bm, fuse, clf_dequant)
    gs = bm.header.group_size

    def stack_q(qt_lists) -> Q80Tensor:
        """One or more per-layer lists -> stacked (L, out, in) Q80Tensor,
        concatenating multiple projections along out."""
        L = len(qt_lists[0])
        qs, ss = [], []
        for l in range(L):
            q = np.concatenate([lst[l].q for lst in qt_lists], axis=0)
            s = np.concatenate(
                [lst[l].scale.reshape(lst[l].q.shape[0], -1)
                 for lst in qt_lists], axis=0)
            qs.append(q)
            ss.append(s)
        return Q80Tensor(q=jnp.asarray(np.stack(qs)),
                         scales=jnp.asarray(np.stack(ss)), group_size=gs)

    def single_q(qt):
        out, inn = qt.q.shape
        return Q80Tensor(q=jnp.asarray(qt.q),
                         scales=jnp.asarray(qt.scale.reshape(out, inn // gs)),
                         group_size=gs)

    qb = bm.qparams["blocks"]
    blocks: Dict[str, Any] = {
        "attn_norm": jnp.asarray(bm.params["blocks"]["attn_norm"]),
        "ffn_norm": jnp.asarray(bm.params["blocks"]["ffn_norm"]),
        "wo": stack_q([qb["wo"]]),
        "w2": stack_q([qb["w2"]]),
    }
    # fp32 arch extras (Qwen2 biases / Qwen3 qk-norms) pass through
    for name in ("q_norm", "k_norm", "bq", "bk", "bv"):
        if name in bm.params["blocks"]:
            blocks[name] = jnp.asarray(bm.params["blocks"][name])
    if fuse:
        blocks["wqkv"] = stack_q([qb["wq"], qb["wk"], qb["wv"]])
        blocks["w13"] = stack_q([qb["w1"], qb["w3"]])
    else:
        blocks.update(wq=stack_q([qb["wq"]]), wk=stack_q([qb["wk"]]),
                      wv=stack_q([qb["wv"]]), w1=stack_q([qb["w1"]]),
                      w3=stack_q([qb["w3"]]))
    params: Dict[str, Any] = {
        "tok_embeddings": single_q(bm.qparams["tok_embeddings"]),
        "norm": jnp.asarray(bm.params["norm"]),
        "blocks": blocks,
    }
    if "output" in bm.qparams:
        params["output"] = single_q(bm.qparams["output"])
    if not _maybe_int8_layout(params):
        _attach_clf_dequant(params, bm, clf_dequant)
    return params


def _maybe_int8_layout(params: Dict[str, Any]) -> bool:
    """int8-MXU load step (NANO_TPU_QMATMUL=int8, the default): re-layout
    every quantized matmul weight to grouped form (one int8 dot per
    quantization group on the MXU — ops/qmatmul.py) and keep the LM head
    quantized as `output_q` instead of dequantizing a float table (reads
    1 B/weight at the head instead of 4).

    Returns True when the head is handled here (skip _attach_clf_dequant).
    The embedding table keeps its row layout for gathers; the tied head
    is a second, grouped copy — int8+int8 costs the same HBM as one bf16
    table.
    """
    from nano_tpu.ops import qmatmul
    from nano_tpu.ops.qmatmul import Q80Tensor
    from nano_tpu.ops.q4k import Q4KTensor
    env_impl = _os.environ.get("NANO_TPU_QMATMUL", qmatmul._IMPL)
    if env_impl != qmatmul._IMPL:
        # the env var is read ONCE at qmatmul import; surface a late
        # change instead of silently running the wrong numerics mode
        import logging
        logging.getLogger(__name__).warning(
            "NANO_TPU_QMATMUL=%s was set after nano_tpu.ops.qmatmul was "
            "imported; this load still uses impl=%s (set the env var "
            "before importing nano_tpu, or patch qmatmul._IMPL)",
            env_impl, qmatmul._IMPL)
    if qmatmul._IMPL != "int8":
        return False

    def conv(t):
        # grouped int8-MXU layout only pays off for Q80 with big groups
        # (measured: batched-G dots lose below gs=256, ops/qmatmul.py);
        # Q4K stays packed — its nibble layout already halves HBM and the
        # bf16 fused-dequant dot is the fastest path measured.
        if (isinstance(t, Q80Tensor)
                and t.group_size >= qmatmul.MIN_GROUPED_GS):
            return t.to_grouped()
        return t

    blocks = params["blocks"]
    small_gs = None
    for k, v in list(blocks.items()):
        if isinstance(v, (Q80Tensor, Q4KTensor)):
            blocks[k] = conv(v)
            if (isinstance(v, Q80Tensor)
                    and v.group_size < qmatmul.MIN_GROUPED_GS):
                small_gs = v.group_size
    if small_gs is not None:
        # surface the numerics choice: small groups run bf16 fused-dequant
        # dots, not the C engine's f32 math — near-tie greedy divergence
        # is possible.  NANO_TPU_QMATMUL=xla restores value parity.
        import logging
        logging.getLogger(__name__).info(
            "Q80 group_size=%d < %d: decode uses bf16 fused-dequant dots "
            "(quantization decisions exact, float values looser than the "
            "C engine); set NANO_TPU_QMATMUL=xla for f32 value parity",
            small_gs, qmatmul.MIN_GROUPED_GS)
    if "output_q" in params:
        return True          # head already attached (Q4K host-side path)
    out = params.get("output")
    if isinstance(out, (Q80Tensor, Q4KTensor)):
        # untied head: keep it quantized (fused-dequant or grouped dot
        # reads 0.5-1 B/weight instead of a 4 B/weight f32 table)
        params["output"] = conv(out)
        return True
    tok = params["tok_embeddings"]
    if isinstance(tok, (Q80Tensor, Q4KTensor)):
        # tied head: run the logits matmul straight off the quantized
        # embedding table (grouped copy only when it pays off)
        params["output_q"] = conv(tok)
        return True
    return False


def q4k_head_requant(blocks: np.ndarray, out_dim: int,
                     in_dim: int) -> "Any":
    """Q4K LM head -> grouped Q80-256 tensor, computed HOST-SIDE from the
    packed file blocks (no 622 MB device->host round-trip through the
    tunnel).  Rationale: inside the decode scan the head weight is
    loop-invariant, so XLA hoists (materializes) any fused dequant into a
    bf16 table read every step; the int8-MXU grouped dot reads 1 B/weight
    and ran 171 us vs 868 us at the 152k head (PERF.md).  The head values
    are already 4-bit quantized, so the extra int8 step adds noise far
    below the Q4K error itself (measured +0.008 PPL)."""
    from nano_tpu.ops.q4k import dequantize_lines_np
    dense = dequantize_lines_np(blocks, out_dim, in_dim)
    divisors = [g for g in (256, 128, 64, 32) if in_dim % g == 0]
    if not divisors:
        return None        # in_dim not 32-aligned: keep the packed head
    gs = max(divisors)
    q, scales, _err = quantize_q80(dense, gs)
    from nano_tpu.ops.qmatmul import Q80Tensor, MIN_GROUPED_GS
    t8 = Q80Tensor.from_numpy(q.reshape(out_dim, in_dim), scales, gs)
    return t8.to_grouped() if gs >= MIN_GROUPED_GS else t8


def _attach_clf_dequant(params: Dict[str, Any], bm: "BinModel",
                        clf_dequant: str) -> None:
    """Dequantize the LM-head matrix at LOAD time.

    Measured at Qwen3-0.6B scale (PERF.md): per-step dequantization of a
    152k x 1024 classifier dominates quantized decode (108 -> 232 tok/s
    when hoisted).  "f32" keeps the values bit-identical to the fused
    path (same dequant math, same f32-HIGHEST dot); "none" restores the
    fully-fused behavior (minimum HBM); "bf16" halves the table at ~1%
    logits drift.  Costs V x E x 4 (or x2) bytes of HBM.
    """
    import jax.numpy as jnp
    if clf_dequant == "none":
        return
    dtype = jnp.float32 if clf_dequant == "f32" else jnp.bfloat16
    src = bm.params.get("output")          # ours (E, V) when untied
    if src is not None:
        params["output_deq"] = jnp.asarray(np.ascontiguousarray(src), dtype)
        return
    emb = bm.params.get("tok_embeddings")  # tied head: (V, E) dense
    if emb is None:
        # dense=False read: rebuild the table from the quantized copy,
        # value-identical to what the dense reader would have produced
        qt = bm.qparams.get("tok_embeddings") if bm.qparams else None
        if qt is None:
            raise ValueError(
                "clf_dequant needs the dense embedding for a tied head; "
                "re-read the file with dense=True or pass "
                "clf_dequant='none'")
        if hasattr(qt, "dequantize"):      # Q4K frame
            emb = np.asarray(qt.dequantize(), np.float32)
        else:                              # Q80 qt: same affine as dense
            V, E = qt.q.shape
            gs = bm.header.group_size
            emb = (qt.q.astype(np.float32).reshape(V, E // gs, gs)
                   * qt.scale.reshape(V, E // gs)[..., None]).reshape(V, E)
    params["output_deq"] = jnp.asarray(
        np.ascontiguousarray(np.asarray(emb, np.float32).T), dtype)


def repack(in_path: str, out_path: str, quant: str = "q4k",
           group_size: int = 128) -> None:
    """Re-quantize an existing .bin into another quant type (the
    reference ships this as a C tool for Q4K, infer/tools/export_q4k.c).

    RoPE tables are copied verbatim so re-exports stay bit-identical with
    what the source file's engine computes.
    """
    bm = read_model(in_path)
    tok = bm.tokenizer_config
    if isinstance(tok, dict) and tok.get("type") == "bpe":
        tok = tok["tokenizer"]
    write_model(out_path, bm.params, bm.config, tok, quant=quant,
                group_size=group_size, model_type=bm.header.model_type,
                rope_tables=(bm.rope_cos, bm.rope_sin))


# =====================================================================
# LoRA files (reference: export.py:119-224, infer/infer.c:413-499)
# =====================================================================

def write_lora(path: str, lora: Dict[str, Any], cfg: ModelConfig,
               rank: int, alpha: int) -> None:
    """LoRA .bin: 256-B header (type 10) + fp32 A/B matrices.

    File order: wq_a[L], wq_b[L], wk_a[L], wk_b[L], wv_a[L], wv_b[L],
    wo_a[L], wo_b[L]; each matrix stored (out, in) row-major.
    """
    with open(path, "wb") as f:
        buf = io.BytesIO()
        buf.write(struct.pack("<II", MAGIC_0, MAGIC_1))
        buf.write(struct.pack("<ii", *VERSION))
        buf.write(struct.pack("<ii", MODEL_TYPE_LORA, 32))
        buf.write(struct.pack("<8i", rank, alpha, cfg.n_layer, cfg.n_embd,
                              cfg.n_head, cfg.n_kv_head, cfg.n_hidden, 0))
        raw = buf.getvalue()
        f.write(raw + b"\0" * (HEADER_BYTES - len(raw)))
        for name in ("wq", "wk", "wv", "wo"):
            for suffix in ("_a", "_b"):
                stacked = np.asarray(lora[name + suffix], np.float32)  # (L, in, out)
                for l in range(stacked.shape[0]):
                    f.write(np.ascontiguousarray(stacked[l].T).astype("<f4").tobytes())


@dataclass
class BinLora:
    rank: int
    alpha: int
    lora: Dict[str, Any]   # our stacked (L, in, out) layout


def read_lora(path: str, cfg: ModelConfig) -> BinLora:
    with open(path, "rb") as f:
        data = f.read()
    hdr0, hdr1 = struct.unpack_from("<II", data, 0)
    if (hdr0, hdr1) != (MAGIC_0, MAGIC_1):
        raise ValueError("not a BD4SURLM .bin file")
    model_type, _ = struct.unpack_from("<ii", data, 16)
    if model_type != MODEL_TYPE_LORA:
        raise ValueError("not a LoRA .bin file")
    rank, alpha, n_layer, n_embd, n_head, n_kv_head, n_hidden, _res = \
        struct.unpack_from("<8i", data, 24)
    assert (n_layer, n_embd, n_head, n_kv_head, n_hidden) == (
        cfg.n_layer, cfg.n_embd, cfg.n_head, cfg.n_kv_head, cfg.n_hidden), \
        "LoRA file does not match base model config"

    r = _Reader(data, HEADER_BYTES)
    L, E = cfg.n_layer, cfg.n_embd
    H, KV, D = cfg.n_head, cfg.n_kv_head, cfg.head_dim

    def read_stack(out_dim, in_dim):
        return np.stack([
            np.ascontiguousarray(r.f32(out_dim * in_dim)
                                 .reshape(out_dim, in_dim).T)
            for _ in range(L)])

    lora = {
        "wq_a": read_stack(rank, E), "wq_b": read_stack(H * D, rank),
        "wk_a": read_stack(rank, E), "wk_b": read_stack(KV * D, rank),
        "wv_a": read_stack(rank, E), "wv_b": read_stack(KV * D, rank),
        "wo_a": read_stack(rank, H * D), "wo_b": read_stack(E, rank),
    }
    return BinLora(rank=rank, alpha=alpha, lora=lora)
