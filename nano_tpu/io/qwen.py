"""HuggingFace Qwen2.5 / Qwen3 -> .bin converter.

Capability parity with the reference converter (reference:
infer/tools/export_qwen.py:639-750): reads a HF checkpoint directory
(config.json + *.safetensors + tokenizer.json), maps weights into the
.bin layout (no rotary permute — Qwen3 uses half-split RoPE natively,
the commented-out permute_reverse at export_qwen.py:674-695 is Qwen2
legacy), serializes the BPE vocab with merge-rank scores, and writes
model_type 2/3 files in F32 or Q80.
"""

from __future__ import annotations

import json
import os
from glob import glob
from typing import Any, Dict, Optional

import numpy as np

from nano_tpu.config import ModelConfig
from nano_tpu.io import binfmt
from nano_tpu.tokenizer.bpe import BpeTokenizer


def _load_safetensors(hf_dir: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    tensors: Dict[str, np.ndarray] = {}
    files = sorted(glob(os.path.join(hf_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors in {hf_dir}")
    for path in files:
        with safe_open(path, framework="numpy") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)
    return tensors


def _to_f32(x: np.ndarray) -> np.ndarray:
    if x.dtype == np.uint16:  # bfloat16 stored raw
        return (x.astype(np.uint32) << 16).view(np.float32)
    try:
        return np.asarray(x, np.float32)
    except TypeError:
        import torch
        return torch.from_numpy(x).float().numpy()


def rope_permute_reverse(w: np.ndarray, n_heads: int, head_dim: int
                         ) -> np.ndarray:
    """HF rotate-half row layout -> interleaved-pair layout
    (reference: infer/tools/export_qwen.py permute_reverse): within
    each head, rotation pair (i, i + D/2) moves to rows (2i, 2i+1).
    Qwen2 files use the interleaved engine path; Qwen3 keeps the HF
    layout (the engines apply half-split RoPE for it).  Shared by the
    HF-safetensors and GGUF importers (GGUF keeps the HF layout too —
    llama.cpp applies NEOX rope for qwen archs)."""
    D = head_dim
    out = w.reshape(n_heads, D, *w.shape[1:])
    idx = np.empty(D, np.int64)
    idx[0::2] = np.arange(D // 2)
    idx[1::2] = np.arange(D // 2) + D // 2
    return out[:, idx].reshape(w.shape)


def load_hf_qwen(hf_dir: str, max_seq_len: Optional[int] = None
                 ) -> tuple[ModelConfig, Dict[str, Any], int]:
    """-> (ModelConfig, params pytree in our layout, model_type)."""
    with open(os.path.join(hf_dir, "config.json"), "r") as f:
        hc = json.load(f)
    arch = hc.get("model_type", "qwen3")
    if not arch.startswith("qwen"):
        raise ValueError(
            f"unsupported HF model_type {arch!r}: the .bin format maps "
            "Qwen2/Qwen3 dense checkpoints only (a non-qwen model would "
            "fail later with a bare missing-weight KeyError, or worse, "
            "export a structurally wrong file)")
    model_type = (binfmt.MODEL_TYPE_QWEN3 if arch.startswith("qwen3")
                  else binfmt.MODEL_TYPE_QWEN2)

    block_size = hc["max_position_embeddings"]
    if max_seq_len:
        block_size = min(block_size, max_seq_len)
    cfg = ModelConfig(
        block_size=block_size,
        vocab_size=hc["vocab_size"],
        n_layer=hc["num_hidden_layers"],
        n_embd=hc["hidden_size"],
        n_head=hc["num_attention_heads"],
        n_kv_head=hc["num_key_value_heads"],
        n_hidden=hc["intermediate_size"],
        norm_eps=hc.get("rms_norm_eps", 1e-6),
        rope_theta=hc.get("rope_theta", 1e6),
        head_dim=hc.get("head_dim"),
        use_qk_norm=(model_type == binfmt.MODEL_TYPE_QWEN3),
        qkv_bias=(model_type == binfmt.MODEL_TYPE_QWEN2),
        rope_style=("half" if model_type == binfmt.MODEL_TYPE_QWEN3
                    else "interleaved"),
        tie_embeddings=hc.get("tie_word_embeddings", False),
    )

    t = _load_safetensors(hf_dir)

    def get(name):
        key = name if name in t else "model." + name
        return _to_f32(t[key])

    L = cfg.n_layer
    D = cfg.head_dim

    def permute_reverse(w, n_heads):
        return rope_permute_reverse(w, n_heads, D)

    qwen2 = model_type == binfmt.MODEL_TYPE_QWEN2

    def stack_T(fmt, permute_heads: int = 0):
        mats = []
        for l in range(L):
            w = get(fmt.format(l))
            if permute_heads:
                w = permute_reverse(w, permute_heads)
            mats.append(np.ascontiguousarray(w.T))
        return np.stack(mats)

    def stack(fmt, permute_heads: int = 0):
        vs = []
        for l in range(L):
            v = get(fmt.format(l))
            if permute_heads:
                v = permute_reverse(v, permute_heads)
            vs.append(v)
        return np.stack(vs)

    blocks: Dict[str, Any] = {
        "attn_norm": stack("layers.{}.input_layernorm.weight"),
        "ffn_norm": stack("layers.{}.post_attention_layernorm.weight"),
        "wq": stack_T("layers.{}.self_attn.q_proj.weight",
                      cfg.n_head if qwen2 else 0),
        "wk": stack_T("layers.{}.self_attn.k_proj.weight",
                      cfg.n_kv_head if qwen2 else 0),
        "wv": stack_T("layers.{}.self_attn.v_proj.weight"),
        "wo": stack_T("layers.{}.self_attn.o_proj.weight"),
        "w1": stack_T("layers.{}.mlp.gate_proj.weight"),
        "w2": stack_T("layers.{}.mlp.down_proj.weight"),
        "w3": stack_T("layers.{}.mlp.up_proj.weight"),
    }
    if model_type == binfmt.MODEL_TYPE_QWEN3:
        blocks["q_norm"] = stack("layers.{}.self_attn.q_norm.weight")
        blocks["k_norm"] = stack("layers.{}.self_attn.k_norm.weight")
    else:
        blocks["bq"] = stack("layers.{}.self_attn.q_proj.bias", cfg.n_head)
        blocks["bk"] = stack("layers.{}.self_attn.k_proj.bias",
                             cfg.n_kv_head)
        blocks["bv"] = stack("layers.{}.self_attn.v_proj.bias")

    params: Dict[str, Any] = {
        "tok_embeddings": get("embed_tokens.weight"),
        "norm": get("norm.weight"),
        "blocks": blocks,
    }
    if not cfg.tie_embeddings:
        lm = t.get("lm_head.weight")
        if lm is None:
            lm = get("embed_tokens.weight")
        params["output"] = np.ascontiguousarray(_to_f32(lm).T)
    return cfg, params, model_type


def convert_hf_qwen(hf_dir: str, out_path: str, quant: str = "f32",
                    group_size: int = 256,
                    max_seq_len: Optional[int] = None) -> ModelConfig:
    """HF checkpoint dir -> self-contained .bin.

    Default Q80 group 256 unlocks the int8-MXU decode path
    (ops/qmatmul.py MIN_GROUPED_GS); the reference's own Qwen exporter
    uses 64 (export_qwen.py --gs) — pass group_size=64 to byte-match its
    output."""
    cfg, params, model_type = load_hf_qwen(hf_dir, max_seq_len)
    tok_path = os.path.join(hf_dir, "tokenizer.json")
    tokenizer = BpeTokenizer.from_hf_tokenizer_json(tok_path, cfg.vocab_size)
    binfmt.write_model(out_path, params, cfg, tokenizer, quant=quant,
                       group_size=group_size, model_type=model_type)
    return cfg
