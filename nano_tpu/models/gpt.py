"""Nano GPT — Llama-2-style decoder-only Transformer, TPU-native.

Capability parity with the reference model (reference: model.py:325-503):
RMSNorm + RoPE (interleaved real-pair) + GQA + SwiGLU + weight tying,
optional learned positional embeddings (use_rope=False), optional global
(non-causal) attention, per-token SFT loss mask, LoRA adapters on
wq/wk/wv/wo.

Architecture is idiomatic JAX, not a translation:
  * Layer parameters are STACKED along a leading (n_layer,) axis and the
    forward pass is a single `lax.scan` over layers — one compiled block
    body regardless of depth, fast compile, XLA-schedulable.
  * GQA is computed by einsum over grouped heads — KV heads are never
    materialized n_rep times (the reference expands them via repeat_kv,
    model.py:133-142).
  * Attention softmax and RMSNorm run in fp32, matmuls in the configured
    compute dtype (bf16 on TPU) feeding the MXU.
  * The KV cache is a static-shape pytree updated with dynamic_update_slice
    — no dynamic shapes anywhere, so prefill/decode jit once.

Loss-mask note: the reference applies its SFT mask to an already
mean-reduced scalar (model.py:400-408), making the mask a no-op.  We
implement the documented intent: per-token CE, masked, normalized by the
mask sum.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from nano_tpu.config import ModelConfig
from nano_tpu import observe
from nano_tpu.observe import Phase
from nano_tpu.ops.qmatmul import Q80Tensor, q80_matmul
from nano_tpu.ops.q4k import Q4KTensor, q4k_matmul

Params = Dict[str, Any]


# =====================================================================
# RoPE — interleaved real-pair form (reference: model.py:88-130)
# =====================================================================

def precompute_rope(head_dim: int, end: int, theta: float = 10000.0
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables of shape (end, head_dim // 2), fp32."""
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(end, dtype=jnp.float32)
    angles = jnp.outer(t, freqs)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               style: str = "interleaved") -> jnp.ndarray:
    """Rotate (..., S, H, D) by position tables (S, D//2).

    interleaved: (x[2i], x[2i+1]) pairs (Nano/Qwen2 layout, so exported
    weights are interchangeable with the reference engine).
    half: (x[i], x[i+D/2]) pairs (Qwen3/HF rotate_half layout).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # cos/sin: (S, D/2) -> broadcast over batch and heads: (S, 1, D/2).
    # Higher-rank tables (already broadcast-shaped, e.g. per-slot decode
    # positions in continuous batching) pass through unchanged.
    if cos.ndim == 2:
        cos = cos[:, None, :]
        sin = sin[:, None, :]
    if style == "interleaved":
        xr = xf[..., 0::2]
        xi = xf[..., 1::2]
        or_ = xr * cos - xi * sin
        oi_ = xr * sin + xi * cos
        out = jnp.stack([or_, oi_], axis=-1).reshape(x.shape)
    elif style == "half":
        D = x.shape[-1]
        x1 = xf[..., :D // 2]
        x2 = xf[..., D // 2:]
        out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                              axis=-1)
    else:
        raise ValueError(f"unknown rope style {style}")
    return out.astype(dtype)


# =====================================================================
# Primitive layers (functional)
# =====================================================================

def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """x * rsqrt(mean(x^2)+eps) * w, computed in fp32 (reference: model.py:164-175)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)


def _prec(dtype):
    """Matmul precision for the compute dtype: f32 mode is the VALUE
    ORACLE (cross-engine parity vs the f32 C engines), so its dots must
    run true f32 — the TPU's DEFAULT precision computes f32 matmuls in
    bf16 passes, which flips near-tie argmaxes on small models (observed
    runbook r4d verify stage: token-1 divergence on a tiny random
    model).  bf16 mode keeps the fast default."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)


def _dense(x: jnp.ndarray, w, dtype) -> jnp.ndarray:
    """x @ w with both operands cast to the compute dtype (MXU-friendly).

    Dense weights are stored (in, out); quantized weights (Q80Tensor) keep
    the file's (out, in) layout and dispatch to the fused dequant matmul.
    """
    if isinstance(w, Q80Tensor):
        return q80_matmul(x, w, dtype)
    if isinstance(w, Q4KTensor):
        return q4k_matmul(x, w, dtype)
    return jnp.dot(x.astype(dtype), w.astype(dtype),
                   preferred_element_type=dtype, precision=_prec(dtype))


def embed_tokens(params: Params, idx: jnp.ndarray, dtype) -> jnp.ndarray:
    """Embedding row gather; quantized tables dequantize the gathered rows
    (the C engine keeps an fp32 shadow copy, infer/infer.c:126-127 — we
    dequantize on the fly, same values)."""
    w = params["tok_embeddings"]
    if isinstance(w, Q80Tensor):
        assert w.layout == "rows", \
            "embedding gather needs rows layout (grouped q is (G,out,gs))"
        g = w.group_size
        q = w.q[idx]                        # (..., E) int8
        s = w.scales[idx]                   # (..., E // g)
        shape = q.shape
        deq = (q.astype(jnp.float32).reshape(*shape[:-1], shape[-1] // g, g)
               * s[..., None]).reshape(shape)
        return deq.astype(dtype)
    if isinstance(w, Q4KTensor):
        return w.dequantize_rows(idx, dtype)
    return w[idx].astype(dtype)


def compute_logits(h: jnp.ndarray, params: Params, dtype) -> jnp.ndarray:
    """LM head: untied uses params['output'] (in, out); tied uses the
    embedding table (V, E) transposed (reference: model.py:348)."""
    w = params.get("output_q")
    if w is not None:
        # int8-MXU head (binfmt._maybe_int8_layout).  A Q80 head
        # quantizes the activation internally with the C engine's exact
        # semantics; a head REQUANTIZED from a Q4K table still needs the
        # C engine's Q4K activation treatment first, or logits drift
        # ~1e-2 off both C engines (see CLAUDE.md)
        if isinstance(params["tok_embeddings"], Q4KTensor) and \
                isinstance(w, Q80Tensor):
            from nano_tpu.ops.q4k import fake_quant_act
            h = fake_quant_act(h)
        return _dense(h, w, jnp.float32)
    w = params.get("output_deq")
    if w is not None:
        # classifier dequantized at load (see binfmt._attach_clf_dequant):
        # f32 table -> same values as the fused dequant dot, 2-3x faster
        # at large vocab.  Q4K semantics ALSO quantize the activation
        # before the LM head (reference: infer/infer.c:1012-1014) — keep
        # that even though the weight side is pre-dequantized, or logits
        # drift ~1e-2 off both C engines.
        if isinstance(params["tok_embeddings"], Q4KTensor):
            from nano_tpu.ops.q4k import fake_quant_act
            h = fake_quant_act(h)
        if w.dtype == jnp.float32:
            return jnp.dot(h.astype(jnp.float32), w,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        return jnp.dot(h.astype(w.dtype), w,
                       preferred_element_type=jnp.float32)
    w = params.get("output")
    if w is None:
        w = params["tok_embeddings"]
        if isinstance(w, (Q80Tensor, Q4KTensor)):
            return _dense(h, w, jnp.float32)
        return jnp.dot(h, w.T.astype(dtype),
                       preferred_element_type=jnp.float32,
                       precision=_prec(dtype))
    if isinstance(w, (Q80Tensor, Q4KTensor)):
        return _dense(h, w, jnp.float32)
    return jnp.dot(h, w.astype(dtype), preferred_element_type=jnp.float32,
                   precision=_prec(dtype))


def _lora_delta(x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                scale, dtype) -> jnp.ndarray:
    """LoRA low-rank branch: (x @ A) @ B * alpha/rank (reference: model.py:145-161).

    a/b may be PER-SLOT selections (B, in, r) / (B, r, out) with a (B,)
    scale — batched multi-adapter serving (serve/batching.py gathers
    each slot's adapter from the stacked registry before the layer
    scan), every slot decoding with its own adapter in ONE dispatch.
    """
    if a.ndim == 3:
        h = jnp.einsum("bse,ber->bsr", x.astype(dtype), a.astype(dtype),
                       preferred_element_type=dtype)
        d = jnp.einsum("bsr,bro->bso", h, b.astype(dtype),
                       preferred_element_type=dtype)
        return d * jnp.asarray(scale, dtype)[:, None, None]
    h = jnp.dot(x.astype(dtype), a.astype(dtype),
                preferred_element_type=dtype, precision=_prec(dtype))
    return jnp.dot(h, b.astype(dtype), preferred_element_type=dtype,
                   precision=_prec(dtype)) * scale


# =====================================================================
# Attention
# =====================================================================

def _use_flash(cfg: ModelConfig, S: int, kv_cache) -> bool:
    """Opt-in Pallas flash-attention for full-sequence causal attention.

    Measured on the target v5e chip, XLA's fused attention BEATS the
    bundled Pallas flash kernel throughout this framework's regime
    (training step, bf16, remat): 942 vs 1347 ms/step at S=512/D=48
    (Nano-168M, batch 64), 519 vs 625 at S=512/D=128, and 971 vs 1156
    even at S=2048/D=128 — so flash stays opt-in via NANO_TPU_FLASH=1
    (useful headroom for much longer contexts or other TPU generations).
    Losses match to 4+ digits either way."""
    import os
    if os.environ.get("NANO_TPU_FLASH", "0") != "1":
        return False
    if kv_cache is not None or not cfg.is_causal:
        return False
    if jax.default_backend() == "cpu":
        return False
    return S >= 128 and S % 128 == 0


def _flash_attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  cfg: ModelConfig, dtype) -> jnp.ndarray:
    """(B, S, H|KV, D) -> (B, S, H*D) via the bundled Pallas kernel.

    KV heads are broadcast to H (the kernel wants equal head counts);
    at block_size 512 the expanded K/V are far smaller than the S x S
    score matrix the einsum path would materialize.
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa
    B, S, H, D = q.shape
    KV = k.shape[2]
    rep = H // KV
    if rep > 1:
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    qh = q.transpose(0, 2, 1, 3).astype(dtype)   # (B, H, S, D)
    kh = k.transpose(0, 2, 1, 3).astype(dtype)
    vh = v.transpose(0, 2, 1, 3).astype(dtype)
    out = fa.flash_attention(qh, kh, vh, causal=True,
                             sm_scale=1.0 / math.sqrt(D))
    return out.transpose(0, 2, 1, 3).reshape(B, S, H * D).astype(dtype)


def _gqa_scores(q: jnp.ndarray, k: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Grouped-head attention scores without expanding KV.

    q: (B, S, H, D)  k: (B, T, KV, D)  ->  (B, KV, rep, S, T) fp32
    """
    B, S, H, D = q.shape
    kv = cfg.n_kv_head
    rep = H // kv
    qg = q.reshape(B, S, kv, rep, D)
    scores = jnp.einsum("bskrd,btkd->bkrst", qg, k,
                        preferred_element_type=jnp.float32,
                        precision=_prec(k.dtype))
    return scores / math.sqrt(D)


def _gqa_out(probs: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """probs: (B, KV, rep, S, T)  v: (B, T, KV, D) -> (B, S, KV*rep*D)."""
    out = jnp.einsum("bkrst,btkd->bskrd", probs, v,
                     precision=_prec(v.dtype))
    B, S = out.shape[0], out.shape[1]
    return out.reshape(B, S, -1)


def attention(x: jnp.ndarray, layer: Params, cfg: ModelConfig,
              cos: Optional[jnp.ndarray], sin: Optional[jnp.ndarray],
              mask: Optional[jnp.ndarray], dtype,
              lora: Optional[Params] = None, lora_scale: float = 0.0,
              kv_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
              start_pos: Optional[jnp.ndarray] = None,
              layer_idx: Any = -1,
              attn_len: Optional[int] = None,
              ) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """One attention layer.  Returns (output, updated kv cache or None).

    Training: kv_cache=None, full-sequence causal (or global) attention.
    Decode:   kv_cache=(k,v) of static shape (B, max_seq, KV, D); new keys
              are written at start_pos and attention runs over the whole
              static cache with a length mask.  `attn_len` (static,
              batched decode) restricts the attended prefix to the first
              attn_len cache rows — per-burst cache-length bucketing: at
              32 slots the full-T cache read is the serving-throughput
              ceiling (PERF.md), and rows past every stream's position
              are masked zeros anyway.  The caller guarantees
              max(pos) + burst < attn_len; writes still target the full
              cache.
    """
    B, S, E = x.shape
    H, KV, D = cfg.n_head, cfg.n_kv_head, cfg.head_dim

    if "wqkv" in layer:
        # fused projection (quantized load path): one kernel launch
        qkv = _dense(x, layer["wqkv"], dtype)
        q = qkv[..., :H * D]
        k = qkv[..., H * D:(H + KV) * D]
        v = qkv[..., (H + KV) * D:]
    else:
        q = _dense(x, layer["wq"], dtype)
        k = _dense(x, layer["wk"], dtype)
        v = _dense(x, layer["wv"], dtype)
    if lora is not None:
        q = q + _lora_delta(x, lora["wq_a"], lora["wq_b"], lora_scale, dtype)
        k = k + _lora_delta(x, lora["wk_a"], lora["wk_b"], lora_scale, dtype)
        v = v + _lora_delta(x, lora["wv_a"], lora["wv_b"], lora_scale, dtype)
    if cfg.qkv_bias:
        q = q + layer["bq"].astype(dtype)
        k = k + layer["bk"].astype(dtype)
        v = v + layer["bv"].astype(dtype)

    # names feed the REMAT_POLICIES table (no-ops outside policy remat)
    q = checkpoint_name(q, "qkv")
    k = checkpoint_name(k, "qkv")
    v = checkpoint_name(v, "qkv")
    observe.tap(Phase.QKV, layer_idx, q)
    q = q.reshape(B, S, H, D)
    k = k.reshape(B, S, KV, D)
    v = v.reshape(B, S, KV, D)

    if cfg.use_qk_norm:
        # Qwen3 per-head q/k RMSNorm (reference: infer/infer.c:824-835)
        q = rms_norm(q, layer["q_norm"], cfg.norm_eps)
        k = rms_norm(k, layer["k_norm"], cfg.norm_eps)

    if cos is not None:
        q = apply_rope(q, cos, sin, cfg.rope_style)
        k = apply_rope(k, cos, sin, cfg.rope_style)
        observe.tap(Phase.ROPE, layer_idx, q)

    new_cache = None
    if kv_cache is not None:
        ck, cv, ks, vs = kv_cache
        quant = ck.dtype == jnp.int8
        if quant:
            kq, k_sc = _kv_quantize(k)
            vq, v_sc = _kv_quantize(v)
        else:
            kq, vq = k.astype(ck.dtype), v.astype(cv.dtype)
        if getattr(start_pos, "ndim", 0) == 1:
            if S == 1:
                # per-slot positions (continuous batching)
                bidx = jnp.arange(B)
                ck = ck.at[bidx, start_pos].set(kq[:, 0])
                cv = cv.at[bidx, start_pos].set(vq[:, 0])
                if quant:
                    ks = ks.at[bidx, start_pos].set(k_sc[:, 0])
                    vs = vs.at[bidx, start_pos].set(v_sc[:, 0])
            else:
                # per-slot positions, S new tokens per slot (batched
                # speculative verify): rows [pos_b, pos_b + S) per slot
                bidx = jnp.arange(B)[:, None]
                posm = start_pos[:, None] + jnp.arange(S)[None, :]
                ck = ck.at[bidx, posm].set(kq)
                cv = cv.at[bidx, posm].set(vq)
                if quant:
                    ks = ks.at[bidx, posm].set(k_sc)
                    vs = vs.at[bidx, posm].set(v_sc)
        else:
            ck = jax.lax.dynamic_update_slice(ck, kq, (0, start_pos, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, vq, (0, start_pos, 0, 0))
            if quant:
                ks = jax.lax.dynamic_update_slice(ks, k_sc,
                                                  (0, start_pos, 0))
                vs = jax.lax.dynamic_update_slice(vs, v_sc,
                                                  (0, start_pos, 0))
        new_cache = (ck, cv, ks, vs)
        # cache-length bucketing: attend only the first attn_len rows
        # (reads drop, writes above already hit the full cache)
        if attn_len is not None and attn_len < ck.shape[1]:
            ck, cv = ck[:, :attn_len], cv[:, :attn_len]
            if quant:
                ks, vs = ks[:, :attn_len], vs[:, :attn_len]
        from nano_tpu.ops import decode_attn
        if S == 1 and decode_attn.supported(
                ck.shape[1], D, H // KV,
                jax.default_backend() == "tpu"):
            # fused Pallas decode attention: one launch replaces the
            # ~8-op einsum/softmax chain (decode is per-op-latency-bound;
            # int8-KV scales fold in, GQA stays grouped)
            posv = (start_pos if getattr(start_pos, "ndim", 0) == 1
                    else jnp.full((B,), start_pos, jnp.int32))
            heads = decode_attn.decode_attention(
                q[:, 0], ck, cv,
                ks if quant else None, vs if quant else None,
                posv, KV, H // KV)[:, None, :].astype(dtype)
            observe.tap(Phase.ATTENTION, layer_idx, heads)
            out = _dense(heads, layer["wo"], dtype)
            if lora is not None:
                out = out + _lora_delta(heads, lora["wo_a"], lora["wo_b"],
                                        lora_scale, dtype)
            observe.tap(Phase.ATTN_OUT, layer_idx, out)
            return out, new_cache
        if quant:
            # int8 KV: fold the per-vector scales into scores/probs
            # instead of materializing a dequantized cache copy per
            # layer — q·(k·s) == (q·k)·s per position, so the einsum
            # reads the int8 cache directly (cast fused into the dot)
            scores = _gqa_scores(q, ck.astype(dtype), cfg)
            scores = scores * ks.transpose(0, 2, 1)[:, :, None, None, :]
            if mask is not None:
                scores = scores + mask
            probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
            probs = probs * vs.transpose(0, 2, 1)[:, :, None, None, :
                                                  ].astype(dtype)
            heads = _gqa_out(probs, cv.astype(dtype))
            observe.tap(Phase.ATTENTION, layer_idx, heads)
            out = _dense(heads, layer["wo"], dtype)
            if lora is not None:
                out = out + _lora_delta(heads, lora["wo_a"], lora["wo_b"],
                                        lora_scale, dtype)
            observe.tap(Phase.ATTN_OUT, layer_idx, out)
            return out, new_cache
        k, v = ck.astype(dtype), cv.astype(dtype)

    if kv_cache is None and _use_flash(cfg, S, kv_cache):
        heads = _flash_attend(q, k, v, cfg, dtype)
    else:
        scores = _gqa_scores(q, k, cfg)                   # fp32
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        heads = _gqa_out(probs, v)
    heads = checkpoint_name(heads, "attn_heads")
    observe.tap(Phase.ATTENTION, layer_idx, heads)

    out = _dense(heads, layer["wo"], dtype)
    if lora is not None:
        # reference applies LoRA to the wo input (the concatenated heads)
        out = out + _lora_delta(heads, lora["wo_a"], lora["wo_b"], lora_scale, dtype)
    out = checkpoint_name(out, "attn_out")
    observe.tap(Phase.ATTN_OUT, layer_idx, out)
    return out, new_cache


def feed_forward(x: jnp.ndarray, layer: Params, dtype) -> jnp.ndarray:
    """SwiGLU: w2(silu(w1 x) * w3 x) (reference: model.py:292-307)."""
    if "w13" in layer:
        h13 = checkpoint_name(_dense(x, layer["w13"], dtype), "ffn_w13")
        F = h13.shape[-1] // 2
        h1, h3 = h13[..., :F], h13[..., F:]
    else:
        h1 = checkpoint_name(_dense(x, layer["w1"], dtype), "ffn_w13")
        h3 = checkpoint_name(_dense(x, layer["w3"], dtype), "ffn_w13")
    return checkpoint_name(
        _dense(jax.nn.silu(h1) * h3, layer["w2"], dtype), "ffn_out")


def block(x: jnp.ndarray, layer: Params, cfg: ModelConfig,
          cos, sin, mask, dtype,
          lora: Optional[Params] = None, lora_scale: float = 0.0,
          kv_cache=None, start_pos=None, layer_idx: Any = -1,
          attn_len: Optional[int] = None):
    """Pre-norm residual block (reference: model.py:310-322)."""
    xn = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
    observe.tap(Phase.ATTN_NORM, layer_idx, xn)
    a, new_cache = attention(
        xn, layer, cfg,
        cos, sin, mask, dtype, lora, lora_scale, kv_cache, start_pos,
        layer_idx, attn_len)
    h = x + a
    hn = rms_norm(h, layer["ffn_norm"], cfg.norm_eps)
    observe.tap(Phase.FFN_NORM, layer_idx, hn)
    f = feed_forward(hn, layer, dtype)
    observe.tap(Phase.FFN, layer_idx, f)
    out = h + f
    observe.tap(Phase.RESIDUAL, layer_idx, out)
    return out, new_cache


# =====================================================================
# Full model
# =====================================================================

def _causal_mask(S: int) -> jnp.ndarray:
    """(S, S) additive mask, -inf above the diagonal."""
    i = jnp.arange(S)[:, None]
    j = jnp.arange(S)[None, :]
    return jnp.where(j <= i, 0.0, -jnp.inf).astype(jnp.float32)


def forward_hidden(params: Params, idx: jnp.ndarray, cfg: ModelConfig,
                   dtype=jnp.bfloat16,
                   lora: Optional[Params] = None, lora_scale: float = 0.0,
                   remat: bool = False) -> jnp.ndarray:
    """Full-sequence forward -> final-norm hidden states (B, S, E).

    Scans over stacked layer params; with `remat` the block body is
    rematerialized in backward to trade FLOPs for HBM.  `remat` may be
    a policy name from REMAT_POLICIES ("dots", "ffn", "heads") selecting
    which intermediates survive to backward (see the table there).
    """
    B, S = idx.shape
    h = embed_tokens(params, idx, dtype)
    observe.tap(Phase.EMBEDDING, -1, h)

    if cfg.use_rope:
        cos, sin = precompute_rope(cfg.head_dim, S, cfg.rope_theta)
    else:
        cos = sin = None
        h = h + params["wpe"][:S].astype(dtype)

    mask = _causal_mask(S) if cfg.is_causal else None

    def body(carry, xs):
        layer, lora_layer, li = xs
        out, _ = block(carry, layer, cfg, cos, sin, mask, dtype,
                       lora_layer, lora_scale, layer_idx=li)
        # observation-summary rows must exit the scan through its ys
        # (zero-size when no observer is attached — costless)
        return out, observe.collect_rows()

    if remat:
        # remat="dots" saves non-batch matmul outputs and recomputes only
        # attention: measured +14% on v5e (39.6k vs 34.8k tokens/s,
        # Nano-168M batch 64 bf16) but needs ~3 GB more HBM than full
        # remat — it OOMs a 16 GB chip once Adam state is resident, so
        # full remat stays the default.  The named policies below pick
        # intermediate memory/recompute points (see REMAT_POLICIES).
        policy = REMAT_POLICIES.get(remat) if isinstance(remat, str) else None
        if policy is not None:
            body = jax.checkpoint(body, policy=policy())
        else:
            body = jax.checkpoint(body)

    h, obs_rows = jax.lax.scan(body, h,
                               (params["blocks"], lora,
                                jnp.arange(cfg.n_layer)))
    observe.push_rows(obs_rows)

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    observe.tap(Phase.FINAL_NORM, -1, h)
    return h


# Remat policies for the training layer scan, keyed by TrainConfig's
# remat_policy.  Memory/recompute trade-off per 24-layer Nano-168M step
# at batch 64 (bf16 activations, 32k tokens):
#   full    save only the residual carry; recompute the whole block
#   "heads" also save the attention context ('attn_heads') — skips the
#           score/prob einsum recompute (the only batched-dims dots)
#   "ffn"   save every projection output EXCEPT the 2F-wide w13
#           intermediate — backward recomputes only the widest matmul
#   "dots"  save all non-batch matmul outputs (jax builtin policy)
REMAT_POLICIES = {
    "dots": lambda: jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    "ffn": lambda: jax.checkpoint_policies.save_any_names_but_these(
        "ffn_w13"),
    "heads": lambda: jax.checkpoint_policies.save_only_these_names(
        "attn_heads"),
}


def forward(params: Params, idx: jnp.ndarray, cfg: ModelConfig,
            dtype=jnp.bfloat16,
            lora: Optional[Params] = None, lora_scale: float = 0.0,
            remat: bool = False) -> jnp.ndarray:
    """Full-sequence forward -> logits (B, S, V).  Training / prefill path."""
    h = forward_hidden(params, idx, cfg, dtype, lora, lora_scale, remat)
    logits = compute_logits(h, params, dtype)
    observe.tap(Phase.LOGITS, -1, logits)
    return logits


def loss_fn(params: Params, idx: jnp.ndarray, targets: jnp.ndarray,
            loss_mask: Optional[jnp.ndarray], cfg: ModelConfig,
            dtype=jnp.bfloat16, lora: Optional[Params] = None,
            lora_scale: float = 0.0, remat: bool = False,
            ce_chunk: int = 0) -> jnp.ndarray:
    """Per-token CE, optionally masked and normalized by mask sum.

    ``ce_chunk`` > 0 computes the cross-entropy in token chunks of that
    size without ever materializing the full (B*S, V) logits: at the
    Nano-168M training shape (32k tokens x 16k vocab) the one-shot
    logits + log_softmax + backward d(logits) cost ~6 GB of peak HBM on
    a 16 GB chip — the difference between the fast "dots" remat policy
    fitting or OOMing.  Each chunk's logits are rematerialized in
    backward (jax.checkpoint over the chunk body); values match the
    unchunked loss up to f32 summation order.
    """
    if ce_chunk and ce_chunk > 0:
        h = forward_hidden(params, idx, cfg, dtype, lora, lora_scale,
                           remat)
        return _chunked_ce(h, params, targets, loss_mask, dtype, ce_chunk)
    logits = forward(params, idx, cfg, dtype, lora, lora_scale, remat)
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if loss_mask is None:
        return jnp.mean(nll)
    m = loss_mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def _chunked_ce_sums(h: jnp.ndarray, params: Params, targets: jnp.ndarray,
                     loss_mask: Optional[jnp.ndarray], dtype,
                     ce_chunk: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan the LM head + CE over token chunks -> (nll_sum, mask_sum).

    Peak memory per chunk is (ce_chunk, V) instead of (B*S, V); the
    checkpointed body makes backward recompute each chunk's logits, so
    only the (B*S, E) hidden states persist across the loss.  The raw
    sums let callers pick their own normalization (the pipeline loss
    psums them across the mesh before dividing).
    """
    B, S, E = h.shape
    N = B * S
    m = (jnp.ones((B, S), jnp.float32) if loss_mask is None
         else loss_mask.astype(jnp.float32))
    n_chunks = -(-N // ce_chunk)
    pad = n_chunks * ce_chunk - N
    hf = jnp.pad(h.reshape(N, E), ((0, pad), (0, 0)))
    tf = jnp.pad(targets.reshape(N), (0, pad))
    mf = jnp.pad(m.reshape(N), (0, pad))        # pad rows weigh 0

    hc = hf.reshape(n_chunks, ce_chunk, E)
    tc = tf.reshape(n_chunks, ce_chunk)
    mc = mf.reshape(n_chunks, ce_chunk)

    @jax.checkpoint
    def body(acc, xs):
        h_c, t_c, m_c = xs
        logits = compute_logits(h_c, params, dtype).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, t_c[:, None], axis=-1)[:, 0]
        return acc + jnp.sum(nll * m_c), ()

    total, _ = jax.lax.scan(body, jnp.float32(0.0), (hc, tc, mc))
    return total, jnp.sum(m)


def _chunked_ce(h: jnp.ndarray, params: Params, targets: jnp.ndarray,
                loss_mask: Optional[jnp.ndarray], dtype,
                ce_chunk: int) -> jnp.ndarray:
    total, msum = _chunked_ce_sums(h, params, targets, loss_mask, dtype,
                                   ce_chunk)
    if loss_mask is None:
        return total / (h.shape[0] * h.shape[1])
    return total / jnp.maximum(msum, 1.0)


# =====================================================================
# Decode-path forward (KV cache) — used by the inference engine
# =====================================================================

class KVCache(NamedTuple):
    """Static-shape KV cache, stacked over layers: (L, B, T, KV, D).

    dtype=jnp.int8 stores per-(position, head) symmetrically quantized
    vectors with f32 scales (L, B, T, KV) — half the HBM of bf16 for
    long-context serving (cf. int8 KV-cache literature, PAPERS.md);
    quantize-on-write / dequantize-on-read happens inside attention().
    """
    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None   # f32 (L, B, T, KV) when int8
    v_scale: Optional[jnp.ndarray] = None

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_seq: int,
               dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.n_layer, batch, max_seq, cfg.n_kv_head, cfg.head_dim)
        if dtype == jnp.int8:
            sshape = shape[:-1]
            return cls(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       k_scale=jnp.zeros(sshape, jnp.float32),
                       v_scale=jnp.zeros(sshape, jnp.float32))
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]


def _kv_quantize(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., D) -> int8 values + f32 per-vector scale."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = absmax / 127.0
    safe = jnp.where(scale == 0.0, 1.0, scale)
    q = jnp.round(x.astype(jnp.float32) / safe[..., None]).astype(jnp.int8)
    return q, scale


def forward_with_cache(params: Params, idx: jnp.ndarray, cache: KVCache,
                       start_pos: jnp.ndarray, cfg: ModelConfig,
                       dtype=jnp.bfloat16,
                       lora: Optional[Params] = None, lora_scale: float = 0.0,
                       attn_len: Optional[int] = None,
                       last_idx: Optional[jnp.ndarray] = None,
                       ) -> Tuple[jnp.ndarray, KVCache]:
    """Forward S new tokens at absolute position start_pos using the cache.

    idx: (B, S) — S is static (prefill chunk or 1 for decode).
    Returns logits (B, S, V) and the updated cache.  Positions >=
    start_pos+S are masked out, so stale cache contents are harmless.
    `attn_len` (static) attends only the first attn_len cache rows —
    cache-length bucketing for the single-stream decode scan; the caller
    guarantees start_pos + S <= attn_len.

    `last_idx` (traced int32): compute the LM head for ONLY that
    sequence position and return logits (B, 1, V).  Prefill callers all
    sample from the last prompt position; the full-width head is pure
    waste there — at the 0.6B shape a 64-token padded prompt pays a
    64x152k logits block plus (on the int8 path) ~150 MB of int32 group
    partials.  Traced (not static) so programs stay keyed on the pad
    bucket, not the prompt length.  The selected row's values are
    identical math (norm and head are per-row).
    """
    B, S = idx.shape
    T = cache.max_seq
    Ta = attn_len if attn_len is not None else T
    h = embed_tokens(params, idx, dtype)

    if cfg.use_rope:
        cos_t, sin_t = precompute_rope(cfg.head_dim, T, cfg.rope_theta)
        cos = jax.lax.dynamic_slice_in_dim(cos_t, start_pos, S, axis=0)
        sin = jax.lax.dynamic_slice_in_dim(sin_t, start_pos, S, axis=0)
    else:
        cos = sin = None
        wpe = params["wpe"]
        h = h + jax.lax.dynamic_slice_in_dim(wpe, start_pos, S, axis=0).astype(dtype)

    # mask over the static cache: query i (absolute pos start_pos+i) may see
    # cache keys j <= start_pos+i (causal) or j < start_pos+S (global).
    j = jnp.arange(Ta)[None, :]
    if cfg.is_causal:
        qpos = start_pos + jnp.arange(S)[:, None]
        mask = jnp.where(j <= qpos, 0.0, -jnp.inf).astype(jnp.float32)
    else:
        mask = jnp.where(j < start_pos + S, 0.0, -jnp.inf).astype(jnp.float32)
        mask = jnp.broadcast_to(mask, (S, Ta))

    observe.tap(Phase.EMBEDDING, -1, h)

    def body(carry, xs):
        layer, lora_layer, kvc, li = xs
        out, new_kv = block(carry, layer, cfg, cos, sin, mask, dtype,
                            lora_layer, lora_scale,
                            kv_cache=kvc, start_pos=start_pos,
                            layer_idx=li, attn_len=attn_len)
        return out, (new_kv, observe.collect_rows())

    # NOTE: scan over layers measured FASTER than unrolling (1090 vs
    # ~1000 tok/s batch-1 decode at 24L) — keep the scan.
    h, ((new_k, new_v, new_ks, new_vs), obs_rows) = jax.lax.scan(
        body, h, (params["blocks"], lora,
                  (cache.k, cache.v, cache.k_scale, cache.v_scale),
                  jnp.arange(cfg.n_layer)))
    observe.push_rows(obs_rows)

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    observe.tap(Phase.FINAL_NORM, -1, h)
    if last_idx is not None:
        h = jax.lax.dynamic_slice_in_dim(h, last_idx, 1, axis=1)
    logits = compute_logits(h, params, dtype)
    observe.tap(Phase.LOGITS, -1, logits)
    return logits, KVCache(k=new_k, v=new_v, k_scale=new_ks,
                           v_scale=new_vs)


def forward_decode_batched(params: Params, tok: jnp.ndarray,
                           cache: KVCache, pos: jnp.ndarray,
                           cfg: ModelConfig, dtype=jnp.bfloat16,
                           lora: Optional[Params] = None,
                           lora_scale: float = 0.0,
                           attn_len: Optional[int] = None,
                           ) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step with PER-SLOT positions — the continuous-batching
    primitive: slot b holds an independent stream at position pos[b].

    tok: (B,) current token per slot; pos: (B,) absolute positions.
    Returns logits (B, V) and the updated cache.  Inactive slots simply
    compute garbage that the caller ignores — shapes stay static.
    `attn_len` (static) bounds the attended cache prefix; the caller must
    guarantee every ACTIVE slot's pos < attn_len (serve/batching.py picks
    the bucket per burst).
    """
    B = tok.shape[0]
    T = cache.max_seq
    Ta = attn_len if attn_len is not None else T
    h = embed_tokens(params, tok[:, None], dtype)         # (B, 1, E)

    if cfg.use_rope:
        cos_t, sin_t = precompute_rope(cfg.head_dim, T, cfg.rope_theta)
        cos = cos_t[pos][:, None, None, :]                # (B, 1, 1, D/2)
        sin = sin_t[pos][:, None, None, :]
    else:
        cos = sin = None
        h = h + params["wpe"][pos][:, None, :].astype(dtype)

    j = jnp.arange(Ta)[None, :]
    m = jnp.where(j <= pos[:, None], 0.0, -jnp.inf).astype(jnp.float32)
    mask = m[:, None, None, None, :]                      # (B,1,1,1,Ta)

    def body(carry, xs):
        layer, lora_layer, kvc, li = xs
        out, new_kv = block(carry, layer, cfg, cos, sin, mask, dtype,
                            lora_layer, lora_scale,
                            kv_cache=kvc, start_pos=pos,
                            layer_idx=li, attn_len=attn_len)
        return out, new_kv

    h, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(
        body, h, (params["blocks"], lora,
                  (cache.k, cache.v, cache.k_scale, cache.v_scale),
                  jnp.arange(cfg.n_layer)))

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    logits = compute_logits(h, params, dtype)
    return logits[:, 0], KVCache(k=new_k, v=new_v, k_scale=new_ks,
                                 v_scale=new_vs)


def forward_spec_batched(params: Params, toks: jnp.ndarray,
                         cache: KVCache, pos: jnp.ndarray,
                         cfg: ModelConfig, dtype=jnp.bfloat16,
                         lora: Optional[Params] = None,
                         lora_scale: float = 0.0,
                         attn_len: Optional[int] = None,
                         ) -> Tuple[jnp.ndarray, KVCache]:
    """Batched multi-token forward with PER-SLOT positions — the
    speculative-verify primitive for continuous batching
    (serve/batching.py): slot b runs S tokens at absolute positions
    [pos[b], pos[b] + S), attending its full cache prefix causally.

    toks: (B, S); pos: (B,).  Returns logits (B, S, V) and the updated
    cache.  S == 1 reduces to forward_decode_batched semantics; the
    separate function keeps the measured single-token hot path
    untouched.  The caller guarantees max(pos) + S <= attn_len.
    """
    B, S = toks.shape
    T = cache.max_seq
    Ta = attn_len if attn_len is not None else T
    h = embed_tokens(params, toks, dtype)                 # (B, S, E)
    posm = pos[:, None] + jnp.arange(S)[None, :]          # (B, S)

    if cfg.use_rope:
        cos_t, sin_t = precompute_rope(cfg.head_dim, T, cfg.rope_theta)
        cos = cos_t[posm][:, :, None, :]                  # (B, S, 1, D/2)
        sin = sin_t[posm][:, :, None, :]
    else:
        cos = sin = None
        h = h + params["wpe"][posm].astype(dtype)

    j = jnp.arange(Ta)[None, None, :]
    m = jnp.where(j <= posm[:, :, None], 0.0, -jnp.inf).astype(jnp.float32)
    mask = m[:, None, None, :, :]                         # (B,1,1,S,Ta)

    def body(carry, xs):
        layer, lora_layer, kvc, li = xs
        out, new_kv = block(carry, layer, cfg, cos, sin, mask, dtype,
                            lora_layer, lora_scale,
                            kv_cache=kvc, start_pos=pos,
                            layer_idx=li, attn_len=attn_len)
        return out, new_kv

    h, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(
        body, h, (params["blocks"], lora,
                  (cache.k, cache.v, cache.k_scale, cache.v_scale),
                  jnp.arange(cfg.n_layer)))

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    logits = compute_logits(h, params, dtype)
    return logits, KVCache(k=new_k, v=new_v, k_scale=new_ks,
                           v_scale=new_vs)


# =====================================================================
# Initialization (reference: model.py:356-373)
# =====================================================================

def init_params(rng: jax.Array, cfg: ModelConfig,
                param_dtype=jnp.float32) -> Params:
    """GPT-2-style init: N(0, 0.02); w3/wo scaled by 1/sqrt(2L)."""
    L, E, V = cfg.n_layer, cfg.n_embd, cfg.vocab_size
    H, KV, D, F = cfg.n_head, cfg.n_kv_head, cfg.head_dim, cfg.n_hidden
    std = 0.02
    res_std = 0.02 / math.sqrt(2 * L)

    keys = jax.random.split(rng, 16)

    def normal(key, shape, s):
        return (jax.random.normal(key, shape, jnp.float32) * s).astype(param_dtype)

    params: Params = {
        "tok_embeddings": normal(keys[0], (V, E), std),
        "norm": jnp.ones((E,), param_dtype),
        "blocks": {
            "attn_norm": jnp.ones((L, E), param_dtype),
            "ffn_norm": jnp.ones((L, E), param_dtype),
            "wq": normal(keys[1], (L, E, H * D), std),
            "wk": normal(keys[2], (L, E, KV * D), std),
            "wv": normal(keys[3], (L, E, KV * D), std),
            "wo": normal(keys[4], (L, H * D, E), res_std),
            "w1": normal(keys[5], (L, E, F), std),
            "w2": normal(keys[6], (L, F, E), std),
            "w3": normal(keys[7], (L, E, F), res_std),
        },
    }
    if not cfg.use_rope:
        params["wpe"] = normal(keys[8], (cfg.block_size, E), std)
    if not cfg.tie_embeddings:
        params["output"] = normal(keys[9], (E, V), std)
    if cfg.qkv_bias:
        params["blocks"]["bq"] = jnp.zeros((L, H * D), param_dtype)
        params["blocks"]["bk"] = jnp.zeros((L, KV * D), param_dtype)
        params["blocks"]["bv"] = jnp.zeros((L, KV * D), param_dtype)
    if cfg.use_qk_norm:
        params["blocks"]["q_norm"] = jnp.ones((L, D), param_dtype)
        params["blocks"]["k_norm"] = jnp.ones((L, D), param_dtype)
    return params


def merge_lora(params: Params, lora: Params, scale: float) -> Params:
    """Fold a LoRA adapter into the base weights: W' = W + scale·(A@B)
    for each of wq/wk/wv/wo per layer.  The reference declares this but
    never implements it (model.py:433-434 `merge_lora` TODO); merged
    params generate identically to base+adapter (same delta, applied
    once at fold time instead of per step) and can be exported/quantized
    like any base model.  Returns a new pytree; inputs are unchanged."""
    merged = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in params.items()}
    blocks = merged["blocks"]
    for name in ("wq", "wk", "wv", "wo"):
        a, b = lora[f"{name}_a"], lora[f"{name}_b"]
        w = jnp.asarray(blocks[name], jnp.float32)
        delta = jnp.einsum("ler,lro->leo", jnp.asarray(a, jnp.float32),
                           jnp.asarray(b, jnp.float32)) * scale
        blocks[name] = (w + delta).astype(params["blocks"][name].dtype)
    return merged


def init_lora_params(rng: jax.Array, cfg: ModelConfig, rank: int,
                     param_dtype=jnp.float32) -> Params:
    """LoRA A/B for wq/wk/wv/wo; kaiming-uniform A, zero B (model.py:145-156)."""
    L, E, H, KV, D = cfg.n_layer, cfg.n_embd, cfg.n_head, cfg.n_kv_head, cfg.head_dim
    keys = jax.random.split(rng, 4)

    def kaiming(key, shape):
        # torch kaiming_uniform_(a=sqrt(5)) on a (out,in) matrix ->
        # U(-1/sqrt(fan_in), 1/sqrt(fan_in)); fan_in = shape[0] here (in,out)
        bound = 1.0 / math.sqrt(shape[1])  # per-layer matrices are (L, in, r)
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound
                                  ).astype(param_dtype)

    return {
        "wq_a": kaiming(keys[0], (L, E, rank)),
        "wq_b": jnp.zeros((L, rank, H * D), param_dtype),
        "wk_a": kaiming(keys[1], (L, E, rank)),
        "wk_b": jnp.zeros((L, rank, KV * D), param_dtype),
        "wv_a": kaiming(keys[2], (L, E, rank)),
        "wv_b": jnp.zeros((L, rank, KV * D), param_dtype),
        "wo_a": kaiming(keys[3], (L, H * D, rank)),
        "wo_b": jnp.zeros((L, rank, E), param_dtype),
    }


def count_params(params: Params, cfg: ModelConfig, non_embedding: bool = True) -> int:
    """Total parameter count (reference: model.py:480-484)."""
    n = sum(int(p.size) for p in jax.tree.leaves(params))
    if non_embedding and not cfg.use_rope and "wpe" in params:
        n -= int(params["wpe"].size)
    return n


def estimate_flops_per_token(cfg: ModelConfig, n_params: int) -> float:
    """PaLM appendix-B formula 6N + 12*L*H*Q*T (reference: model.py:493-503)."""
    return 6 * n_params + 12 * cfg.n_layer * cfg.n_head * cfg.head_dim * cfg.block_size
