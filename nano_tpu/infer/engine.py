"""Inference engine: context + session API with streaming generation.

Mirrors the reference C engine's API surface (reference: infer/infer.h:253-282,
infer/infer.c:564-1402) — `LLMContext` ~ `llm_context_init` (model load,
sampler, KV arena), `Session` ~ `Nano_Session` (prompt ids, output ids, pos,
TPS), `Session.step` ~ `llm_session_step` (ONE token per call, re-entrant,
event-loop friendly), `generate_sync` with on_prefilling / on_decoding /
on_finished callbacks, `seq2seq` for non-causal models, and the denoise
decode mode (reference: model.py:581-638).

TPU-native design:
  * prefill and decode are two jit-compiled programs with STATIC shapes.
    Prompts are padded to bucket lengths (powers of two) so arbitrary
    prompt lengths reuse a handful of compiled programs.  Padding rows
    write garbage K/V beyond the true length, but every later decode step
    overwrites its own row before attending and the causal mask hides the
    rest, so correctness is unaffected.
  * decode keeps ALL state on device (KV cache, seen-token mask, RNG key,
    current token); the host loop only pulls one int32 per token for
    streaming — or use `generate_on_device` (lax.scan) to avoid even that.
  * sampling runs on device, fused into the decode step.
"""

from __future__ import annotations

import codecs
import os as _os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nano_tpu.config import ModelConfig
from nano_tpu import observe
from nano_tpu.models import gpt
from nano_tpu.ops import sampling
from nano_tpu.io import binfmt
from nano_tpu.tokenizer.trie import TrieTokenizer, apply_instruct_template

# Nano stop tokens: <|padding|>=0 and <|eos|>=3 (reference: infer/infer.c
# llm_session_step stop set)
NANO_STOP_TOKENS = (0, 3)


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


# =====================================================================
# jitted step programs
# =====================================================================

@partial(jax.jit, static_argnames=("cfg", "dtype", "observed", "attn_len"))
def _prefill(params, lora, lora_scale, ids, cache, cfg, dtype,
             observed=False, attn_len=None, last_idx=None):
    """Run the whole (padded) prompt through the model, fill the cache.

    `observed` is a cache-busting static flag: attaching an observer
    (nano_tpu.observe) re-traces so the phase taps appear in the program.
    The third output carries observation-summary rows on backends without
    host-callback support (observe.deliver) — empty otherwise.
    `attn_len` (static): prompt queries never attend past the padded
    prompt itself, so attending only ids.shape[1] rows of a longer cache
    is value-identical (causal; global attention masks at start+S too).
    `last_idx` (traced): compute the LM head only at that position and
    return logits (B, 1, V) — all generation callers sample from the
    last prompt position, and the padded-width head dominated quantized
    prefill latency (see gpt.forward_with_cache).
    """
    del observed
    observe.start_capture()
    logits, cache = gpt.forward_with_cache(
        params, ids, cache, jnp.int32(0), cfg, dtype=dtype,
        lora=lora, lora_scale=lora_scale, attn_len=attn_len,
        last_idx=last_idx)
    return logits, cache, observe.end_capture()


# nucleus window: top-p sampling runs over the top-K candidates from
# lax.top_k instead of a full-vocab sort (a 16K bitonic sort costs ~40 ms
# per step on TPU — 300x the whole forward).  Tokens outside the window
# can only enter the nucleus for near-uniform distributions; the C engine
# applies a comparable cutoff prefilter (infer/infer.c:1063-1068).
NUCLEUS_WINDOW = 128


@partial(jax.jit, static_argnames=("cfg", "dtype", "top_k", "greedy",
                                   "exact", "observed", "attn_len",
                                   "penalized"))
def _decode_step(params, lora, lora_scale, tok, pos, cache, seen_mask, key,
                 temperature, top_p, rep_penalty, cfg, dtype, top_k,
                 greedy=False, exact=False, observed=False, attn_len=None,
                 penalized=True):
    """One decode step: forward 1 token, sample the next, update state.

    `greedy` is a static flag so the temperature==0 path compiles to a
    bare argmax with no sampling machinery in the graph.  `exact` selects
    full-vocab plain multinomial (the reference's top_p>=1 mode,
    model.py:527-529) — a categorical over all V logits needs no sort, so
    it costs one reduction instead of the 40 ms full-vocab sort the
    windowed path exists to avoid.  `observed` busts the jit cache when
    an observer is (de)attached.
    """
    del observed
    observe.start_capture()
    logits, cache = gpt.forward_with_cache(
        params, tok[:, None], cache, pos, cfg, dtype=dtype,
        lora=lora, lora_scale=lora_scale, attn_len=attn_len)
    logits = logits[:, 0].astype(jnp.float32)

    # `penalized` (static): with repetition_penalty == 1.0 the penalty is
    # numerically a no-op, but the traced where + V-sized seen scatter
    # still cost two full-vocab ops per step — skip them from the graph
    if penalized:
        logits = jnp.where(seen_mask, logits / rep_penalty, logits)

    # single sampling implementation for every token — the first token
    # after prefill (Session) and all decode-scan tokens share this exact
    # window/softmax/truncate math by construction
    key_out, next_tok = _sample_windowed(key, logits, temperature, top_p,
                                         top_k, greedy, exact)
    observe.tap(observe.Phase.SAMPLE, -1, next_tok)
    if penalized:
        seen_mask = seen_mask.at[jnp.arange(tok.shape[0]),
                                 next_tok].set(True)
    return next_tok, cache, seen_mask, key_out, logits, observe.end_capture()


@partial(jax.jit, static_argnames=("top_k", "greedy", "exact"))
def _sample_windowed(key, logits, temperature, top_p, top_k, greedy,
                     exact=False):
    """Nucleus sampling over the top-K window (B, V) -> (B,).

    Same math as the decode step; used for the first token after prefill
    so TTFT never pays a full-vocab sort (~40 ms at 151k vocab).
    `exact` = full-vocab plain multinomial (no window, no sort).
    """
    if greedy:
        return key, jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if exact:
        key, sub = jax.random.split(key)
        tok = jax.random.categorical(
            sub, logits / jnp.maximum(temperature, 1e-6), axis=-1)
        return key, tok.astype(jnp.int32)
    window = min(top_k if top_k else NUCLEUS_WINDOW, logits.shape[-1])
    l = logits / jnp.maximum(temperature, 1e-6)
    top_logits, top_idx = jax.lax.top_k(l, window)
    if top_k:
        # user-requested top-k: renormalize WITHIN the window — exactly
        # the reference's -inf-mask-then-softmax (model.py top_k path)
        probs = jax.nn.softmax(top_logits, axis=-1)
    else:
        # the 128-window is an implementation detail: use TRUE full-vocab
        # probabilities (full logsumexp, one cheap reduction) so the
        # top_p cut lands at the same cumulative mass as a full-vocab
        # nucleus — window-renormalizing would shrink the threshold to
        # p * (window mass)
        lse = jax.nn.logsumexp(l, axis=-1, keepdims=True)
        probs = jnp.exp(top_logits - lse)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) <= top_p
    use_topp = jnp.logical_and(top_p > 0.0, top_p < 1.0)
    probs = jnp.where(jnp.logical_or(keep, jnp.logical_not(use_topp)),
                      probs, 0.0)
    key, sub = jax.random.split(key)
    draw = jax.random.categorical(sub, jnp.log(jnp.maximum(probs, 1e-38)),
                                  axis=-1)
    tok = jnp.take_along_axis(top_idx, draw[:, None], axis=-1)[:, 0]
    return key, tok.astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "dtype", "top_k", "n_steps",
                                   "greedy", "exact", "attn_len",
                                   "penalized"))
def _decode_scan(params, lora, lora_scale, tok, pos, cache, seen_mask, key,
                 temperature, top_p, rep_penalty, cfg, dtype, top_k, n_steps,
                 greedy=False, exact=False, attn_len=None, penalized=True):
    """On-device decode of n_steps tokens via lax.scan (no host roundtrips).

    `attn_len` (static) bounds the attended cache prefix for the whole
    scan — the caller guarantees pos + n_steps <= attn_len (cache-length
    bucketing, generate_on_device)."""
    def body(carry, _):
        tok, pos, cache, seen_mask, key = carry
        next_tok, cache, seen_mask, key, _, _ = _decode_step(
            params, lora, lora_scale, tok, pos, cache, seen_mask, key,
            temperature, top_p, rep_penalty, cfg, dtype, top_k, greedy,
            exact, attn_len=attn_len, penalized=penalized)
        return (next_tok, pos + 1, cache, seen_mask, key), next_tok

    (tok, pos, cache, seen_mask, key), toks = jax.lax.scan(
        body, (tok, pos, cache, seen_mask, key), None, length=n_steps)
    return toks, cache, seen_mask, key


def _bucketing_enabled() -> bool:
    """Decode cache-length bucketing gate (NANO_TPU_DECODE_BUCKET=0
    restores full-cache attention for A/B; read per call so tests can
    flip it)."""
    return _os.environ.get("NANO_TPU_DECODE_BUCKET", "1") != "0"


def _attn_bucket(cover: int, cap: int, minimum: int = 16) -> Optional[int]:
    """Static attn_len for a dispatch that must attend `cover` rows of a
    `cap`-row cache: the covering pow2 bucket, or None when that is the
    whole cache or bucketing is disabled."""
    if not _bucketing_enabled():
        return None
    b = min(_bucket(cover, minimum=minimum), cap)
    return b if b < cap else None


def _decode_segments(p: int, rem: int, cache_len: int,
                     min_seg: int = 64) -> List[Tuple[Optional[int], int]]:
    """Split a decode of `rem` steps starting at position `p` into
    (attn_len, n_steps) segments along pow2 cache buckets.  Tiny
    segments merge into the next bucket — each segment is one dispatched
    program (~fixed tunnel cost), so a short tail is not worth its own
    launch.  attn_len None = the full (already right-sized) cache."""
    if p + rem >= cache_len + 1:
        # positions written run p .. p+rem-1; the last must fit the cache.
        # Without this guard the loop below appends zero-length segments
        # forever (observed: the round-4 bench panel's nano168m stage grew
        # the list to 130 GB host RSS and got OOM-killed).
        raise ValueError(
            f"decode of {rem} steps from position {p} needs "
            f"{p + rem} cache rows but cache_len={cache_len}")
    segs: List[Tuple[Optional[int], int]] = []
    while rem > 0:
        attn_b = min(_bucket(p + 1), cache_len)
        while attn_b < cache_len and attn_b - p < min(rem, min_seg):
            attn_b *= 2
        take = min(rem, attn_b - p)
        segs.append((attn_b if attn_b < cache_len else None, take))
        p += take
        rem -= take
    return segs


def _exact_multinomial(sampler) -> bool:
    """True when sampling is plain multinomial (reference model.py:527-529
    / C top_p disabled, infer/infer.c:1183-1188): no top-k requested and
    top_p outside (0, 1).  The full-vocab categorical needs no sort, so
    there is no 128-candidate window in this mode."""
    return (not sampler.top_k) and not (0.0 < sampler.top_p < 1.0)


# =====================================================================
# Context
# =====================================================================

@dataclass
class LLMContext:
    """Loaded model + runtime knobs (reference: Nano_Context, infer/infer.h:225-235).

    max_seq_len is decoupled from the model's block_size so the KV cache
    can be sized up or down per deployment (infer/infer.c:761-764).
    """

    cfg: ModelConfig
    params: Dict[str, Any]
    tokenizer: Any                      # TrieTokenizer or BpeTokenizer
    max_seq_len: int
    dtype: Any = jnp.bfloat16
    lora: Optional[Dict[str, Any]] = None
    lora_scale: float = 0.0
    sampler: sampling.SamplerConfig = field(default_factory=sampling.SamplerConfig)
    random_seed: int = 39
    observation: Optional[Callable] = None   # nano_tpu/observe.py
    stop_tokens: Tuple[int, ...] = NANO_STOP_TOKENS
    arch: str = "nano"                  # "nano" | "qwen2" | "qwen3"
    enable_thinking: bool = False       # Qwen chat template switch
    mesh: Optional[Any] = None          # set via shard()
    kv_cache_dtype: Optional[Any] = None   # jnp.int8 halves cache HBM
    device: Optional[Any] = None        # set via replicate_to()
    spec_k: int = 0                     # speculative decode draft length
                                        # (greedy incl. rep-penalty;
                                        # infer/speculative.py; 7 = one
                                        # 8-row MXU sublane block)

    def replicate_to(self, device) -> "LLMContext":
        """A replica of this context pinned to one device — the
        data-parallel serving unit (one BatchedEngine per replica, each
        decoding independently; replaces the reference's one-process-per-
        stream scaling, infer/main_wss.c).  Weights are copied to the
        target device; host-side state (tokenizer, sampler) is shared."""
        import dataclasses as _dc
        put = lambda t: jax.tree.map(lambda x: jax.device_put(x, device), t)
        return _dc.replace(
            self, params=put(self.params),
            lora=None if self.lora is None else put(self.lora),
            device=device, mesh=None)

    def shard(self, mesh, tensor_parallel: bool = True) -> "LLMContext":
        """Tensor-parallel serving: place params (dense or quantized)
        with Megatron-style shardings over the mesh's "model" axis; KV
        caches created afterwards shard their head dim to match (SURVEY
        §7 phase 5 — a sharding spec, not new code; XLA inserts the
        all-reduces over ICI)."""
        from nano_tpu.parallel import mesh as meshlib
        self.mesh = mesh
        if tensor_parallel:
            self.params = meshlib.shard_inference_params(self.params, mesh)
        else:
            rep = meshlib.replicated(mesh)
            self.params = jax.tree.map(lambda x: jax.device_put(x, rep),
                                       self.params)
        if self.lora is not None:
            rep = meshlib.replicated(mesh)
            self.lora = jax.tree.map(lambda x: jax.device_put(x, rep),
                                     self.lora)
        return self

    def new_cache(self, batch: int,
                  seq_len: Optional[int] = None) -> "gpt.KVCache":
        """seq_len shortens the cache (e.g. a bucket-sized prefill staging
        cache for continuous-batching joins); default is max_seq_len."""
        cache = gpt.KVCache.create(self.cfg, batch,
                                   seq_len or self.max_seq_len,
                                   self.kv_cache_dtype or self.dtype)
        if self.device is not None:
            return jax.tree.map(
                lambda x: None if x is None else jax.device_put(x, self.device),
                cache)
        if self.mesh is not None:
            from nano_tpu.parallel import mesh as meshlib
            from jax.sharding import NamedSharding
            spec = meshlib.kv_cache_spec()
            if not meshlib._divisible(cache.k.shape, spec, self.mesh):
                spec = meshlib.P()   # e.g. KV heads < model-axis size
            sh = NamedSharding(self.mesh, spec)
            sspec = meshlib.P(*spec[:-1])          # scales drop the D dim
            ssh = NamedSharding(self.mesh, sspec)
            put_s = (lambda x: None if x is None
                     else jax.device_put(x, ssh))
            cache = gpt.KVCache(k=jax.device_put(cache.k, sh),
                                v=jax.device_put(cache.v, sh),
                                k_scale=put_s(cache.k_scale),
                                v_scale=put_s(cache.v_scale))
        return cache

    @classmethod
    def from_bin(cls, path: str, max_seq_len: Optional[int] = None,
                 dtype=jnp.bfloat16, quantized: Optional[bool] = None,
                 **kw) -> "LLMContext":
        """Load a .bin model.  quantized=None keeps Q80 files quantized on
        device (int8 weights + fused dequant matmul); quantized=False
        dequantizes everything to `dtype` at load."""
        with open(path, "rb") as f:
            hdr = binfmt.parse_header(f.read(binfmt.HEADER_BYTES))
        if quantized is None:
            quantized = hdr.quant_type in (binfmt.QUANT_Q80,
                                           binfmt.QUANT_Q4K)
        # quantized int8-MXU loads consume only qparams — skip the f32
        # dequantized copies entirely (~2.4 GB of transient host memory
        # + dequant time at 0.6B).  The xla/pallas oracle modes still
        # need the dense head table (binfmt._attach_clf_dequant).
        from nano_tpu.ops import qmatmul as _qm
        dense = not (quantized and _qm._IMPL == "int8")
        bm = binfmt.read_model(path, dense=dense)
        if quantized:
            params = binfmt.quantized_device_params(bm)
        else:
            params = jax.tree.map(
                lambda x: jnp.asarray(x, dtype) if np.asarray(x).ndim >= 2
                else jnp.asarray(x, jnp.float32), bm.params)
        if bm.header.model_type in (binfmt.MODEL_TYPE_QWEN2,
                                    binfmt.MODEL_TYPE_QWEN3):
            from nano_tpu.tokenizer.bpe import QWEN_STOP_TOKENS
            tok = bm.tokenizer_config["tokenizer"]
            kw.setdefault("stop_tokens", QWEN_STOP_TOKENS)
            kw.setdefault("arch", "qwen2" if bm.header.model_type ==
                          binfmt.MODEL_TYPE_QWEN2 else "qwen3")
        else:
            tok = TrieTokenizer.from_config_dict(bm.tokenizer_config)
        return cls(cfg=bm.config, params=params, tokenizer=tok,
                   max_seq_len=max_seq_len or bm.config.block_size,
                   dtype=dtype, **kw)

    @classmethod
    def from_gguf(cls, path: str, max_seq_len: Optional[int] = None,
                  dtype=jnp.bfloat16, quantized: Optional[bool] = None,
                  **kw) -> "LLMContext":
        """Load a llama.cpp-ecosystem GGUF checkpoint directly (dense
        Qwen2/Qwen3, io/gguf.py).  quantized=None keeps quantized files
        (Q8_0 / Q4_K / Q6_K blocks) in OUR quantized decode layouts —
        the ggml per-group affines map losslessly onto Q80Tensor /
        Q4KTensor; quantized=False dequantizes everything to `dtype`."""
        from nano_tpu.io import gguf as _gguf
        from nano_tpu.tokenizer.bpe import QWEN_STOP_TOKENS

        def _ctx_kw(model_type):
            kw.setdefault("stop_tokens", QWEN_STOP_TOKENS)
            kw.setdefault("arch", "qwen2" if model_type ==
                          binfmt.MODEL_TYPE_QWEN2 else "qwen3")
            return kw

        g = _gguf.GGUFFile(path)
        wq0 = g.tensors.get("blk.0.attn_q.weight")
        q_types = (_gguf.GGML_Q8_0, _gguf.GGML_Q4_K, _gguf.GGML_Q6_K,
                   _gguf.GGML_Q4_0)
        if quantized is None:
            quantized = wq0 is not None and wq0.ggml_type in q_types
        if quantized:
            arch = g.meta.get("general.architecture", "")
            if arch not in ("qwen2", "qwen3"):
                raise ValueError(
                    f"unsupported GGUF architecture {arch!r}")
            # reuse load_gguf_qwen's header/tokenizer mapping without
            # materializing the dense weights
            cfg, model_type, tok = _gguf.gguf_header_only(g, max_seq_len)
            params = _gguf.quantized_device_params(g, cfg, arch)
            return cls(cfg=cfg, params=params, tokenizer=tok,
                       max_seq_len=max_seq_len or cfg.block_size,
                       dtype=dtype, **_ctx_kw(model_type))
        cfg, raw, model_type, tok = _gguf.load_gguf_qwen(path, max_seq_len)
        params = jax.tree.map(
            lambda x: jnp.asarray(x, dtype) if np.asarray(x).ndim >= 2
            else jnp.asarray(x, jnp.float32), raw)
        return cls(cfg=cfg, params=params, tokenizer=tok,
                   max_seq_len=max_seq_len or cfg.block_size,
                   dtype=dtype, **_ctx_kw(model_type))

    @classmethod
    def from_checkpoint(cls, path: str, max_seq_len: Optional[int] = None,
                        dtype=jnp.bfloat16, **kw) -> "LLMContext":
        """Load a training checkpoint (.npz) directly, like the reference
        PyTorch CLI loads .pt files (reference: infer.py:43-83)."""
        from nano_tpu.io.checkpoint import Checkpoint
        ck = Checkpoint(path)
        cfg = ModelConfig.from_dict(ck.model_config)
        like = gpt.init_params(jax.random.PRNGKey(0), cfg)
        if ck.is_lora and not ck.has("model"):
            raise ValueError("LoRA-only checkpoint: pass the base model via "
                             "from_checkpoint(base) + load_lora_checkpoint")
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype)
                              if np.asarray(x).ndim >= 2
                              else jnp.asarray(x, jnp.float32),
                              ck.load_params(like))
        tok = TrieTokenizer.from_config_dict(ck.tokenizer_config)
        ctx = cls(cfg=cfg, params=params, tokenizer=tok,
                  max_seq_len=max_seq_len or cfg.block_size, dtype=dtype,
                  **kw)
        return ctx

    def load_lora_checkpoint(self, path: str) -> None:
        """Attach LoRA weights from a training checkpoint (.npz)."""
        from nano_tpu.io.checkpoint import Checkpoint
        ck = Checkpoint(path)
        tc = ck.train_config or {}
        rank = int(tc.get("lora_rank", 16))
        alpha = int(tc.get("lora_alpha", 32))
        like = gpt.init_lora_params(jax.random.PRNGKey(0), self.cfg, rank)
        self.lora = jax.tree.map(lambda x: jnp.asarray(x, self.dtype),
                                 ck.load_lora(like))
        self.lora_scale = alpha / rank

    def load_lora(self, path: str) -> None:
        """Hot-swap a LoRA module (reference: infer/infer.c:500-549)."""
        bl = binfmt.read_lora(path, self.cfg)
        self.lora = jax.tree.map(lambda x: jnp.asarray(x, self.dtype), bl.lora)
        self.lora_scale = bl.alpha / bl.rank

    def unload_lora(self) -> None:
        self.lora = None
        self.lora_scale = 0.0

    def clone_with_lora(self, path: str) -> "LLMContext":
        """A variant context sharing the base weights (same arrays — no
        copy) with its own LoRA adapter: the multi-adapter serving unit
        (serve/wss.py --lora name=path)."""
        import dataclasses as _dc
        variant = _dc.replace(self)
        variant.load_lora(path)
        return variant

    def encode(self, text: str) -> List[int]:
        return self.tokenizer.encode(text)

    def decode(self, ids: List[int]) -> str:
        return self.tokenizer.decode(ids)

    def build_prompt_ids(self, prompt: str, template: bool) -> List[int]:
        """Arch-appropriate prompt construction (reference:
        infer/main_cli.c:266-278 applies the Nano instruct template for
        Nano models and the Qwen chat template for Qwen models)."""
        if not template:
            return self.encode(prompt)
        if self.arch in ("qwen2", "qwen3"):
            return self.tokenizer.apply_chat_template(
                prompt, enable_thinking=self.enable_thinking)
        return self.encode(apply_instruct_template(prompt))

    def stream_decoder(self) -> "StreamDecoder":
        return StreamDecoder(self.tokenizer)

    def build_chat_ids(self, messages) -> List[int]:
        """OpenAI-style role/content messages -> prompt ids.  Multi-turn
        extension of build_prompt_ids (the reference templates are
        single-turn): Qwen arches render canonical im_start blocks; Nano
        renders one instruct/response pair per exchange, the training
        format (reference: data.py:170-178), with any system message
        folded into the next user question."""
        if self.arch in ("qwen2", "qwen3"):
            return self.tokenizer.apply_chat_template_messages(
                messages, enable_thinking=self.enable_thinking)
        text, system = "", ""
        for m in messages:
            role = m.get("role", "user")
            content = str(m.get("content", ""))
            if role == "system":
                system = content
            elif role == "assistant":
                text += f"{content}<|eos|>"
            else:
                q = f"{system}\n{content}" if system else content
                system = ""
                text += apply_instruct_template(q)
        return self.encode(text)


class StreamDecoder:
    """Per-token streaming decode that never splits a multi-byte UTF-8
    character across emissions.

    Byte-level BPE tokens (Qwen) can end mid-character; a naive
    per-token ``decode([tok])`` emits U+FFFD for each half.  The
    reference C engine sidesteps this by writing raw bytes to the
    terminal (infer/main_cli.c) — a JSON/SSE stream can't, so this
    buffers the incomplete tail bytes until the character completes.
    Character-native tokenizers (the Nano trie) pass straight through.
    """

    def __init__(self, tokenizer):
        self._tok = tokenizer
        vocab = getattr(tokenizer, "vocab", None)
        self._byte_vocab = (isinstance(vocab, list) and len(vocab) > 0
                            and isinstance(vocab[0], bytes))
        if self._byte_vocab:
            self._dec = codecs.getincrementaldecoder("utf-8")("replace")

    def feed(self, tok_id: int) -> str:
        if not self._byte_vocab:
            return self._tok.decode([int(tok_id)])
        vocab = self._tok.vocab
        tid = int(tok_id)
        if not 0 <= tid < len(vocab):
            return ""                       # OOV: render as nothing
        return self._dec.decode(vocab[tid])

    def flush(self) -> str:
        """Emit any buffered incomplete tail (as U+FFFD) at end of
        stream."""
        if not self._byte_vocab:
            return ""
        return self._dec.decode(b"", True)


# =====================================================================
# Session — one token per step() call
# =====================================================================

class Session:
    """Re-entrant generation session (reference: infer/infer.c:1196-1308).

    step() produces ONE token per call so event-loop frontends (WebSocket
    writable callbacks, UI ticks) can interleave generation with I/O.
    """

    PREFILLING = 0
    DECODING = 1
    FINISHED = 2

    # plain steps taken after a fully rejected k=1 probe before spec is
    # re-probed: starts at _SPEC_PARK_MIN and doubles per consecutive
    # rejection up to _SPEC_PARK_MAX, resetting on any acceptance — early
    # misses (thin history) recover fast, sustained-unpredictable text
    # converges to <= 1 verify per 32 steps of overhead (see _spec_adapt)
    _SPEC_PARK_MIN = 4
    _SPEC_PARK_MAX = 32

    def __init__(self, ctx: LLMContext, prompt: str,
                 max_new_tokens: Optional[int] = None,
                 template: bool = False):
        self.ctx = ctx
        self.prompt_ids = ctx.build_prompt_ids(prompt, template)
        if len(self.prompt_ids) == 0:
            self.prompt_ids = [getattr(ctx.tokenizer, "bos_id", 0)]
        if len(self.prompt_ids) >= ctx.max_seq_len:
            self.prompt_ids = self.prompt_ids[-(ctx.max_seq_len - 1):]

        self.output_ids: List[int] = []
        self.pos = 0
        self.state = Session.PREFILLING
        self.max_new_tokens = (max_new_tokens if max_new_tokens is not None
                               else ctx.max_seq_len - len(self.prompt_ids))

        # device state
        cfg = ctx.cfg
        self._cache = ctx.new_cache(1)
        self._key = jax.random.PRNGKey(ctx.random_seed)
        self._seen = jnp.zeros((1, cfg.vocab_size), jnp.bool_)
        self._cur_tok: Optional[jnp.ndarray] = None

        # speculative decode state (infer/speculative.py): each verify
        # dispatch emits >= 1 tokens into _pending; step() drains it —
        # through the tunnel's ~30 ms/dispatch this multiplies
        # interactive decode by the acceptance rate.  ctx.spec_k is the
        # draft-length CAP; the round-to-round length adapts like the
        # C++ engine (cpp/nano.cpp Session::run_spec_round: x2 on full
        # acceptance, back to the accepted run length on a miss) but
        # quantized to pow2 buckets so only log2(cap) verify_step
        # programs ever compile (each static k is its own XLA program;
        # the C++ rule's arbitrary k values are free there, not here)
        self._pending: List[int] = []
        self._hist: Optional[jnp.ndarray] = None
        self._spec_k_cur = 1
        # k=0 park: on unpredictable text even a k=1 verify (a 2-token
        # program) loses to a plain step (runbook r4: session adaptive
        # 17.7 vs plain 28.3 tok/s on trained-56M free text) — a fully
        # rejected k=1 round parks spec at k=0 for a backoff-doubled
        # number of plain steps, then re-probes
        self._spec_park = 0
        self._spec_park_len = self._SPEC_PARK_MIN
        # tokens emitted by plain steps while parked, folded into _hist
        # in ONE device update just before the next probe (per-step
        # .at[].set() would cost a ~30 ms tunnel dispatch each)
        self._park_toks: List[int] = []
        self._spec = (ctx.spec_k > 0
                      and ctx.sampler.temperature <= 0.0
                      and ctx.observation is None)

        # TPS accounting (reference: infer/infer.h:247-250)
        self.t_start = time.time()
        self.t_first_token: Optional[float] = None
        self.tps = 0.0

    # ------------------------------------------------------------
    def _do_prefill(self) -> int:
        ctx, cfg = self.ctx, self.ctx.cfg
        n = len(self.prompt_ids)
        pad_len = min(_bucket(n), ctx.max_seq_len)
        ids = np.zeros((1, pad_len), np.int32)
        ids[0, :n] = self.prompt_ids
        observe.set_observer(ctx.observation)
        logits, self._cache, obs_rows = _prefill(
            ctx.params, ctx.lora, ctx.lora_scale,
            jnp.asarray(ids), self._cache, cfg, ctx.dtype,
            observed=observe.trace_token(),
            attn_len=(pad_len if _bucketing_enabled()
                      and pad_len < ctx.max_seq_len else None),
            last_idx=jnp.int32(n - 1))
        if observe.fallback_active():
            observe.deliver(np.asarray(obs_rows))
        # seen mask over prompt tokens (repetition penalty scope:
        # infer/infer.c:1158-1160)
        self._seen = sampling.seen_mask_from_ids(
            jnp.asarray(ids), jnp.asarray([n]), cfg.vocab_size)
        # sample the first generated token from the last prompt position
        # (the head ran only there — last_idx)
        last = jnp.asarray(logits[:, 0].astype(jnp.float32))
        last = jnp.where(self._seen, last / ctx.sampler.repetition_penalty, last)
        self._key, tok = _sample_windowed(
            self._key, last, jnp.float32(ctx.sampler.temperature),
            jnp.float32(ctx.sampler.top_p), ctx.sampler.top_k,
            ctx.sampler.temperature <= 0.0,
            exact=_exact_multinomial(ctx.sampler))
        self._cur_tok = tok.astype(jnp.int32)
        self._seen = self._seen.at[0, self._cur_tok[0]].set(True)
        self.pos = n
        self.state = Session.DECODING
        self.t_first_token = time.time()
        first = int(self._cur_tok[0])
        if self._spec:
            hist = np.zeros((ctx.max_seq_len,), np.int32)
            hist[:n] = self.prompt_ids
            hist[n] = first
            self._hist = jnp.asarray(hist)
        return first

    def _spec_adapt(self, k: int, n_acc: int) -> None:
        """Draft-length controller (pow2-bucketed C++ rule + k=0 park):
        full acceptance doubles toward the cap, a partial miss drops to
        the accepted-run-length bucket, and a fully rejected k=1 probe
        parks spec (plain steps) with exponential backoff."""
        if n_acc > 0:
            self._spec_park_len = self._SPEC_PARK_MIN
        if n_acc == k:
            self._spec_k_cur = min(2 * k, self.ctx.spec_k)
        elif n_acc == 0 and k == 1:
            self._spec_k_cur = 0
            self._spec_park = self._spec_park_len
            self._spec_park_len = min(2 * self._spec_park_len,
                                      self._SPEC_PARK_MAX)
        else:
            self._spec_k_cur = 1 << (max(1, n_acc).bit_length() - 1)

    def step(self) -> Optional[int]:
        """Generate the next token, or None when finished."""
        ctx = self.ctx
        if self.state == Session.FINISHED:
            return None
        if self.state == Session.PREFILLING:
            tok = self._do_prefill()
        elif self._pending:
            tok = self._pending.pop(0)
        else:
            if (self.pos + 1 >= ctx.max_seq_len or
                    len(self.output_ids) >= self.max_new_tokens):
                self.state = Session.FINISHED
                return None
            if self._spec and self._spec_k_cur == 0:
                if self._spec_park > 0:
                    self._spec_park -= 1      # plain step this round
                else:
                    self._spec_k_cur = 1      # park over: re-probe
            if (self._spec and self._spec_k_cur > 0
                    and self.pos + 3 <= ctx.max_seq_len):
                # one verify round refills _pending with >= 1 tokens
                from nano_tpu.infer import speculative
                if self._park_toks:
                    # catch _hist up with the parked plain steps so the
                    # draft lookup sees the real recent stream
                    arr = jnp.asarray(np.asarray(self._park_toks, np.int32))
                    start = self.pos - len(self._park_toks) + 1
                    self._hist = jax.lax.dynamic_update_slice(
                        self._hist, arr, (jnp.int32(start),))
                    self._park_toks = []
                k = max(1, min(self._spec_k_cur, ctx.spec_k,
                               ctx.max_seq_len - self.pos - 2))
                ab = _attn_bucket(self.pos + k + 2,
                                  ctx.max_seq_len, minimum=256)
                g, n_out, self._cache, self._hist, seen = \
                    speculative.verify_step(
                        ctx.params, ctx.lora, ctx.lora_scale,
                        self._cur_tok[0], jnp.int32(self.pos), self._cache,
                        self._hist, self._seen[0],
                        jnp.float32(ctx.sampler.repetition_penalty),
                        ctx.cfg, ctx.dtype, k, attn_len=ab)
                self._seen = seen[None]
                n_out = int(n_out)
                n_acc = n_out - 1
                self._spec_adapt(k, n_acc)
                self._pending = np.asarray(g)[:n_out].tolist()
                self._cur_tok = g[n_out - 1][None]
                self.pos += n_out
                tok = self._pending.pop(0)
            else:
                s = ctx.sampler
                observe.set_observer(ctx.observation)
                # per-step cache-length bucketing: attend only the pow2
                # prefix covering this position; value-identical — rows
                # past pos are masked zeros either way.  Bucket floor 256
                # keeps the compiled-variant count (and interactive
                # compile pauses) small: 256/512/... per sampler combo.
                attn_b = _attn_bucket(self.pos + 1, ctx.max_seq_len,
                                      minimum=256)
                next_tok, self._cache, self._seen, self._key, _, obs_rows = \
                    _decode_step(
                        ctx.params, ctx.lora, ctx.lora_scale,
                        self._cur_tok, jnp.int32(self.pos), self._cache,
                        self._seen, self._key, jnp.float32(s.temperature),
                        jnp.float32(s.top_p),
                        jnp.float32(s.repetition_penalty), ctx.cfg,
                        ctx.dtype, s.top_k, s.temperature <= 0.0,
                        exact=_exact_multinomial(s),
                        observed=observe.trace_token(),
                        attn_len=attn_b,
                        penalized=s.repetition_penalty != 1.0)
                if observe.fallback_active():
                    observe.deliver(np.asarray(obs_rows))
                self._cur_tok = next_tok
                self.pos += 1
                tok = int(next_tok[0])
                if self._spec and self._hist is not None:
                    self._park_toks.append(tok)

        if tok in ctx.stop_tokens:
            self.state = Session.FINISHED
            return None
        self.output_ids.append(tok)
        n_out = len(self.output_ids)
        if self.t_first_token and n_out > 1:
            self.tps = (n_out - 1) / max(time.time() - self.t_first_token, 1e-9)
        if (len(self.prompt_ids) + n_out) >= ctx.max_seq_len or \
                n_out >= self.max_new_tokens:
            self.state = Session.FINISHED
        return tok

    @property
    def text(self) -> str:
        return self.ctx.decode(self.output_ids)


# =====================================================================
# generate_sync — callback-driven loop (reference: infer/infer.c:1321-1361)
# =====================================================================

def generate_sync(ctx: LLMContext, prompt: str,
                  max_new_tokens: Optional[int] = None,
                  template: bool = False,
                  on_prefilling: Optional[Callable[[Session], Any]] = None,
                  on_decoding: Optional[Callable[[Session, int, str], Any]] = None,
                  on_finished: Optional[Callable[[Session], Any]] = None) -> Session:
    session = Session(ctx, prompt, max_new_tokens, template=template)
    if on_prefilling:
        on_prefilling(session)
    sdec = ctx.stream_decoder()   # UTF-8-safe across token boundaries
    while session.state != Session.FINISHED:
        tok = session.step()
        if tok is None:
            break
        if on_decoding:
            if on_decoding(session, tok, sdec.feed(tok)) is False:
                break
    if on_finished:
        on_finished(session)
    return session


def generate_on_device(ctx: LLMContext, prompt_ids: List[int],
                       n_tokens: int) -> np.ndarray:
    """Throughput path: prefill + n_tokens decode entirely on device.

    Returns the generated ids (n_tokens,).  No early stop — intended for
    benchmarking and batch workloads.  Over-long prompts keep their tail
    and n_tokens is capped to the cache room, both matching Session
    (silent cache-index clamping otherwise corrupts output).
    """
    cfg = ctx.cfg
    if not prompt_ids:
        prompt_ids = [getattr(ctx.tokenizer, "bos_id", 0)]
    if len(prompt_ids) >= ctx.max_seq_len:
        prompt_ids = prompt_ids[-(ctx.max_seq_len - 1):]
    n = len(prompt_ids)
    n_tokens = min(n_tokens, ctx.max_seq_len - n)
    if n_tokens <= 0:
        return np.zeros((0,), np.int32)
    pad_len = min(_bucket(n), ctx.max_seq_len)
    ids = np.zeros((1, pad_len), np.int32)
    ids[0, :n] = prompt_ids
    # cache-length bucketing: the total needed length (prompt + output
    # [+ speculative overdraft]) is known up front — right-size the cache
    # to its pow2 bucket instead of max_seq_len, so decode attention
    # never reads rows the generation cannot reach (attention is the
    # cache-length-proportional part of the step, PERF.md decode
    # decomposition).  NANO_TPU_DECODE_BUCKET=0 restores the full cache.
    bucketed = _bucketing_enabled()
    s = ctx.sampler
    # same eligibility as the spec branch below — an ineligible spec_k
    # (e.g. sampling enabled) must not inflate the cache bucket
    spec_eligible = (ctx.spec_k > 0 and s.temperature <= 0.0
                     and n + n_tokens + ctx.spec_k + 2 <= ctx.max_seq_len)
    need = n + n_tokens
    if spec_eligible:
        need += ctx.spec_k + 2    # verify probes past the last position
    cache_len = min(_bucket(need), ctx.max_seq_len) if bucketed \
        else ctx.max_seq_len
    cache = ctx.new_cache(1, seq_len=cache_len)
    logits, cache, _ = _prefill(ctx.params, ctx.lora, ctx.lora_scale,
                                jnp.asarray(ids), cache, cfg, ctx.dtype,
                                attn_len=(pad_len if bucketed
                                          and pad_len < cache_len
                                          else None),
                                last_idx=jnp.int32(n - 1))
    seen = sampling.seen_mask_from_ids(jnp.asarray(ids), jnp.asarray([n]),
                                       cfg.vocab_size)
    last = logits[:, 0].astype(jnp.float32)
    last = jnp.where(seen, last / s.repetition_penalty, last)
    # first token through the SAME sampler as Session._do_prefill (was:
    # unconditional argmax, which silently made token 1 greedy even for
    # temperature > 0)
    key, tok = _sample_windowed(
        jax.random.PRNGKey(ctx.random_seed), last,
        jnp.float32(s.temperature), jnp.float32(s.top_p), s.top_k,
        s.temperature <= 0.0, exact=_exact_multinomial(s))
    tok = tok.astype(jnp.int32)
    # the first sampled token joins the penalty scope immediately,
    # matching Session._do_prefill and the C engine
    # (infer/infer.c:1158-1160)
    seen = seen.at[jnp.arange(1), tok].set(True)
    if spec_eligible:
        # speculative greedy decode: identical token stream, >= 1 tokens
        # per verify round (infer/speculative.py)
        from nano_tpu.infer import speculative
        hist = np.zeros((ctx.max_seq_len,), np.int32)
        hist[:n] = prompt_ids
        hist[n] = int(tok[0])
        out, n_em, rounds, _cache = speculative.spec_decode_loop(
            ctx.params, ctx.lora, ctx.lora_scale, tok[0], jnp.int32(n),
            cache, jnp.asarray(hist), seen[0],
            jnp.float32(s.repetition_penalty), cfg, ctx.dtype,
            n_tokens - 1, ctx.spec_k)
        speculative.LAST_STATS = {"tokens": int(n_em),
                                  "rounds": int(rounds)}
        return np.concatenate([np.asarray(tok), np.asarray(out)])
    # segmented decode: each segment attends only the pow2 cache prefix
    # covering its positions (attn_len static per compiled scan); with
    # bucketing disabled, one full-cache scan (the pre-bucketing path,
    # for A/B)
    segs = (_decode_segments(n, n_tokens - 1, cache_len) if bucketed
            else ([(None, n_tokens - 1)] if n_tokens > 1 else []))
    pieces = [tok[:, None]]
    pos = jnp.int32(n)
    for attn_b, take in segs:
        toks, cache, seen, key = _decode_scan(
            ctx.params, ctx.lora, ctx.lora_scale, tok, pos, cache, seen,
            key, jnp.float32(s.temperature),
            jnp.float32(s.top_p), jnp.float32(s.repetition_penalty),
            cfg, ctx.dtype, s.top_k, take, s.temperature <= 0.0,
            _exact_multinomial(s), attn_len=attn_b,
            penalized=s.repetition_penalty != 1.0)
        pieces.append(toks.T)           # (n_steps, B) -> (B, n_steps)
        tok = toks[-1]
        pos = pos + take
    return np.asarray(jnp.concatenate(pieces, axis=1))[0]


# =====================================================================
# seq2seq — non-causal single-pass decode (reference: infer/infer.c:1365-1402)
# =====================================================================

@partial(jax.jit, static_argnames=("cfg", "dtype"))
def _seq2seq_forward(params, lora, lora_scale, ids, cfg, dtype):
    """One compiled forward+argmax (eager per-op dispatch costs ~30 ms
    per PROGRAM through the tunnel — hundreds of programs per call)."""
    logits = gpt.forward(params, ids, cfg, dtype=dtype,
                         lora=lora, lora_scale=lora_scale)
    return jnp.argmax(logits[0], axis=-1)


def seq2seq(ctx: LLMContext, input_ids: List[int]) -> List[int]:
    """Global-attention models (sort/palindrome): one forward over the
    input, argmax at every position."""
    ids = jnp.asarray([input_ids], jnp.int32)
    out = _seq2seq_forward(ctx.params, ctx.lora, ctx.lora_scale, ids,
                           ctx.cfg, ctx.dtype)
    return [int(t) for t in np.asarray(out)]


# =====================================================================
# denoise decode (reference: model.py:581-638)
# =====================================================================

@partial(jax.jit, static_argnames=("cfg", "dtype", "top_k"))
def _denoise_round(params, lora, lora_scale, x, masked, key, temperature,
                   confidence_threshold, cfg, dtype, top_k):
    """One unmasking round, module-level so the jit cache survives across
    denoise_generate calls (params as arguments, never a closure —
    CLAUDE.md: closures bake weights into the program as constants)."""
    logits = gpt.forward(params, x, cfg, dtype=dtype,
                         lora=lora, lora_scale=lora_scale)
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temperature, -1)
    tk_probs, tk_idx = jax.lax.top_k(probs, top_k)
    conf = jnp.sum(tk_probs, axis=-1)
    decode_mask = jnp.logical_and(conf >= confidence_threshold, masked)
    # at least one: unmask the most confident masked position
    none_hit = jnp.logical_not(jnp.any(decode_mask))
    masked_conf = jnp.where(masked, conf, -jnp.inf)
    best = jnp.argmax(masked_conf, axis=-1)
    fallback = jnp.zeros_like(decode_mask).at[0, best[0]].set(
        masked[0, best[0]])
    decode_mask = jnp.where(none_hit, fallback, decode_mask)
    # sample from renormalized top-k
    key, sub = jax.random.split(key)
    tk_norm = tk_probs / jnp.sum(tk_probs, axis=-1, keepdims=True)
    draw = jax.random.categorical(sub, jnp.log(jnp.maximum(tk_norm, 1e-38)))
    sampled = jnp.take_along_axis(tk_idx, draw[..., None], axis=-1)[..., 0]
    x = jnp.where(decode_mask, sampled, x)
    masked = jnp.logical_and(masked, jnp.logical_not(decode_mask))
    return x, masked, key


def denoise_generate(ctx: LLMContext, prompt_ids: List[int],
                     max_new_tokens: int, temperature: float = 1.0,
                     top_k: int = 8, confidence_threshold: float = 0.9,
                     mask_token_id: int = 7,
                     callback: Optional[Callable[[np.ndarray], Any]] = None
                     ) -> List[int]:
    """Confidence-thresholded iterative unmasking over fixed-size blocks.

    Keeps the reference's loop structure (fill a block with mask tokens,
    repeatedly decode every still-masked position whose top-k confidence
    crosses the threshold, at least one per round) but runs each round as
    one batched device step.
    """
    cfg = ctx.cfg
    block = cfg.block_size
    all_tokens = list(prompt_ids)
    # conditioning context keeps the prompt TAIL and always leaves at
    # least one position to unmask (a full-block prompt previously gave
    # block_len = 0 -> infinite loop; a longer one, a broadcast error)
    prompt_len = min(len(prompt_ids), block - 1)

    key = jax.random.PRNGKey(ctx.random_seed)
    # generate max_new_tokens NEW tokens beyond the (full) prompt
    target = len(all_tokens) + max_new_tokens
    while len(all_tokens) < target:
        block_len = min(block - prompt_len, target - len(all_tokens))
        x = np.full((1, block), mask_token_id, np.int32)
        if prompt_len:
            x[0, :prompt_len] = all_tokens[-prompt_len:]
        x = jnp.asarray(x)
        masked = jnp.zeros((1, block), jnp.bool_).at[
            0, prompt_len:prompt_len + block_len].set(True)
        while bool(jnp.any(masked)):
            x, masked, key = _denoise_round(
                ctx.params, ctx.lora, ctx.lora_scale, x, masked, key,
                jnp.float32(temperature), jnp.float32(confidence_threshold),
                cfg, ctx.dtype, top_k)
            if callback:
                callback(np.asarray(x))
        all_tokens.extend(int(t) for t in
                          np.asarray(x)[0, prompt_len:prompt_len + block_len])
    return all_tokens
