"""Continuous batching: many independent generation streams share one
batched decode step.

The reference serves ONE stream per process, pacing a single session off
the WebSocket writable callback (reference: infer/main_wss.c:62-108).
TPU-native replacement: a slot-based engine — the KV cache carries a
batch axis, every slot advances one token per `step()` regardless of
where each stream is in its sequence (per-slot positions), and slots
attach/detach without recompiling (shapes are static; idle slots compute
garbage that is ignored).  Batch-1 decode leaves the MXU idle, so extra
slots are nearly free until HBM bandwidth saturates.

Per-slot sampler parameters (temperature/top_p/repetition_penalty) ride
as (B,) vectors through the jitted step; greedy slots are selected with a
where() on temperature==0 instead of a static flag.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from nano_tpu.models import gpt
from nano_tpu.infer import engine as eng
from nano_tpu.ops import sampling


def _sample_rows(key, logits, temperature, top_p, top_k, greedy=False):
    """Per-slot sampling over penalized (B, V) logits -> (key', tok).

    Shared by _batched_step and _batched_spec_step so the key-split
    order and op sequence stay identical — the spec engine's
    bit-identical-stochastic-slots guarantee rests on this.

    `greedy` (static) compiles the every-active-slot-greedy burst to a
    bare argmax: the traced path pays a 152k-vocab top_k sort, a full-
    vocab logsumexp AND a full-vocab categorical (B*V gumbel draws) per
    step even when every temperature is 0.  The key still advances by
    the exact same split so the engine's key trajectory — and therefore
    any later stochastic slot's draws — is bit-identical either way.
    """
    greedy_tok = jnp.argmax(logits, axis=-1)
    if greedy:
        return jax.random.split(key, 3)[0], greedy_tok.astype(jnp.int32)
    window = min(top_k if top_k else eng.NUCLEUS_WINDOW, logits.shape[-1])
    l = logits / jnp.maximum(temperature, 1e-6)[:, None]
    top_logits, top_idx = jax.lax.top_k(l, window)
    if top_k:
        # user top-k: renormalize within the window (reference semantics)
        probs = jax.nn.softmax(top_logits, axis=-1)
    else:
        # 128-window is an implementation detail: TRUE probabilities via
        # the full-vocab logsumexp so the top_p cut matches a full-vocab
        # nucleus (same fix as engine._sample_windowed)
        lse = jax.nn.logsumexp(l, axis=-1, keepdims=True)
        probs = jnp.exp(top_logits - lse)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) <= top_p[:, None]
    use_topp = jnp.logical_and(top_p > 0.0, top_p < 1.0)[:, None]
    probs = jnp.where(jnp.logical_or(keep, jnp.logical_not(use_topp)),
                      probs, 0.0)
    key_out, sub, sub2 = jax.random.split(key, 3)
    draw = jax.random.categorical(sub, jnp.log(jnp.maximum(probs, 1e-38)),
                                  axis=-1)
    sampled = jnp.take_along_axis(top_idx, draw[:, None], axis=-1)[:, 0]
    # exact plain-multinomial for slots with top_p outside (0,1): a full-
    # vocab categorical needs no sort, so those slots are not restricted
    # to the NUCLEUS_WINDOW (per-slot settings vary, hence where-select)
    if not top_k:
        full_draw = jax.random.categorical(sub2, l, axis=-1)
        sampled = jnp.where(use_topp[:, 0], sampled, full_draw)
    tok = jnp.where(temperature <= 0.0, greedy_tok, sampled
                    ).astype(jnp.int32)
    return key_out, tok


@partial(jax.jit, static_argnames=("cfg", "dtype", "top_k", "attn_len",
                                   "greedy"))
def _batched_step(params, lora, lora_scale, tok, pos, cache, seen, key,
                  temperature, top_p, rep_penalty, cfg, dtype, top_k,
                  attn_len=None, greedy=False):
    """One decode step for all B slots (per-slot positions + samplers)."""
    logits, cache = gpt.forward_decode_batched(
        params, tok, cache, pos, cfg, dtype=dtype,
        lora=lora, lora_scale=lora_scale, attn_len=attn_len)
    logits = logits.astype(jnp.float32)
    logits = jnp.where(seen, logits / rep_penalty[:, None], logits)

    key_out, next_tok = _sample_rows(key, logits, temperature, top_p,
                                     top_k, greedy)
    seen = seen.at[jnp.arange(tok.shape[0]), next_tok].set(True)
    return next_tok, pos + 1, cache, seen, key_out


def _select_adapters(lora, lora_scale, lora_idx):
    """Per-slot adapter gather for batched multi-adapter serving: stacked
    registry leaves (A, L, in, r) -> per-slot (L, B, in, r) selections
    (the layer scan slices axis 0; _lora_delta sees (B, in, r)), scales
    (A,) -> (B,).  Runs ONCE per dispatched burst — loop-invariant
    across the inner scan."""
    sel = jax.tree.map(lambda s: jnp.moveaxis(s[lora_idx], 0, 1), lora)
    return sel, lora_scale[lora_idx]


@partial(jax.jit, static_argnames=("cfg", "dtype", "top_k", "n_steps",
                                   "attn_len", "greedy"))
def _batched_scan(params, lora, lora_scale, tok, pos, cache, seen, key,
                  temperature, top_p, rep_penalty, cfg, dtype, top_k,
                  n_steps, attn_len=None, lora_idx=None, greedy=False):
    """n_steps batched decode steps in ONE dispatched program.

    Multi-step scheduling: the per-dispatch fixed cost (30 ms through
    this setup's TPU tunnel; ~0.1 ms on directly-attached chips) is paid
    once per burst instead of once per token.  Streams that hit a stop
    token mid-burst decode a few garbage tokens that the host discards.

    `attn_len` (static) is the per-burst cache-length bucket: attention
    reads only the first attn_len cache rows.  One compiled program per
    (n_steps, attn_len) pair — buckets are powers of two, so at most
    log2(T) variants exist.

    `lora_idx` (B,) switches `lora`/`lora_scale` to stacked-registry
    semantics: each slot decodes with its own adapter (see
    _select_adapters).
    """
    if lora_idx is not None:
        lora, lora_scale = _select_adapters(lora, lora_scale, lora_idx)

    def body(carry, _):
        tok, pos, cache, seen, key = carry
        tok, pos, cache, seen, key = _batched_step(
            params, lora, lora_scale, tok, pos, cache, seen, key,
            temperature, top_p, rep_penalty, cfg, dtype, top_k, attn_len,
            greedy)
        return (tok, pos, cache, seen, key), tok

    (tok, pos, cache, seen, key), toks = jax.lax.scan(
        body, (tok, pos, cache, seen, key), None, length=n_steps)
    return toks, tok, pos, cache, seen, key


@partial(jax.jit, static_argnames=("cfg", "dtype", "top_k", "k",
                                   "attn_len", "greedy"))
def _batched_spec_step(params, lora, lora_scale, tok, pos, cache, seen,
                       key, hist, temperature, top_p, rep_penalty,
                       spec_ok, cfg, dtype, top_k, k, attn_len=None,
                       greedy=False):
    """One speculative decode step for all B slots.

    Eligible slots (spec_ok: greedy, any repetition penalty — the
    penalty is applied per verify row over seen + the draft prefix,
    bit-exact vs sequential penalized greedy, see
    speculative.prefix_masks) draft k tokens by per-slot n-gram prompt
    lookup and emit 1..k+1 verified tokens; ineligible (stochastic)
    slots run the EXACT plain sampling machinery on their row-0 logits
    and emit 1 (their draft rows compute garbage that the next step's
    cache writes cover — infer/speculative.py's overwrite invariant,
    per slot).  The key-split order matches _batched_step, and an
    ineligible slot advances one position per step exactly as there, so
    its token stream is bit-identical to the plain engine's.

    Returns (next_tok, pos', cache, seen, key', hist', emit (B, k+1),
    n_out (B,)): the first n_out[b] entries of emit[b] are slot b's
    emitted tokens this step.
    """
    from nano_tpu.infer import speculative

    B = tok.shape[0]
    drafts = speculative.batched_ngram_draft(hist, pos, k)   # (B, k)
    ids = jnp.concatenate([tok[:, None], drafts], axis=1)    # (B, k+1)
    logits_all, cache = gpt.forward_spec_batched(
        params, ids, cache, pos, cfg, dtype=dtype,
        lora=lora, lora_scale=lora_scale, attn_len=attn_len)
    logits_all = logits_all.astype(jnp.float32)
    # per-(slot, row) repetition-penalty masks: seen | draft prefix
    masks = jax.vmap(speculative.prefix_masks)(drafts, seen)  # (B,k+1,V)
    pen = jnp.where(masks, logits_all / rep_penalty[:, None, None],
                    logits_all)
    g = jnp.argmax(pen, axis=-1).astype(jnp.int32)           # (B, k+1)
    match = drafts == g[:, :k]
    n_acc = jnp.argmin(
        jnp.concatenate([match, jnp.zeros((B, 1), jnp.bool_)], axis=1),
        axis=1)

    # plain per-slot sampling on row 0 (shared helper => same ops/order
    # and key-split sequence as _batched_step)
    if greedy:
        # every active slot is greedy: row 0's penalized argmax is
        # already g[:, 0] (prefix_masks row 0 == seen).  Key advances by
        # the same split as _sample_rows — trajectory unchanged.
        key_out, row0_tok = jax.random.split(key, 3)[0], g[:, 0]
    else:
        logits = jnp.where(seen, logits_all[:, 0] / rep_penalty[:, None],
                           logits_all[:, 0])
        key_out, row0_tok = _sample_rows(key, logits, temperature, top_p,
                                         top_k)

    n_out = jnp.where(spec_ok, n_acc + 1, 1).astype(jnp.int32)
    emit = jnp.where(spec_ok[:, None], g,
                     jnp.concatenate([row0_tok[:, None], g[:, 1:]], axis=1))
    next_tok = jnp.where(
        spec_ok,
        jnp.take_along_axis(g, n_acc[:, None], axis=1)[:, 0],
        row0_tok).astype(jnp.int32)

    # history rows: positions [pos+1, pos+k+1] get this round's inputs-
    # to-be (entries past n_out are covered by the next round's write)
    bidx = jnp.arange(B)[:, None]
    posm = pos[:, None] + 1 + jnp.arange(k + 1)[None, :]
    hist = hist.at[bidx, posm].set(emit)
    # seen gains the emitted tokens: the first n_out rows of g for spec
    # slots, row0_tok for stochastic slots (same op order as plain)
    V = seen.shape[-1]
    valid = jnp.arange(k + 1)[None, :] < n_out[:, None]
    acc = jnp.any((g[:, :, None] == jnp.arange(V)[None, None, :])
                  & valid[:, :, None], axis=1)
    seen_upd = seen.at[jnp.arange(B), row0_tok].set(True)
    seen = jnp.where(spec_ok[:, None], seen | acc, seen_upd)
    return next_tok, pos + n_out, cache, seen, key_out, hist, emit, n_out


@partial(jax.jit, static_argnames=("cfg", "dtype", "top_k", "k", "n_steps",
                                   "attn_len", "greedy"))
def _batched_spec_scan(params, lora, lora_scale, tok, pos, cache, seen,
                       key, hist, temperature, top_p, rep_penalty,
                       spec_ok, cfg, dtype, top_k, k, n_steps,
                       attn_len=None, lora_idx=None, greedy=False):
    """n_steps speculative batched steps in ONE dispatched program;
    emits (n_steps, B, k+1) token slabs + (n_steps, B) valid counts.
    `lora_idx`: per-slot adapters, as in _batched_scan."""
    if lora_idx is not None:
        lora, lora_scale = _select_adapters(lora, lora_scale, lora_idx)

    def body(carry, _):
        tok, pos, cache, seen, key, hist = carry
        tok, pos, cache, seen, key, hist, emit, n_out = _batched_spec_step(
            params, lora, lora_scale, tok, pos, cache, seen, key, hist,
            temperature, top_p, rep_penalty, spec_ok, cfg, dtype, top_k,
            k, attn_len, greedy)
        return (tok, pos, cache, seen, key, hist), (emit, n_out)

    (tok, pos, cache, seen, key, hist), (emits, n_outs) = jax.lax.scan(
        body, (tok, pos, cache, seen, key, hist), None, length=n_steps)
    return emits, n_outs, tok, pos, cache, seen, key, hist


@partial(jax.jit, static_argnames=("new_len",))
def _grow_cache(cache: gpt.KVCache, new_len: int) -> gpt.KVCache:
    """Zero-extend the cache's sequence axis to new_len (capacity
    bucketing).  One dispatch; existing rows are preserved in place."""
    def pad(x):
        if x is None:
            return None
        w = [(0, 0)] * x.ndim
        w[2] = (0, new_len - x.shape[2])
        return jnp.pad(x, w)
    return gpt.KVCache(k=pad(cache.k), v=pad(cache.v),
                       k_scale=pad(cache.k_scale),
                       v_scale=pad(cache.v_scale))


@dataclass
class Slot:
    """Slot lifecycle: FREE -> attached (claimed by add(), survives the
    end of decoding) -> FREE again only at the handler's explicit
    release().  `active` means "currently decoding"; a finished stream has
    active=False but attached=True, so a concurrent add() can never alias
    a slot whose consumer is still draining its queue."""
    active: bool = False
    attached: bool = False
    prompt_len: int = 0
    generated: int = 0
    max_new_tokens: int = 0
    finished_reason: Optional[str] = None
    sink: Optional[object] = None   # consumer's queue, set atomically in
    # add() — burst results are delivered to the sink captured UNDER THE
    # ENGINE LOCK with the tokens, so a late delivery can never reach a
    # queue that belongs to a different (newer) stream


class BurstResult(Dict[int, list]):
    """{slot: [tokens...]} plus per-slot end flags and sinks captured
    atomically under the engine lock — consumers must use `ended` and
    `sinks` instead of re-reading live slot state (a new stream may have
    re-claimed the slot by the time they look)."""

    def __init__(self, toks: Dict[int, list], ended: Dict[int, bool],
                 sinks: Optional[Dict[int, object]] = None):
        super().__init__(toks)
        self.ended = ended
        self.sinks = sinks or {}


class BatchedEngine:
    """Slot-based continuous batching over one LLMContext.

    `adapters` ({name: lora .bin path}) enables BATCHED multi-adapter
    serving: slots running different LoRA variants decode in the SAME
    dispatched program — each slot's adapter is gathered from a stacked
    registry inside the scan (gpt._lora_delta per-slot branch).  Index 0
    of the registry is the bare base model (zero adapter, scale 0).
    Beyond-parity: the reference hot-swaps ONE adapter per process
    (infer/main_wasm.c)."""

    def __init__(self, ctx: "eng.LLMContext", n_slots: int = 8,
                 adapters: Optional[Dict[str, str]] = None):
        self.ctx = ctx
        self.n_slots = n_slots
        cfg = ctx.cfg
        T = ctx.max_seq_len
        self.adapter_idx = np.zeros(n_slots, np.int32)
        self.adapter_ids: Dict[Optional[str], int] = {None: 0}
        self.lora_stack = None        # pytree, leaves (A, L, in, r)
        self.lora_scales = None       # (A,) f32
        # per-adapter UNSTACKED pytrees for the batch-1 prefill path
        self._adapter_prefill = {0: (ctx.lora, ctx.lora_scale)}
        if adapters:
            if ctx.lora is not None:
                raise ValueError("use either a base-attached LoRA or "
                                 "named adapters, not both")
            self._build_adapter_stack(adapters)
        # CACHE CAPACITY BUCKETING: allocate the cache at a small pow2
        # and grow it as streams advance.  The decode scan cannot alias
        # per-slot scatter updates through the layer scan, so XLA copies
        # the WHOLE cache buffer every layer every step — at the 0.6B
        # shape a full 1024-row 32-slot int8 cache costs ~6-7 ms/step of
        # pure dead-tail copying (measured: right-sizing 1024 -> 512 took
        # a 32-slot step from 13.7 to 7.9 ms, -> 128 to 3.7 ms).  Growth
        # is one cheap pad dispatch per pow2 boundary; capacity resets
        # when the engine goes fully idle.
        self._bucketed = eng._bucketing_enabled()
        self.cache = ctx.new_cache(
            n_slots, seq_len=(self._min_cache_len() if self._bucketed
                              else None))
        self.pos = jnp.zeros((n_slots,), jnp.int32)
        self.tok = jnp.zeros((n_slots,), jnp.int32)
        self.seen = jnp.zeros((n_slots, cfg.vocab_size), jnp.bool_)
        self.key = jax.random.PRNGKey(ctx.random_seed)
        self.temperature = np.full(n_slots, 1.0, np.float32)
        self.top_p = np.full(n_slots, 0.8, np.float32)
        self.rep_penalty = np.full(n_slots, 1.0, np.float32)
        self.slots: List[Slot] = [Slot() for _ in range(n_slots)]
        self.lock = threading.Lock()   # one device mutator at a time
        # per-slot token history for speculative serving (ctx.spec_k > 0):
        # drafts come from each slot's own stream.  History contents only
        # affect acceptance (emitted tokens always come from the verify
        # logits), so stale rows are a perf issue, never a correctness one.
        self.hist = (jnp.zeros((n_slots, T), jnp.int32)
                     if ctx.spec_k > 0 else None)
        # serving-side spec adaptation (mirrors Session._spec_adapt):
        # the draft length k is STATIC per compiled scan, so it ramps
        # engine-wide in pow2 buckets; parking is PER-SLOT via the
        # spec_ok operand (dynamic — no recompile).  A slot whose burst
        # accepted nothing parks for a backoff-doubled number of bursts;
        # on free text this keeps slots on the plain path instead of
        # paying (k+1)-row verifies for ~1 token/round (PERF.md r4).
        self._spec_k_cur = 1
        self._spec_park = np.zeros(n_slots, np.int64)   # bursts left
        self._spec_park_len = np.ones(n_slots, np.int64)  # backoff, cap 8

    # ------------------------------------------------------------
    def _min_cache_len(self) -> int:
        return min(128, self.ctx.max_seq_len)

    def _cache_len(self) -> int:
        return self.cache.k.shape[2]

    def _ensure_capacity(self, need: int) -> None:
        """Grow the cache's sequence capacity to cover `need` rows
        (pow2-bucketed, capped at max_seq_len).  Caller holds the lock."""
        if not self._bucketed:
            return
        want = min(eng._bucket(max(need, 1),
                               minimum=self._min_cache_len()),
                   self.ctx.max_seq_len)
        if want > self._cache_len():
            self.cache = _grow_cache(self.cache, want)

    # ------------------------------------------------------------
    def _build_adapter_stack(self, adapters: Dict[str, str]) -> None:
        """Load + rank-pad the named adapters into one stacked registry.
        Ranks may differ: smaller adapters zero-pad to the max rank
        (zero columns in A contribute nothing; each keeps its OWN
        alpha/rank scale)."""
        from nano_tpu.io import binfmt
        ctx = self.ctx
        loaded = []
        for name, path in adapters.items():
            bl = binfmt.read_lora(path, ctx.cfg)
            lora = jax.tree.map(lambda x: jnp.asarray(x, ctx.dtype),
                                bl.lora)
            loaded.append((name, lora, bl.alpha / bl.rank,
                           bl.lora["wq_a"].shape[-1]))
        rmax = max(r for _, _, _, r in loaded)

        def pad(key, leaf, r):
            if r == rmax:
                return leaf
            w = [(0, 0)] * leaf.ndim
            w[-1 if key.endswith("_a") else -2] = (0, rmax - r)
            return jnp.pad(leaf, w)

        padded = [{k: pad(k, v, r) for k, v in lora.items()}
                  for _, lora, _, r in loaded]
        if ctx.device is not None:
            # commit to the replica's device — uncommitted leaves would
            # re-transfer from device 0 on EVERY dispatched burst under
            # --replicas (params/cache are committed, the registry must
            # match)
            padded = jax.tree.map(
                lambda x: jax.device_put(x, ctx.device), padded)
        zero = jax.tree.map(jnp.zeros_like, padded[0])   # registry row 0
        self.lora_stack = jax.tree.map(lambda *xs: jnp.stack(xs),
                                       zero, *padded)
        self.lora_scales = jnp.asarray(
            [0.0] + [s for _, _, s, _ in loaded], jnp.float32)
        if ctx.device is not None:
            self.lora_stack = jax.tree.map(
                lambda x: jax.device_put(x, ctx.device), self.lora_stack)
            self.lora_scales = jax.device_put(self.lora_scales, ctx.device)
        for i, (name, _, s, _) in enumerate(loaded):
            self.adapter_ids[name] = i + 1
            self._adapter_prefill[i + 1] = (padded[i], s)

    def _lora_args(self):
        """(lora, lora_scale, lora_idx) for the batched scans: the
        stacked registry + per-slot indices when adapters are served,
        else the context's single (possibly None) adapter."""
        if self.lora_stack is not None:
            return (self.lora_stack, self.lora_scales,
                    jnp.asarray(self.adapter_idx))
        return self.ctx.lora, self.ctx.lora_scale, None

    # ------------------------------------------------------------
    def warmup(self, n_steps: int = 1) -> int:
        """Pre-compile every program variant serving can hit — the
        prefill buckets and the (n_steps, attn_len) decode-scan buckets —
        on throwaway buffers, so no client pays a multi-second XLA
        compile at first contact.  jit caches key on shapes/dtypes and
        static args only, so warming with dummy values covers the real
        calls.  Returns the number of programs compiled."""
        ctx = self.ctx
        cfg = ctx.cfg
        T = ctx.max_seq_len
        n = 0
        pads = []                            # prefill buckets: pow2 < T,
        pad = eng._bucket(1)                 # plus T itself (add() clamps
        while pad < T:                       # _bucket(n) to max_seq_len,
            pads.append(pad)                 # which may not be a pow2)
            pad *= 2
        pads.append(T)
        for pad in pads:
            tmp = ctx.new_cache(1, seq_len=pad)
            eng._prefill(ctx.params, ctx.lora, ctx.lora_scale,
                         jnp.zeros((1, pad), jnp.int32), tmp, cfg,
                         ctx.dtype, last_idx=jnp.int32(0))
            n += 1
            if self.lora_stack is not None:
                # adapter streams prefill with an UNSTACKED adapter
                # pytree — a different trace than lora=None; every named
                # adapter shares one structure (rank-padded), so warming
                # any one covers them all
                plora, pscale = self._adapter_prefill[1]
                eng._prefill(ctx.params, plora, pscale,
                             jnp.zeros((1, pad), jnp.int32), tmp, cfg,
                             ctx.dtype, last_idx=jnp.int32(0))
                n += 1
        caps = []                            # cache CAPACITY buckets:
        b = self._min_cache_len()            # the cache is allocated
        while b < T and self._bucketed:      # right-sized and grown as
            caps.append(b)                   # streams advance, so the
            b *= 2                           # program keys on capacity
        caps.append(T)
        zs = jnp.zeros((self.n_slots,), jnp.int32)
        seen = jnp.zeros((self.n_slots, cfg.vocab_size), jnp.bool_)
        f = jnp.zeros((self.n_slots,), jnp.float32)
        wl, ws, wi = self._lora_args()
        for cap in caps:
            cache = ctx.new_cache(self.n_slots, seq_len=cap)
            # both sampler variants: all-greedy bursts compile to a bare
            # argmax (static `greedy`), mixed traffic to the full path.
            # attn_len=None covers the steady state (capacity == bucket);
            # transient attn_len<cap programs (big-capacity leftovers
            # after releases) compile lazily if hit.
            for greedy in (True, False):
                _batched_scan(ctx.params, wl, ws, zs, zs,
                              cache, seen, jax.random.PRNGKey(0), f,
                              f + 0.8, f + 1.0, cfg, ctx.dtype,
                              ctx.sampler.top_k, n_steps, None,
                              lora_idx=wi, greedy=greedy)
                n += 1
                if self.hist is not None:
                    _batched_spec_scan(
                        ctx.params, wl, ws, zs, zs, cache,
                        seen, jax.random.PRNGKey(0),
                        jnp.zeros((self.n_slots, T), jnp.int32), f,
                        f + 0.8, f + 1.0,
                        jnp.zeros((self.n_slots,), jnp.bool_), cfg,
                        ctx.dtype, ctx.sampler.top_k, ctx.spec_k, n_steps,
                        None, lora_idx=wi, greedy=greedy)
                    n += 1
        return n

    # ------------------------------------------------------------
    def free_slot(self) -> Optional[int]:
        for i, s in enumerate(self.slots):
            if not s.active and not s.attached:
                return i
        return None

    @property
    def n_active(self) -> int:
        return sum(s.active for s in self.slots)

    # ------------------------------------------------------------
    def add(self, prompt_ids: List[int], max_new_tokens: int = 256,
            temperature: float = 1.0, top_p: float = 0.8,
            repetition_penalty: float = 1.1,
            sink: Optional[object] = None,
            adapter: Optional[str] = None) -> Optional[tuple]:
        """Attach a stream.  Returns (slot, first_token or None-if-stopped),
        or None when no slot is free (caller queues/retries).

        The engine lock is held only to claim the slot and to splice the
        prefilled rows in — the prefill itself (the expensive part, plus a
        possible bucket compile) runs unlocked, so joining never stalls
        active streams for more than the splice."""
        ctx = self.ctx
        cfg = ctx.cfg
        if adapter not in self.adapter_ids:
            raise ValueError(f"unknown adapter: {adapter!r}")
        aidx = self.adapter_ids[adapter]
        with self.lock:
            slot = self.free_slot()
            if slot is None:
                return None
            st = self.slots[slot]
            st.attached = True         # reserved; unclaimable until release
            st.active = False
        try:
            if not prompt_ids:
                # BOS-seed empty prompts, matching Session (engine.py);
                # without this the first token would be sampled from a
                # padding position's logits
                prompt_ids = [getattr(ctx.tokenizer, "bos_id", 0)]
            n = len(prompt_ids)
            if n >= ctx.max_seq_len:
                # keep the TAIL, matching Session (infer/engine.py)
                prompt_ids = prompt_ids[-(ctx.max_seq_len - 1):]
                n = len(prompt_ids)

            # prefill on a bucket-sized batch-1 staging cache (not a full
            # max_seq_len throwaway), then scatter the rows into the slot
            pad = min(eng._bucket(n), ctx.max_seq_len)
            ids = np.zeros((1, pad), np.int32)
            ids[0, :n] = prompt_ids
            tmp = ctx.new_cache(1, seq_len=pad)
            # prefill with this stream's adapter (batch-1: the unstacked
            # pytree, no gather needed)
            plora, pscale = self._adapter_prefill[aidx]
            logits, tmp, _ = eng._prefill(
                ctx.params, plora, pscale,
                jnp.asarray(ids), tmp, cfg, ctx.dtype,
                last_idx=jnp.int32(n - 1))
            seen_row = sampling.seen_mask_from_ids(
                jnp.asarray(ids), jnp.asarray([n]), cfg.vocab_size)[0]
            last = logits[0, 0].astype(jnp.float32)
            last = jnp.where(seen_row, last / repetition_penalty, last)
        except BaseException:
            with self.lock:
                st.attached = False
            raise

        try:
            return self._attach_prefilled(
                st, slot, n, pad, tmp, seen_row, last, temperature, top_p,
                repetition_penalty, max_new_tokens, sink,
                prompt_ids=prompt_ids, adapter_idx=aidx)
        except BaseException:
            with self.lock:
                st.attached = False
                st.active = False
            raise

    def _attach_prefilled(self, st, slot, n, pad, tmp, seen_row, last,
                          temperature, top_p, repetition_penalty,
                          max_new_tokens, sink=None, prompt_ids=None,
                          adapter_idx: int = 0):
        ctx = self.ctx
        with self.lock:
            self.adapter_idx[slot] = adapter_idx
            # the spliced prompt rows (and the first decode write at n)
            # must fit the current capacity
            self._ensure_capacity(max(pad, n + 1))
            self.cache = gpt.KVCache(
                k=self.cache.k.at[:, slot, :pad].set(tmp.k[:, 0]),
                v=self.cache.v.at[:, slot, :pad].set(tmp.v[:, 0]),
                k_scale=(None if tmp.k_scale is None else
                         self.cache.k_scale.at[:, slot, :pad].set(
                             tmp.k_scale[:, 0])),
                v_scale=(None if tmp.v_scale is None else
                         self.cache.v_scale.at[:, slot, :pad].set(
                             tmp.v_scale[:, 0])))

            # windowed nucleus sampling (never a full-vocab sort — see
            # engine.NUCLEUS_WINDOW); self.key is engine state, so under lock
            self.key, first_arr = eng._sample_windowed(
                self.key, last[None, :], jnp.float32(temperature),
                jnp.float32(top_p), ctx.sampler.top_k, temperature <= 0.0,
                exact=(not ctx.sampler.top_k) and not (0.0 < top_p < 1.0))
            first = int(first_arr[0])
            seen_row = seen_row.at[first].set(True)

            self.pos = self.pos.at[slot].set(n)
            self.tok = self.tok.at[slot].set(first)
            self.seen = self.seen.at[slot].set(seen_row)
            if self.hist is not None and prompt_ids is not None:
                row = np.zeros((ctx.max_seq_len,), np.int32)
                row[:n] = prompt_ids
                row[n] = first
                self.hist = self.hist.at[slot].set(jnp.asarray(row))
                self._spec_park[slot] = 0        # fresh stream: re-probe
                self._spec_park_len[slot] = 1
            self.temperature[slot] = temperature
            self.top_p[slot] = top_p
            self.rep_penalty[slot] = repetition_penalty

            st.active = True
            st.prompt_len = n
            st.generated = 0
            st.max_new_tokens = max_new_tokens
            st.finished_reason = None
            st.sink = sink

            if first in ctx.stop_tokens:
                st.active = False
                st.finished_reason = "stop"
                return slot, None
            st.generated = 1
            if max_new_tokens <= 1:
                st.active = False
                st.finished_reason = "length"
            return slot, first

    def _spec_adapt_burst(self, unparked: List[int], n_outs: np.ndarray,
                          k: int) -> None:
        """Post-burst controller (mirrors Session._spec_adapt at burst
        granularity).  n_outs is (n_steps, B) tokens emitted per round;
        acceptance per round is n_out - 1.

          * a slot whose whole burst accepted nothing parks for a
            backoff-doubled number of bursts (cap 8), reset on any
            acceptance;
          * the engine-wide k doubles (pow2, toward ctx.spec_k) when any
            slot fully accepted a round, else drops to the pow2 bucket
            of the best accepted run (floor 1).
        """
        best = 0
        for i in unparked:
            acc = int(n_outs[:, i].max()) - 1
            best = max(best, acc)
            if acc <= 0:
                self._spec_park[i] = self._spec_park_len[i]
                self._spec_park_len[i] = min(2 * self._spec_park_len[i], 8)
            else:
                self._spec_park_len[i] = 1
        if best >= k:
            self._spec_k_cur = min(2 * k, self.ctx.spec_k)
        else:
            self._spec_k_cur = 1 << (max(1, best).bit_length() - 1)

    def release(self, slot: int) -> None:
        """Return the slot to the free pool (consumer is done with it)."""
        with self.lock:
            self.slots[slot].active = False
            self.slots[slot].attached = False
            self.slots[slot].sink = None
            self.adapter_idx[slot] = 0
            # fully idle: reset the cache capacity (positions only grow
            # while streams live, so this is the one safe shrink point —
            # a long-lived engine otherwise converges to max_seq_len and
            # keeps paying the dead-tail copy forever)
            if (self._bucketed
                    and not any(s.active or s.attached for s in self.slots)
                    and self._cache_len() > self._min_cache_len()):
                self.cache = self.ctx.new_cache(
                    self.n_slots, seq_len=self._min_cache_len())

    # ------------------------------------------------------------
    def _consume(self, toks_2d: np.ndarray) -> BurstResult:
        """Host-side slot bookkeeping over an (n_steps, B) token burst."""
        n_steps = toks_2d.shape[0]
        return self._consume_lists(
            {i: [int(toks_2d[k, i]) for k in range(n_steps)]
             for i, st in enumerate(self.slots) if st.active})

    def _consume_lists(self, slot_tokens: Dict[int, list]) -> BurstResult:
        """Slot bookkeeping over per-slot candidate token lists.

        Returns a BurstResult {slot: [tokens...]} with per-slot `ended`
        flags; tokens after a stop token (or past the length limits) are
        discarded.  The flags are the ONLY safe end-of-stream signal — by
        the time a consumer looks at live slot state, the slot may
        already belong to a new stream.  The length cut uses
        prompt_len + generated (== the live sequence position + 1, same
        bound as Session's tail in infer/engine.py).
        """
        ctx = self.ctx
        out: Dict[int, list] = {}
        ended: Dict[int, bool] = {}
        sinks: Dict[int, object] = {}
        for i, st in enumerate(self.slots):
            if not st.active:
                continue
            sinks[i] = st.sink
            got: list = []
            for t in slot_tokens.get(i, []):
                if t in ctx.stop_tokens:
                    st.active = False
                    st.finished_reason = "stop"
                    break
                st.generated += 1
                got.append(t)
                if (st.generated >= st.max_new_tokens or
                        st.prompt_len + st.generated >= ctx.max_seq_len):
                    st.active = False
                    st.finished_reason = "length"
                    break
            out[i] = got
            ended[i] = not st.active
        return BurstResult(out, ended, sinks)

    def step_burst(self, n_steps: int = 1) -> BurstResult:
        """Advance every active slot up to n_steps tokens in one dispatch.

        Returns a BurstResult {slot: [tokens...]} whose `.ended[slot]`
        flags which streams finished during this burst (check
        slots[slot].finished_reason for why).  n_steps=1 is the classic
        per-token scheduler.
        """
        ctx = self.ctx
        with self.lock:
            if self.n_active == 0:
                return BurstResult({}, {}, {})
            # cache-length bucket for this burst: the attended prefix
            # must cover every ACTIVE stream through the whole burst.
            # Inactive slots compute garbage regardless; their stale pos
            # must not inflate the bucket.
            T = ctx.max_seq_len
            pos_np = np.asarray(self.pos)
            max_pos = max((int(pos_np[i]) for i, s in enumerate(self.slots)
                           if s.active), default=0)

            eligible = [i for i, s in enumerate(self.slots)
                        if s.active and self.temperature[i] <= 0.0]
            # static all-greedy specialization: compiles the burst's
            # sampler to a bare argmax (no 152k top_k sort / full-vocab
            # categorical per step).  Inactive slots compute garbage
            # either way; the key trajectory is identical, so a
            # stochastic slot joining later reproduces the same draws.
            greedy = all(self.temperature[i] <= 0.0
                         for i, s in enumerate(self.slots) if s.active)
            unparked = [i for i in eligible if self._spec_park[i] <= 0]
            any_spec = self.hist is not None and bool(unparked)
            if self.hist is not None:
                # parked slots sit out this burst via spec_ok and count
                # it toward their backoff
                for i in eligible:
                    if self._spec_park[i] > 0:
                        self._spec_park[i] -= 1
            if any_spec:
                # speculative burst: every step may advance a slot up to
                # k+1 positions, so the room/bucket math uses the worst
                # case; near the context end — or when no active slot is
                # spec-eligible (pure-sampling traffic would pay the
                # (k+1)-row verify for zero benefit) — fall back to the
                # plain scan (correct on a spec-touched cache: stale
                # draft rows sit past each slot's position and are
                # overwritten as it advances).  k ramps engine-wide in
                # pow2 buckets (static per compiled scan).
                k = max(1, min(self._spec_k_cur, ctx.spec_k))
                need = max_pos + n_steps * (k + 1) + 2
                if need <= T:
                    self._ensure_capacity(need)
                    C = self._cache_len()
                    # attn slicing only in bucketed mode (covers the
                    # big-capacity-leftover case; compiles lazily).
                    # NANO_TPU_DECODE_BUCKET=0 means full-cache
                    # attention — also what warmup() compiled.
                    attn_len = (min(C, eng._bucket(need, minimum=128))
                                if self._bucketed else None)
                    if attn_len is not None and attn_len >= C:
                        attn_len = None
                    spec_ok = jnp.asarray(
                        (self.temperature <= 0.0)
                        & np.asarray([self._spec_park[i] <= 0
                                      for i in range(self.n_slots)]))
                    bl, bs, bi = self._lora_args()
                    (emits, n_outs, self.tok, self.pos, self.cache,
                     self.seen, self.key, self.hist) = _batched_spec_scan(
                        ctx.params, bl, bs, self.tok,
                        self.pos, self.cache, self.seen, self.key,
                        self.hist, jnp.asarray(self.temperature),
                        jnp.asarray(self.top_p),
                        jnp.asarray(self.rep_penalty), spec_ok, ctx.cfg,
                        ctx.dtype, ctx.sampler.top_k, k, n_steps, attn_len,
                        lora_idx=bi, greedy=greedy)
                    emits = np.asarray(emits)
                    n_outs = np.asarray(n_outs)
                    self._spec_adapt_burst(unparked, n_outs, k)
                    return self._consume_lists(
                        {i: [int(emits[t, i, j]) for t in range(n_steps)
                             for j in range(int(n_outs[t, i]))]
                         for i, s in enumerate(self.slots) if s.active})

            need = 1 + n_steps + max_pos
            self._ensure_capacity(need)
            C = self._cache_len()
            attn_len = (min(C, eng._bucket(need, minimum=128))
                        if self._bucketed else None)
            if attn_len is not None and attn_len >= C:
                attn_len = None          # full cache — no slicing program
            bl, bs, bi = self._lora_args()
            toks, self.tok, self.pos, self.cache, self.seen, self.key = \
                _batched_scan(
                    ctx.params, bl, bs, self.tok, self.pos,
                    self.cache, self.seen, self.key,
                    jnp.asarray(self.temperature), jnp.asarray(self.top_p),
                    jnp.asarray(self.rep_penalty), ctx.cfg, ctx.dtype,
                    ctx.sampler.top_k, n_steps, attn_len, lora_idx=bi,
                    greedy=greedy)
            if self.hist is not None:
                # keep hist current through plain bursts too (all
                # eligible slots parked, or no spec room): a re-probe
                # drafting from stale history would always reject and
                # re-park — the Session-side park had the same bug.
                # Token at step t lands at stream position pos+1+t;
                # mode="drop" discards past-end writes.
                rows = jnp.arange(self.n_slots)[:, None]
                cols = (jnp.asarray(pos_np)[:, None] + 1
                        + jnp.arange(n_steps)[None, :])
                self.hist = self.hist.at[rows, cols].set(
                    jnp.transpose(toks), mode="drop")
            return self._consume(np.asarray(toks))

    def step(self) -> BurstResult:
        """Advance every active slot one device step.

        Returns the BurstResult {slot: [tokens...]}: exactly one token
        per surviving stream in plain mode; under speculative serving
        (ctx.spec_k > 0) an eligible slot may emit several verified
        tokens from the single step.  `.ended[slot]` flags streams that
        finished (stop token / length)."""
        return self.step_burst(1)
