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


@partial(jax.jit, static_argnames=("cfg", "dtype", "top_k", "attn_len"))
def _batched_step(params, lora, lora_scale, tok, pos, cache, seen, key,
                  temperature, top_p, rep_penalty, cfg, dtype, top_k,
                  attn_len=None):
    """One decode step for all B slots (per-slot positions + samplers)."""
    logits, cache = gpt.forward_decode_batched(
        params, tok, cache, pos, cfg, dtype=dtype,
        lora=lora, lora_scale=lora_scale, attn_len=attn_len)
    logits = logits.astype(jnp.float32)
    logits = jnp.where(seen, logits / rep_penalty[:, None], logits)

    greedy_tok = jnp.argmax(logits, axis=-1)

    window = min(top_k if top_k else eng.NUCLEUS_WINDOW, logits.shape[-1])
    l = logits / jnp.maximum(temperature, 1e-6)[:, None]
    top_logits, top_idx = jax.lax.top_k(l, window)
    probs = jax.nn.softmax(top_logits, axis=-1)
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

    next_tok = jnp.where(temperature <= 0.0, greedy_tok, sampled
                         ).astype(jnp.int32)
    seen = seen.at[jnp.arange(tok.shape[0]), next_tok].set(True)
    return next_tok, pos + 1, cache, seen, key_out


@partial(jax.jit, static_argnames=("cfg", "dtype", "top_k", "n_steps",
                                   "attn_len"))
def _batched_scan(params, lora, lora_scale, tok, pos, cache, seen, key,
                  temperature, top_p, rep_penalty, cfg, dtype, top_k,
                  n_steps, attn_len=None):
    """n_steps batched decode steps in ONE dispatched program.

    Multi-step scheduling: the per-dispatch fixed cost (30 ms through
    this setup's TPU tunnel; ~0.1 ms on directly-attached chips) is paid
    once per burst instead of once per token.  Streams that hit a stop
    token mid-burst decode a few garbage tokens that the host discards.

    `attn_len` (static) is the per-burst cache-length bucket: attention
    reads only the first attn_len cache rows.  One compiled program per
    (n_steps, attn_len) pair — buckets are powers of two, so at most
    log2(T) variants exist.
    """
    def body(carry, _):
        tok, pos, cache, seen, key = carry
        tok, pos, cache, seen, key = _batched_step(
            params, lora, lora_scale, tok, pos, cache, seen, key,
            temperature, top_p, rep_penalty, cfg, dtype, top_k, attn_len)
        return (tok, pos, cache, seen, key), tok

    (tok, pos, cache, seen, key), toks = jax.lax.scan(
        body, (tok, pos, cache, seen, key), None, length=n_steps)
    return toks, tok, pos, cache, seen, key


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
    """Slot-based continuous batching over one LLMContext."""

    def __init__(self, ctx: "eng.LLMContext", n_slots: int = 8):
        self.ctx = ctx
        self.n_slots = n_slots
        cfg = ctx.cfg
        T = ctx.max_seq_len
        self.cache = ctx.new_cache(n_slots)
        self.pos = jnp.zeros((n_slots,), jnp.int32)
        self.tok = jnp.zeros((n_slots,), jnp.int32)
        self.seen = jnp.zeros((n_slots, cfg.vocab_size), jnp.bool_)
        self.key = jax.random.PRNGKey(ctx.random_seed)
        self.temperature = np.full(n_slots, 1.0, np.float32)
        self.top_p = np.full(n_slots, 0.8, np.float32)
        self.rep_penalty = np.full(n_slots, 1.0, np.float32)
        self.slots: List[Slot] = [Slot() for _ in range(n_slots)]
        self.lock = threading.Lock()   # one device mutator at a time

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
        pad = eng._bucket(1)                 # smallest prefill bucket
        while pad <= T:                      # prefill buckets
            tmp = ctx.new_cache(1, seq_len=pad)
            eng._prefill(ctx.params, ctx.lora, ctx.lora_scale,
                         jnp.zeros((1, pad), jnp.int32), tmp, cfg,
                         ctx.dtype)
            n += 1
            pad *= 2
        buckets = []
        b = 128
        while b < T:                         # decode cache-length buckets
            buckets.append(b)
            b *= 2
        buckets.append(None)                 # full-T program
        cache = ctx.new_cache(self.n_slots)
        zs = jnp.zeros((self.n_slots,), jnp.int32)
        seen = jnp.zeros((self.n_slots, cfg.vocab_size), jnp.bool_)
        f = jnp.zeros((self.n_slots,), jnp.float32)
        for attn_len in buckets:
            _batched_scan(ctx.params, ctx.lora, ctx.lora_scale, zs, zs,
                          cache, seen, jax.random.PRNGKey(0), f, f + 0.8,
                          f + 1.0, cfg, ctx.dtype, ctx.sampler.top_k,
                          n_steps, attn_len)
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
            sink: Optional[object] = None) -> Optional[tuple]:
        """Attach a stream.  Returns (slot, first_token or None-if-stopped),
        or None when no slot is free (caller queues/retries).

        The engine lock is held only to claim the slot and to splice the
        prefilled rows in — the prefill itself (the expensive part, plus a
        possible bucket compile) runs unlocked, so joining never stalls
        active streams for more than the splice."""
        ctx = self.ctx
        cfg = ctx.cfg
        with self.lock:
            slot = self.free_slot()
            if slot is None:
                return None
            st = self.slots[slot]
            st.attached = True         # reserved; unclaimable until release
            st.active = False
        try:
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
            logits, tmp, _ = eng._prefill(
                ctx.params, ctx.lora, ctx.lora_scale,
                jnp.asarray(ids), tmp, cfg, ctx.dtype)
            seen_row = sampling.seen_mask_from_ids(
                jnp.asarray(ids), jnp.asarray([n]), cfg.vocab_size)[0]
            last = logits[0, n - 1].astype(jnp.float32)
            last = jnp.where(seen_row, last / repetition_penalty, last)
        except BaseException:
            with self.lock:
                st.attached = False
            raise

        try:
            return self._attach_prefilled(
                st, slot, n, pad, tmp, seen_row, last, temperature, top_p,
                repetition_penalty, max_new_tokens, sink)
        except BaseException:
            with self.lock:
                st.attached = False
                st.active = False
            raise

    def _attach_prefilled(self, st, slot, n, pad, tmp, seen_row, last,
                          temperature, top_p, repetition_penalty,
                          max_new_tokens, sink=None):
        ctx = self.ctx
        with self.lock:
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

    def release(self, slot: int) -> None:
        """Return the slot to the free pool (consumer is done with it)."""
        with self.lock:
            self.slots[slot].active = False
            self.slots[slot].attached = False
            self.slots[slot].sink = None

    # ------------------------------------------------------------
    def _consume(self, toks_2d: np.ndarray, pos: np.ndarray) -> BurstResult:
        """Host-side slot bookkeeping over an (n_steps, B) token burst.

        Returns a BurstResult {slot: [tokens...]} with per-slot `ended`
        flags; tokens after a stop token within the burst are discarded.
        The flags are the ONLY safe end-of-stream signal — by the time a
        consumer looks at live slot state, the slot may already belong to
        a new stream.
        """
        ctx = self.ctx
        n_steps = toks_2d.shape[0]
        out: Dict[int, list] = {}
        ended: Dict[int, bool] = {}
        sinks: Dict[int, object] = {}
        for i, st in enumerate(self.slots):
            if not st.active:
                continue
            sinks[i] = st.sink
            got: list = []
            for k in range(n_steps):
                t = int(toks_2d[k, i])
                if t in ctx.stop_tokens:
                    st.active = False
                    st.finished_reason = "stop"
                    break
                st.generated += 1
                got.append(t)
                if (st.generated >= st.max_new_tokens or
                        int(pos[i]) - (n_steps - 1 - k) + 1
                        >= ctx.max_seq_len):
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
            need = 1 + n_steps + max(
                (int(pos_np[i]) for i, s in enumerate(self.slots)
                 if s.active), default=0)
            attn_len = min(T, eng._bucket(need, minimum=128))
            if attn_len >= T:
                attn_len = None          # full cache — no slicing program
            toks, self.tok, self.pos, self.cache, self.seen, self.key = \
                _batched_scan(
                    ctx.params, ctx.lora, ctx.lora_scale, self.tok, self.pos,
                    self.cache, self.seen, self.key,
                    jnp.asarray(self.temperature), jnp.asarray(self.top_p),
                    jnp.asarray(self.rep_penalty), ctx.cfg, ctx.dtype,
                    ctx.sampler.top_k, n_steps, attn_len)
            return self._consume(np.asarray(toks), np.asarray(self.pos))

    def step(self) -> Dict[int, Optional[int]]:
        """Advance every active slot one token.

        Returns {slot: token} for streams that produced a token, and
        {slot: None} for streams that just finished (stop token / length).
        """
        burst = self.step_burst(1)
        out: Dict[int, Optional[int]] = {}
        for slot, toks in burst.items():
            out[slot] = toks[0] if toks else None
        return out
