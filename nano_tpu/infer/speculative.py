"""Self-speculative greedy decoding — n-gram prompt-lookup drafts,
verified k+1 tokens at a time, entirely on device.

Measured fact this exploits (PERF.md): batch-1 decode on this TPU is
per-op-latency-bound — a (k+1)-token forward costs nearly the same wall
time as a 1-token forward (k+1 <= 8 rides the MXU's sublane padding for
free).  So drafting k likely-next tokens and verifying them in ONE
forward emits 1..k+1 tokens per step at ~1 step's cost.  Drafts come
from the sequence itself (the "prompt lookup" scheme: find the latest
earlier occurrence of the current 3-/2-gram and propose its
continuation), so there is no draft model, no extra weights, and
acceptance is exact token equality against the argmax.

Parity scope (measured, round 4): every emitted token is the argmax of
a TRUE forward of the model over the TRUE prefix — but that forward is
(1, k+1)-shaped, and XLA rounds a (1, k+1) program differently than the
single-token decode program (different tiling/fusion), so on real
trained models the two streams can diverge at near-tie argmaxes: the
56M trained model diverged from plain greedy at token 28 (bf16, logit
gap 0.03) and token 53 (f32) on held-out text, while toy-model streams
match exactly.  This is the same divergence class as cross-engine Q4K
greedy (CLAUDE.md parity rules) — quality-neutral, not bit-stable.
Bit-exact spec/plain identity holds only where both paths share one
kernel body: the C++ engine (cpp/nano.cpp, NANO_CPP_SPEC).  Tests pin
exactness on toy models and prefix-agreement semantics on real ones.

Two consumers:
  * `spec_decode_loop`: on-device `lax.while_loop` (one dispatch per
    burst) for the throughput path — `engine.generate_on_device`
    with `ctx.spec_k > 0`.
  * `verify_step`: one jitted speculation round for the host-driven
    `engine.Session` — each dispatch emits >= 1 tokens, so the ~30 ms
    tunnel cost per dispatched program is amortized over every accepted
    token (interactive decode gets the same multiplier as throughput).

Correctness of the cache under rejection needs no rollback: a round at
position p writes cache rows [p, p+k]; rows past the accepted prefix
hold K/V of rejected drafts, but the next round starts at
p' = p + n_accepted + 1 <= p + k + 1 and writes [p', p'+k] — which
covers every stale row (the write happens before attend inside
`gpt.attention`), and the causal mask hides rows > query position in
the meantime.  The same invariant covers the history buffer.

Scope: greedy (temperature == 0), ANY repetition penalty — the
penalty's within-round dependence on earlier emissions is handled
exactly by per-row masks over seen + the draft prefix (prefix_masks):
a row is only kept when its prefix was accepted, where draft == the
emitted tokens, so the masks match sequential penalized-greedy
bit-for-bit.  Stochastic sampling cannot be verified in one forward;
the engine falls back to plain decode there.  (The reference has no
speculative path at all; its C engine decodes strictly one token per
forward, infer/infer.c:1196-1308.)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from nano_tpu.models import gpt

# stats of the most recent spec_decode_loop call (host-side, for
# benchmarks): {"tokens": emitted, "rounds": verify forwards}
LAST_STATS = None


def ngram_draft(hist: jnp.ndarray, pos: jnp.ndarray, k: int) -> jnp.ndarray:
    """Draft k tokens by prompt lookup over the token history.

    hist: (T,) int32 — hist[i] is the token fed at absolute position i;
    entries <= pos are valid.  Finds the LATEST position p < pos whose
    trailing 3-gram matches (hist[pos-2], hist[pos-1], hist[pos]),
    falling back to a 2-gram match, and proposes hist[p+1 : p+1+k].
    With no match the slice from 0 is returned — a junk draft costs
    nothing (the verify forward runs regardless; acceptance just lands
    at 0).
    """
    T = hist.shape[0]
    idx = jnp.arange(T)
    h1 = jnp.concatenate([hist[:1], hist[:-1]])     # hist[i-1]
    h2 = jnp.concatenate([hist[:2], hist[:-2]])     # hist[i-2]
    a0, a1, a2 = hist[pos], hist[pos - 1], hist[pos - 2]
    valid = (idx < pos) & (idx >= 2)
    m2 = valid & (hist == a0) & (h1 == a1)
    m3 = m2 & (h2 == a2)
    score = jnp.where(m3, idx + T, jnp.where(m2, idx, -1))
    best = jnp.max(score)
    p_star = jnp.where(best >= T, best - T, best)
    start = jnp.where(p_star >= 1, p_star + 1, 0)
    start = jnp.clip(start, 0, T - k)
    return lax.dynamic_slice(hist, (start,), (k,))


# per-slot drafting for the continuous-batching engine: one lookup per
# slot over its own history row (serve/batching.py)
batched_ngram_draft = jax.vmap(ngram_draft, in_axes=(0, 0, None))


def prefix_masks(draft: jnp.ndarray, seen: jnp.ndarray) -> jnp.ndarray:
    """Per-row repetition-penalty masks for a verify round.

    Sequential penalized-greedy applies the penalty over
    seen-so-far = prompt + all emitted tokens.  Inside a round, row i's
    "emitted so far" is exactly the accepted draft prefix — and rows
    are only KEPT when their prefix was accepted (draft[j] == g[j]), so
    building the mask from the draft preserves bit-exact sequential
    equivalence: mask_i = seen | {draft[j] : j < i}.

    draft: (k,) int32; seen: (V,) bool -> (k+1, V) bool.
    """
    V = seen.shape[-1]
    onehot = draft[:, None] == jnp.arange(V)[None, :]        # (k, V)
    prefix = jnp.cumsum(onehot, axis=0) > 0                  # rows 1..k
    return jnp.concatenate(
        [jnp.zeros((1, V), jnp.bool_), prefix], axis=0) | seen[None, :]


def _verify_round(params, lora, lora_scale, tok, pos, cache, hist, seen,
                  rep_penalty, cfg, dtype, k, attn_len=None):
    """One speculation round: draft k, verify k+1 in one forward.

    tok: () int32 current token (input at position pos).  Returns
    (g, n_out, cache, hist, seen): g[(k+1,)] are the penalized-greedy
    tokens at positions pos..pos+k; the first n_out of them are the
    emitted continuation (g[:n_out] extends the stream exactly as plain
    penalized-greedy decode would), the next round's input token is
    g[n_out-1] at position pos + n_out, and seen gains the emitted
    tokens.
    """
    draft = ngram_draft(hist, pos, k)
    ids = jnp.concatenate([tok[None], draft])[None, :]          # (1, k+1)
    logits, cache = gpt.forward_with_cache(
        params, ids, cache, pos, cfg, dtype=dtype,
        lora=lora, lora_scale=lora_scale, attn_len=attn_len)
    lf = logits[0].astype(jnp.float32)                          # (k+1, V)
    masks = prefix_masks(draft, seen)
    lf = jnp.where(masks, lf / rep_penalty, lf)   # same op as plain decode
    g = jnp.argmax(lf, axis=-1).astype(jnp.int32)
    match = jnp.concatenate([draft == g[:k],
                             jnp.zeros((1,), jnp.bool_)])
    n_acc = jnp.argmin(match)            # leading-True run length
    n_out = (n_acc + 1).astype(jnp.int32)
    hist = lax.dynamic_update_slice(hist, g, (pos + 1,))
    V = seen.shape[-1]
    valid = jnp.arange(k + 1) < n_out
    emitted = jnp.any((g[:, None] == jnp.arange(V)[None, :])
                      & valid[:, None], axis=0)
    return g, n_out, cache, hist, seen | emitted


@partial(jax.jit, static_argnames=("cfg", "dtype", "k", "attn_len"))
def verify_step(params, lora, lora_scale, tok, pos, cache, hist, seen,
                rep_penalty, cfg, dtype, k, attn_len=None):
    """Jitted single round for the host-driven Session path.
    `attn_len` (static) = cache-length bucketing; the caller guarantees
    pos + k + 1 < attn_len."""
    return _verify_round(params, lora, lora_scale, tok, pos, cache, hist,
                         seen, rep_penalty, cfg, dtype, k, attn_len)


@partial(jax.jit, static_argnames=("cfg", "dtype", "n_tokens", "k"))
def spec_decode_loop(params, lora, lora_scale, tok, pos, cache, hist,
                     seen, rep_penalty, cfg, dtype, n_tokens, k
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                "gpt.KVCache"]:
    """On-device speculative (penalized-)greedy decode of >= n_tokens.

    One dispatched program; internally a while_loop of verify rounds.
    Returns (out[(n_tokens,)], n_emitted, n_rounds, cache).  Only
    out[:n_emitted] are emitted tokens — entries past n_emitted hold
    the final round's rejected-draft overwrite, NOT zeros, so callers
    must trim by n_emitted if the position guard could have stopped the
    loop early (the engine sizes cache + history so n_emitted >=
    n_tokens for the requested length).
    """
    T = hist.shape[0]
    out0 = jnp.zeros((n_tokens + k + 1,), jnp.int32)

    def cond(c):
        _tok, pos, _cache, _hist, _seen, _out, n_em, _r = c
        return (n_em < n_tokens) & (pos + k + 2 <= T)

    def body(c):
        tok, pos, cache, hist, seen, out, n_em, r = c
        g, n_out, cache, hist, seen = _verify_round(
            params, lora, lora_scale, tok, pos, cache, hist, seen,
            rep_penalty, cfg, dtype, k)
        out = lax.dynamic_update_slice(out, g, (n_em,))
        return (g[n_out - 1], pos + n_out, cache, hist, seen, out,
                n_em + n_out, r + 1)

    (_tok, _pos, cache, _hist, _seen, out, n_em, rounds) = lax.while_loop(
        cond, body,
        (tok, pos, cache, hist, seen, out0, jnp.int32(0), jnp.int32(0)))
    return out[:n_tokens], n_em, rounds, cache
