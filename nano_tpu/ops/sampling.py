"""Token samplers — fully vectorized, jit-safe, batched.

Capability parity with both reference sampling stacks:
  * PyTorch path (reference: model.py:506-530): repetition penalty by
    division over seen tokens, temperature, top-k cutoff, multinomial.
  * C engine path (reference: infer/infer.c:1026-1193): temperature==0 ->
    argmax; otherwise softmax + nucleus (top-p) sampling truncated where
    the cumulative probability first exceeds p.

The TPU design differs from both: no per-token Python, no qsort — a batch
of next-token draws is one fused XLA program (sort + cumsum + masked
categorical), so sampling runs on-device inside the jitted decode step.

For bit-reproducible cross-engine tests, `sample_with_coin` consumes an
explicit uniform "coin" exactly like the C engine's inverse-CDF walk, and
`xorshift_*` reimplement the reference RNG (infer/utils.c:959-968).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SamplerConfig:
    """Runtime sampling parameters (reference: infer/infer.h:215-223)."""

    temperature: float = 1.0
    top_p: float = 0.8
    top_k: int = 0              # 0 = disabled
    repetition_penalty: float = 1.1


# ---------------------------------------------------------------------
# building blocks (all operate on a batch: logits (B, V))
# ---------------------------------------------------------------------

def apply_repetition_penalty(logits: jnp.ndarray, seen_mask: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    """Divide logits of already-seen tokens by `penalty`.

    seen_mask: (B, V) bool — tokens that occurred in the sequence so far.
    Matches the reference semantics (divide regardless of sign:
    model.py:517-519, infer/infer.c:1156-1167).
    """
    if penalty == 1.0:
        return logits
    return jnp.where(seen_mask, logits / penalty, logits)


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mask everything below the k-th largest logit to -inf (model.py:523-525)."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def apply_top_p(probs: jnp.ndarray, p: float) -> jnp.ndarray:
    """Zero out the tail outside the nucleus; keep the first token that
    crosses the cumulative threshold (matches infer/infer.c:1075-1085).

    probs: (B, V) softmax probabilities.  Returns unnormalized kept probs.
    """
    if p <= 0.0 or p >= 1.0:
        return probs
    # stable argsort on -probs: descending, ties broken by token id —
    # keeps EXACTLY the sorted prefix (a >=threshold compare would keep
    # every token TIED at the boundary, a larger nucleus than the C
    # engine's first-crossing cut; C's own tie order is qsort-unspecified,
    # so ties break deterministically by id here)
    order = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # keep position i iff the cumulative mass BEFORE it is <= p: the C
    # engine breaks at the first i with cum_i > p and includes that i
    # (infer/infer.c:1078-1084)
    keep_sorted = (cum - sorted_probs) <= p
    inv = jnp.argsort(order, axis=-1)          # inverse permutation
    keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
    return jnp.where(keep, probs, 0.0)


# ---------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------

def sample(key: jax.Array, logits: jnp.ndarray, cfg: SamplerConfig,
           seen_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Draw next tokens (B,) from logits (B, V) with full Nano semantics.

    temperature==0 degenerates to argmax (infer/infer.c:1171-1173).
    """
    logits = logits.astype(jnp.float32)
    if seen_mask is not None:
        logits = apply_repetition_penalty(logits, seen_mask,
                                          cfg.repetition_penalty)
    if cfg.temperature == 0.0:
        return jnp.argmax(logits, axis=-1)

    logits = logits / cfg.temperature
    if cfg.top_k:
        logits = apply_top_k(logits, cfg.top_k)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = apply_top_p(probs, cfg.top_p)
    # categorical over (possibly unnormalized) kept probabilities
    gumbel_logits = jnp.log(jnp.maximum(probs, 1e-38))
    return jax.random.categorical(key, gumbel_logits, axis=-1)


def sample_with_coin(logits: jnp.ndarray, coin: jnp.ndarray,
                     cfg: SamplerConfig,
                     seen_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Inverse-CDF sampling with an explicit uniform coin in [0,1).

    Reproduces the C engine draw exactly when given the same coin
    (infer/infer.c:1100-1109): sort desc, truncate at top-p, walk the CDF
    with r = coin * kept_mass.  Used by cross-engine parity tests.
    """
    logits = logits.astype(jnp.float32)
    if seen_mask is not None:
        logits = apply_repetition_penalty(logits, seen_mask,
                                          cfg.repetition_penalty)
    if cfg.temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    probs = jax.nn.softmax(logits / cfg.temperature, axis=-1)

    V = probs.shape[-1]
    order = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    if 0.0 < cfg.top_p < 1.0:
        keep = (cum - sorted_probs) <= cfg.top_p
    else:
        keep = jnp.ones_like(cum, dtype=bool)
    kept_mass = jnp.max(jnp.where(keep, cum, 0.0), axis=-1, keepdims=True)
    r = coin[..., None] * kept_mass
    # first kept index where cumulative > r
    hit = jnp.logical_and(keep, cum > r)
    idx_in_sorted = jnp.argmax(hit, axis=-1)
    # if nothing hit (rounding), fall back to last kept index
    any_hit = jnp.any(hit, axis=-1)
    last_kept = jnp.sum(keep, axis=-1) - 1
    idx_in_sorted = jnp.where(any_hit, idx_in_sorted, last_kept)
    return jnp.take_along_axis(order, idx_in_sorted[..., None], axis=-1)[..., 0]


def update_seen_mask(seen_mask: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """Mark tokens (B,) as seen in the (B, V) mask."""
    B = seen_mask.shape[0]
    return seen_mask.at[jnp.arange(B), tokens].set(True)


def seen_mask_from_ids(ids: jnp.ndarray, length: jnp.ndarray,
                       vocab_size: int) -> jnp.ndarray:
    """Build a (B, V) seen mask from id buffer (B, T), counting positions
    < length (per the C engine: all tokens before the current position,
    infer/infer.c:1158-1160)."""
    B, T = ids.shape
    valid = jnp.arange(T)[None, :] < jnp.asarray(length).reshape(-1, 1)
    onehot = jax.nn.one_hot(ids, vocab_size, dtype=jnp.bool_)
    return jnp.any(onehot & valid[..., None], axis=1)


# ---------------------------------------------------------------------
# reference RNG (host-side, for parity harnesses)
# ---------------------------------------------------------------------

def xorshift_u32(state: np.uint64) -> tuple[np.uint64, np.uint32]:
    """xorshift* step (reference: infer/utils.c:959-965)."""
    s = np.uint64(state)
    with np.errstate(over="ignore"):
        s ^= s >> np.uint64(12)
        s ^= (s << np.uint64(25)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        s ^= s >> np.uint64(27)
        out = np.uint32(((s * np.uint64(0x2545F4914F6CDD1D)) &
                         np.uint64(0xFFFFFFFFFFFFFFFF)) >> np.uint64(32))
    return s, out


def xorshift_f32(state: np.uint64) -> tuple[np.uint64, float]:
    """uniform in [0,1) (reference: infer/utils.c:967-969)."""
    state, u = xorshift_u32(state)
    return state, float(u >> np.uint32(8)) / 16777216.0
