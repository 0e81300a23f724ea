"""Sampler semantics tests (vs reference behaviors at model.py:506-530 and
infer/infer.c:1026-1193)."""

import numpy as np
import jax
import jax.numpy as jnp

from nano_tpu.ops import sampling


def test_temperature_zero_is_argmax():
    logits = jnp.asarray([[0.1, 3.0, -1.0, 2.9]])
    cfg = sampling.SamplerConfig(temperature=0.0)
    out = sampling.sample(jax.random.PRNGKey(0), logits, cfg)
    assert out.tolist() == [1]


def test_repetition_penalty_divides_seen():
    logits = jnp.asarray([[2.0, 2.0]])
    seen = jnp.asarray([[True, False]])
    out = sampling.apply_repetition_penalty(logits, seen, 2.0)
    np.testing.assert_allclose(np.asarray(out), [[1.0, 2.0]])


def test_top_k_masks_tail():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 4.0]])
    out = sampling.apply_top_k(logits, 2)
    assert np.isneginf(np.asarray(out)[0, 0])
    assert np.isneginf(np.asarray(out)[0, 2])
    assert np.asarray(out)[0, 1] == 5.0


def test_top_p_keeps_first_crossing():
    # probs sorted desc: 0.5, 0.3, 0.15, 0.05; p=0.6 keeps 0.5 and 0.3
    probs = jnp.asarray([[0.05, 0.5, 0.15, 0.3]])
    kept = np.asarray(sampling.apply_top_p(probs, 0.6))
    assert kept[0, 1] > 0 and kept[0, 3] > 0
    assert kept[0, 0] == 0 and kept[0, 2] == 0


def test_top_p_boundary_tie_keeps_prefix_only():
    """Tokens TIED at the nucleus boundary: keep exactly the sorted
    prefix (first-crossing cut, ties broken by token id) — not every
    token sharing the threshold probability."""
    probs = jnp.asarray([[0.4, 0.3, 0.3]])
    kept = np.asarray(sampling.apply_top_p(probs, 0.5))
    # cum before: [0, .4, .7] -> keep positions 0 and 1 only; the second
    # 0.3 (token 2) ties the boundary value but lies past the crossing
    assert kept[0, 0] > 0 and kept[0, 1] > 0
    assert kept[0, 2] == 0


def test_windowed_nucleus_matches_full_vocab_cut():
    """With no user top-k, the 128-window sampler's kept set equals the
    full-vocab nucleus (true probabilities via full logsumexp), token
    for token."""
    from nano_tpu.infer import engine
    rng = np.random.RandomState(7)
    raw = rng.randn(1, 4096).astype(np.float32) * 2.0
    raw[0, 400:460] += 9.0        # peaked head: nucleus fits the window
    logits = jnp.asarray(raw)
    top_p = 0.8
    # full-vocab reference cut
    full_probs = jax.nn.softmax(logits, axis=-1)
    full_kept = np.asarray(sampling.apply_top_p(full_probs, top_p))[0]
    want = set(np.nonzero(full_kept)[0].tolist())
    assert 1 <= len(want) < engine.NUCLEUS_WINDOW   # nucleus fits window
    # windowed sampler: every draw must come from exactly that set, and
    # enough draws cover that the set is not strictly larger
    key = jax.random.PRNGKey(0)
    seen = set()
    for _ in range(300):
        key, tok = engine._sample_windowed(
            key, logits, jnp.float32(1.0), jnp.float32(top_p), 0, False)
        seen.add(int(tok[0]))
    assert seen <= want, sorted(seen - want)[:5]
    assert len(seen) >= min(len(want), 3)


def test_sample_with_coin_matches_cdf_walk():
    """Explicit-coin sampler reproduces a hand-computed inverse-CDF draw."""
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    cfg = sampling.SamplerConfig(temperature=1.0, top_p=0.95,
                                 repetition_penalty=1.0)
    # kept (desc): 0.5, 0.3, 0.15, 0.05 -> all kept (cum before < .95)
    # kept_mass = 1.0; coin 0.55 -> r=0.55 -> second token (cum 0.5<0.55<=0.8)
    out = sampling.sample_with_coin(logits, jnp.asarray([0.55]), cfg)
    assert out.tolist() == [1]
    out = sampling.sample_with_coin(logits, jnp.asarray([0.1]), cfg)
    assert out.tolist() == [0]
    out = sampling.sample_with_coin(logits, jnp.asarray([0.999]), cfg)
    assert out.tolist() == [3]


def test_seen_mask_from_ids():
    ids = jnp.asarray([[5, 7, 5, 0]])
    mask = sampling.seen_mask_from_ids(ids, jnp.asarray([3]), 10)
    m = np.asarray(mask)[0]
    assert m[5] and m[7]
    assert not m[0]  # position 3 beyond length


def test_sample_distribution_top_p():
    """Statistical check: nucleus cuts the tail entirely."""
    logits = jnp.log(jnp.asarray([[0.6, 0.25, 0.1, 0.05]]))
    cfg = sampling.SamplerConfig(temperature=1.0, top_p=0.5,
                                 repetition_penalty=1.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    draws = [int(sampling.sample(k, logits, cfg)[0]) for k in keys[:50]]
    assert set(draws) == {0}  # 0.6 alone crosses p=0.5


def test_xorshift_matches_reference_semantics():
    """xorshift* produces deterministic, reproducible values in [0,1)."""
    state = np.uint64(42)
    vals = []
    for _ in range(5):
        state, v = sampling.xorshift_f32(state)
        vals.append(v)
    assert all(0.0 <= v < 1.0 for v in vals)
    # deterministic across calls
    state2 = np.uint64(42)
    for v in vals:
        state2, v2 = sampling.xorshift_f32(state2)
        assert v == v2


def test_exact_multinomial_no_window_truncation():
    """With top_p >= 1 (the reference's plain-multinomial mode,
    model.py:527-529) sampling must cover the FULL vocab, not just the
    top-NUCLEUS_WINDOW candidates (VERDICT r1 item 9)."""
    from nano_tpu.infer import engine

    V = 4096
    # uniform logits: any windowed sampler would only ever return the
    # window's (arbitrary tie-broken) first 128 indices
    logits = jnp.zeros((1, V), jnp.float32)
    key = jax.random.PRNGKey(0)
    seen = set()
    for _ in range(64):
        key, tok = engine._sample_windowed(
            key, logits, jnp.float32(1.0), jnp.float32(1.0), 0, False,
            exact=True)
        seen.add(int(tok[0]))
    assert max(seen) >= engine.NUCLEUS_WINDOW, sorted(seen)[-5:]


def test_exact_mode_selection():
    from nano_tpu.infer import engine
    S = sampling.SamplerConfig
    assert engine._exact_multinomial(S(temperature=1.0, top_p=1.0))
    assert engine._exact_multinomial(S(temperature=1.0, top_p=0.0))
    assert not engine._exact_multinomial(S(temperature=1.0, top_p=0.8))
    assert not engine._exact_multinomial(S(temperature=1.0, top_p=1.0,
                                           top_k=40))


def test_exact_multinomial_distribution():
    """Full-vocab categorical tracks softmax(logits/T) frequencies."""
    from nano_tpu.infer import engine

    probs = np.asarray([0.5, 0.3, 0.15, 0.05], np.float32)
    logits = jnp.log(jnp.asarray(probs))[None, :]
    key = jax.random.PRNGKey(1)
    counts = np.zeros(4)
    n = 400
    for _ in range(n):
        key, tok = engine._sample_windowed(
            key, logits, jnp.float32(1.0), jnp.float32(1.0), 0, False,
            exact=True)
        counts[int(tok[0])] += 1
    freq = counts / n
    assert np.abs(freq - probs).max() < 0.08, freq
