"""The committed TRAINED toy fixture (tests/fixtures/trained) keeps the
properties the bench panel's spec + ppl stages measure.

tools/make_trained_fixture.py trains a 4L/128E char model to memorize
dataset/pretrain_sample.txt plus a cyclic chorus.  The panel (and these
tests) rely on: chorus prompts making n-gram drafts accept (the spec
stage's tokens/round > 1), spec/plain greedy equality, and a low f32
PPL with small quantization deltas (the ppl stage's keys).  Reference
contrast: the C engine has no speculative path (infer/infer.c:1196-1308).
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from nano_tpu.infer import engine

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "trained")


@pytest.fixture(scope="module")
def meta():
    return json.load(open(os.path.join(FIX, "META.json")))


@pytest.fixture(scope="module")
def ctx_q80():
    return engine.LLMContext.from_bin(os.path.join(FIX, "toy_q80.bin"))


def test_fixture_files_present(meta):
    for name in ("toy_f32.bin", "toy_q80.bin", "toy_q4k.bin",
                 "corpus.txt"):
        assert os.path.getsize(os.path.join(FIX, name)) > 0
    assert meta["final_loss"] < 0.15


def test_memorized_chorus_continuation(ctx_q80, meta):
    """Greedy continuation of the chorus keeps repeating it — the
    property that makes speculative drafts accept."""
    chorus = meta["chorus"]
    ids = ctx_q80.encode(chorus * 2)
    out = engine.generate_on_device(ctx_q80, ids, 3 * len(ctx_q80.encode(chorus)))
    text = ctx_q80.decode(list(out))
    assert chorus * 2 in text or text.count(chorus[:8]) >= 2, text


def test_spec_matches_plain_and_accepts(ctx_q80, meta):
    chorus = meta["chorus"]
    ids = ctx_q80.encode(chorus * 2)
    ctx_q80.spec_k = 0
    plain = engine.generate_on_device(ctx_q80, ids, 64)
    ctx_q80.spec_k = 7
    spec = engine.generate_on_device(ctx_q80, ids, 64)
    ctx_q80.spec_k = 0
    assert list(plain) == list(spec)

    # tokens/round on the memorized chorus: near-perfect acceptance
    from nano_tpu.infer import speculative
    n = len(ids)
    cache = ctx_q80.new_cache(1)
    pad = engine._bucket(n)
    arr = np.zeros((1, pad), np.int32)
    arr[0, :n] = ids
    logits, cache, _ = engine._prefill(
        ctx_q80.params, None, 0.0, jnp.asarray(arr), cache, ctx_q80.cfg,
        jnp.bfloat16, attn_len=pad)
    tok = jnp.argmax(logits[0, n - 1]).astype(jnp.int32)
    hist = np.zeros((ctx_q80.max_seq_len,), np.int32)
    hist[:n] = ids
    hist[n] = int(tok)
    seen = jnp.zeros((ctx_q80.cfg.vocab_size,), jnp.bool_)
    _, n_em, rounds, _ = speculative.spec_decode_loop(
        ctx_q80.params, None, 0.0, tok, jnp.int32(n), cache,
        jnp.asarray(hist), seen, jnp.float32(1.0), ctx_q80.cfg,
        jnp.bfloat16, 64, 7)
    assert int(n_em) / max(int(rounds), 1) > 4.0


def test_ppl_low_and_quant_deltas_small():
    import eval as evalmod
    text = open(os.path.join(FIX, "corpus.txt"), encoding="utf-8").read()
    text = text[:1200]     # CPU budget; same distribution
    base = evalmod.model_ppl(os.path.join(FIX, "toy_f32.bin"), text)
    assert base < 1.5, base
    d80 = evalmod.model_ppl(os.path.join(FIX, "toy_q80.bin"), text) - base
    d4k = evalmod.model_ppl(os.path.join(FIX, "toy_q4k.bin"), text) - base
    assert abs(d80) < 0.05, d80
    assert abs(d4k) < 0.2, d4k
