"""Observation hook: per-phase taps fire through the compiled engine
(reference feature: infer/infer.h:63-87)."""

import numpy as np
import jax
import jax.numpy as jnp

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.infer import engine
from nano_tpu.ops import sampling
from nano_tpu.io import binfmt
from nano_tpu.tokenizer.trie import TrieTokenizer
from nano_tpu import observe


def make_ctx(tmp_path, **kw):
    cfg = ModelConfig(block_size=32, vocab_size=64, n_layer=3, n_embd=32,
                      n_head=4, n_kv_head=2, n_hidden=64)
    params = gpt.init_params(jax.random.PRNGKey(1), cfg)
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(26)])
    path = str(tmp_path / "m.bin")
    binfmt.write_model(path, jax.tree.map(np.asarray, params), cfg,
                       tok.config, quant="f32")
    return engine.LLMContext.from_bin(
        path, max_seq_len=32, dtype=jnp.float32,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0), **kw)


def test_phases_fire_with_layer_indices(tmp_path):
    events = []
    ctx = make_ctx(tmp_path, observation=lambda o: events.append(o))
    try:
        session = engine.Session(ctx, "abc", max_new_tokens=3)
        while session.step() is not None:
            pass
    finally:
        observe.set_observer(None)

    phases = {e.phase for e in events}
    # every phase fires at least once
    for ph in (observe.Phase.EMBEDDING, observe.Phase.ATTN_NORM,
               observe.Phase.QKV, observe.Phase.ROPE,
               observe.Phase.ATTENTION, observe.Phase.ATTN_OUT,
               observe.Phase.FFN_NORM, observe.Phase.FFN,
               observe.Phase.RESIDUAL, observe.Phase.FINAL_NORM,
               observe.Phase.LOGITS, observe.Phase.SAMPLE):
        assert ph in phases, f"missing phase {ph}"
    # layer-scoped phases report all 3 layer indices
    layers = {e.layer for e in events if e.phase == observe.Phase.ATTN_NORM}
    assert layers == {0, 1, 2}
    # non-layer phases report -1
    assert all(e.layer == -1 for e in events
               if e.phase == observe.Phase.LOGITS)
    # data snapshots are real host arrays
    lg = [e for e in events if e.phase == observe.Phase.LOGITS][-1]
    assert lg.data.shape[-1] == 64 and np.isfinite(lg.data).all()


def test_no_observer_no_fire(tmp_path):
    events = []
    observe.set_observer(None)
    ctx = make_ctx(tmp_path)
    session = engine.Session(ctx, "abc", max_new_tokens=3)
    while session.step() is not None:
        pass
    assert events == []


def test_top_candidates_helper():
    logits = np.array([0.0, 3.0, 1.0, 2.0])
    ids, probs = observe.top_candidates(logits, k=2)
    assert list(ids) == [1, 3]
    assert probs[0] > probs[1] > 0


def test_fallback_summary_mode(tmp_path, monkeypatch):
    """Backends without host callbacks (the axon TPU tunnel) deliver
    bounded summary rows as extra jitted outputs (VERDICT r1 item 5)."""
    monkeypatch.setattr(observe, "_FORCE_FALLBACK", True)
    events = []
    ctx = make_ctx(tmp_path, observation=lambda o: events.append(o))
    try:
        session = engine.Session(ctx, "abc", max_new_tokens=3)
        while session.step() is not None:
            pass
    finally:
        observe.set_observer(None)

    assert events and all(e.summary for e in events)
    phases = {e.phase for e in events}
    for ph in (observe.Phase.EMBEDDING, observe.Phase.ATTN_NORM,
               observe.Phase.QKV, observe.Phase.RESIDUAL,
               observe.Phase.FINAL_NORM, observe.Phase.LOGITS,
               observe.Phase.SAMPLE):
        assert ph in phases, f"missing phase {ph}"
    # layer-scoped phases report every layer index
    layers = {e.layer for e in events if e.phase == observe.Phase.RESIDUAL}
    assert layers == {0, 1, 2}
    # activation magnitudes are real numbers
    res = [e for e in events if e.phase == observe.Phase.RESIDUAL]
    assert all(np.isfinite(e.mean_abs) and e.mean_abs >= 0 for e in res)
    # LOGITS rows carry usable top-6 candidates
    lg = [e for e in events if e.phase == observe.Phase.LOGITS][-1]
    assert lg.top_ids is not None and len(lg.top_ids) == 6
    assert np.isfinite(lg.top_vals).all()
    assert (lg.top_vals[:-1] >= lg.top_vals[1:]).all()   # sorted desc


def test_fallback_matches_callback_magnitudes(tmp_path, monkeypatch):
    """Summary rows agree with the callback path's own statistics."""
    def run(force):
        monkeypatch.setattr(observe, "_FORCE_FALLBACK", force)
        events = []
        ctx = make_ctx(tmp_path, observation=lambda o: events.append(o))
        try:
            session = engine.Session(ctx, "abc", max_new_tokens=2)
            while session.step() is not None:
                pass
        finally:
            observe.set_observer(None)
        out = {}
        for e in events:
            if e.phase == observe.Phase.RESIDUAL:
                v = e.mean_abs if e.summary else float(np.abs(e.data).mean())
                out.setdefault(e.layer, []).append(v)
        return out

    cb = run(False)
    fb = run(True)
    assert set(cb) == set(fb)
    for layer in cb:
        a, b = np.asarray(cb[layer]), np.asarray(fb[layer])
        n = min(len(a), len(b))
        np.testing.assert_allclose(a[:n], b[:n], rtol=1e-4)
