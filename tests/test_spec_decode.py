"""Speculative greedy decode (infer/speculative.py): on these toy
models the emitted token stream is IDENTICAL to plain greedy decode —
acceptance is exact argmax equality against the verify forward.

Scope note: identity is exact here because toy-model argmax margins
dwarf the rounding difference between the (1, k+1)-shaped verify
program and the single-token decode program.  On real trained models
that shape difference can flip near-tie argmaxes (56M: diverged at
token 28 bf16 / 53 f32 on held-out text) — see the module docstring of
infer/speculative.py and tools/bench_spec_realtext.py, which pins the
prefix-agreement semantics at real scale.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.io import binfmt
from nano_tpu.infer import engine, speculative
from nano_tpu.ops import sampling
from nano_tpu.tokenizer.trie import TrieTokenizer

CFG = ModelConfig(block_size=128, vocab_size=64, n_layer=2, n_embd=32,
                  n_head=4, n_kv_head=2, n_hidden=64)
GREEDY = sampling.SamplerConfig(temperature=0.0, repetition_penalty=1.0)


def make_ctx(tmp_path=None, quant=None, **kw):
    if quant is None:
        params = gpt.init_params(jax.random.PRNGKey(11), CFG)
        tok = TrieTokenizer()
        tok.build([chr(ord("a") + i) for i in range(52)])
        return engine.LLMContext(cfg=CFG, params=params, tokenizer=tok,
                                 max_seq_len=128, dtype=jnp.float32,
                                 sampler=GREEDY, **kw)
    params = jax.tree.map(np.asarray, gpt.init_params(jax.random.PRNGKey(11),
                                                      CFG))
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(52)])
    path = str(tmp_path / f"spec_{quant}.bin")
    binfmt.write_model(path, params, CFG, tok.config, quant=quant)
    return engine.LLMContext.from_bin(path, max_seq_len=128,
                                      dtype=jnp.float32, sampler=GREEDY,
                                      **kw)


REPETITIVE = [5, 9, 3, 5, 9, 3, 5, 9, 3, 5, 9, 3, 5, 9]
RANDOMISH = [7, 1, 30, 12, 4, 44, 2, 19]


@pytest.mark.parametrize("prompt", [REPETITIVE, RANDOMISH])
@pytest.mark.parametrize("k", [3, 7])
def test_on_device_spec_matches_plain(prompt, k):
    import dataclasses
    ctx = make_ctx()
    plain = engine.generate_on_device(ctx, prompt, 40)
    ctx_s = dataclasses.replace(ctx, spec_k=k)
    spec = engine.generate_on_device(ctx_s, prompt, 40)
    np.testing.assert_array_equal(spec, plain)
    assert speculative.LAST_STATS["tokens"] >= 39
    assert speculative.LAST_STATS["rounds"] >= 1


def test_acceptance_on_repetitive_text():
    """A greedy model decodes into a cycle; prompt-lookup must then
    accept multiple tokens per round (rounds strictly < tokens)."""
    import dataclasses
    ctx = dataclasses.replace(make_ctx(), spec_k=7)
    engine.generate_on_device(ctx, REPETITIVE, 60)
    st = speculative.LAST_STATS
    assert st["rounds"] < st["tokens"], st


def test_session_spec_matches_plain():
    ctx = make_ctx()
    plain = engine.generate_sync(ctx, "abcabcabcabc", max_new_tokens=30)
    ctx_s = make_ctx(spec_k=7)
    spec = engine.generate_sync(ctx_s, "abcabcabcabc", max_new_tokens=30)
    assert spec.output_ids == plain.output_ids
    # the spec session ran verify rounds (pending buffer exercised)
    assert ctx_s.spec_k == 7


def test_session_adaptive_k_ramps_on_repetitive_text():
    """The pow2-bucketed C++ ramp rule (cpp/nano.cpp run_spec_round):
    full acceptance doubles the draft length toward the cap, a miss
    drops it to the accepted-run-length bucket.  A cyclic stream must
    ramp k off its floor; the stream stays exact either way."""
    ctx = make_ctx(spec_k=8)
    s = engine.Session(ctx, "abcabcabcabc", max_new_tokens=40)
    ks = []
    while s.step() is not None:
        ks.append(s._spec_k_cur)
    assert ks[0] >= 1 and max(ks) > 1, ks          # ramped off the floor
    assert all(k <= 8 for k in ks), ks             # never exceeds the cap
    assert all(k & (k - 1) == 0 for k in ks), ks   # pow2 buckets only
    plain = engine.generate_sync(make_ctx(), "abcabcabcabc",
                                 max_new_tokens=40)
    assert s.output_ids == plain.output_ids


def test_session_spec_respects_max_new_tokens():
    ctx = make_ctx(spec_k=7)
    s = engine.generate_sync(ctx, "abcabc", max_new_tokens=5)
    assert len(s.output_ids) <= 5


def test_spec_disabled_for_sampling():
    """Non-greedy sampler: _spec must be off, plain path taken."""
    ctx = make_ctx(spec_k=7)
    import dataclasses
    ctx = dataclasses.replace(
        ctx, sampler=sampling.SamplerConfig(temperature=0.8, top_p=0.9,
                                            repetition_penalty=1.1))
    s = engine.Session(ctx, "abc", max_new_tokens=4)
    assert not s._spec
    while s.step() is not None:
        pass
    assert len(s.output_ids) <= 4


@pytest.mark.parametrize("quant", ["q80"])
def test_spec_quantized_parity(tmp_path, quant):
    import dataclasses
    ctx = make_ctx(tmp_path, quant)
    plain = engine.generate_on_device(ctx, REPETITIVE, 32)
    spec = engine.generate_on_device(dataclasses.replace(ctx, spec_k=7),
                                     REPETITIVE, 32)
    np.testing.assert_array_equal(spec, plain)


def test_spec_int8_kv_parity():
    import dataclasses
    ctx = make_ctx(kv_cache_dtype=jnp.int8)
    plain = engine.generate_on_device(ctx, REPETITIVE, 32)
    spec = engine.generate_on_device(dataclasses.replace(ctx, spec_k=7),
                                     REPETITIVE, 32)
    np.testing.assert_array_equal(spec, plain)


def test_ngram_draft_finds_latest_continuation():
    hist = jnp.asarray([0, 5, 9, 3, 5, 9, 7, 2, 5, 9, 0, 0], jnp.int32)
    # current 2-gram at pos=9 is (5, 9); latest earlier match is at p=5
    # (with 3-gram (3,5,9) also matching at p=5) -> draft starts at 6
    d = speculative.ngram_draft(hist, jnp.int32(9), 3)
    np.testing.assert_array_equal(np.asarray(d), [7, 2, 5])


# ---------------------------------------------------------------------
# speculative continuous batching (serve/batching.py)
# ---------------------------------------------------------------------

def _drain(be, slot, first, n_bursts=8, burst=4):
    got = [] if first is None else [first]
    for _ in range(n_bursts):
        r = be.step_burst(burst)
        got.extend(r.get(slot, []))
        if r.ended.get(slot):
            break
    return got


def test_batched_spec_matches_plain_greedy():
    import dataclasses
    from nano_tpu.serve.batching import BatchedEngine
    ctx = make_ctx()
    ctx_s = dataclasses.replace(ctx, spec_k=4)
    prompts = [REPETITIVE, RANDOMISH, [3, 3, 3, 3, 3, 3]]
    outs = {}
    for name, c in (("plain", ctx), ("spec", ctx_s)):
        be = BatchedEngine(c, n_slots=4)
        streams = []
        for p in prompts:
            slot, first = be.add(p, max_new_tokens=20, temperature=0.0,
                                 repetition_penalty=1.0)
            streams.append((slot, first))
        outs[name] = [_drain(be, s, f) for s, f in streams]
    assert outs["spec"] == outs["plain"]


def test_batched_spec_mixed_sampling_slots():
    """A stochastic slot inside a spec engine must reproduce the plain
    engine bit-for-bit: the spec step mirrors _batched_step's key-split
    order and an ineligible slot advances one position per step."""
    import dataclasses
    from nano_tpu.serve.batching import BatchedEngine
    ctx = make_ctx()
    ctx_s = dataclasses.replace(ctx, spec_k=4)
    outs = {}
    for name, c in (("plain", ctx), ("spec", ctx_s)):
        be = BatchedEngine(c, n_slots=4)
        g_slot, g_first = be.add(REPETITIVE, max_new_tokens=16,
                                 temperature=0.0, repetition_penalty=1.0)
        s_slot, s_first = be.add(RANDOMISH, max_new_tokens=16,
                                 temperature=0.9, top_p=0.85,
                                 repetition_penalty=1.1)
        got = {g_slot: [] if g_first is None else [g_first],
               s_slot: [] if s_first is None else [s_first]}
        for _ in range(12):
            r = be.step_burst(4)
            for s in got:
                got[s].extend(r.get(s, []))
            if not any(st.active for st in be.slots):
                break
        outs[name] = (got[g_slot], got[s_slot])
    assert outs["spec"][0] == outs["plain"][0]      # greedy stream
    assert outs["spec"][1] == outs["plain"][1]      # stochastic stream


def test_batched_spec_near_context_end_falls_back():
    """max_seq room guard: streams near the cache end still finish
    correctly (plain-scan fallback on the spec-touched cache)."""
    import dataclasses
    from nano_tpu.serve.batching import BatchedEngine
    ctx = make_ctx()                                  # max_seq_len=128
    ctx_s = dataclasses.replace(ctx, spec_k=7)
    outs = {}
    long_prompt = (REPETITIVE * 8)[:100]
    for name, c in (("plain", ctx), ("spec", ctx_s)):
        be = BatchedEngine(c, n_slots=2)
        slot, first = be.add(long_prompt, max_new_tokens=64,
                             temperature=0.0, repetition_penalty=1.0)
        outs[name] = _drain(be, slot, first, n_bursts=16, burst=4)
    assert outs["spec"] == outs["plain"]
    # the stream must have hit the length wall, not run away
    assert len(outs["spec"]) <= 128 - 100


def test_batched_spec_int8_kv_matches_plain():
    import dataclasses
    from nano_tpu.serve.batching import BatchedEngine
    ctx = make_ctx(kv_cache_dtype=jnp.int8)
    ctx_s = dataclasses.replace(ctx, spec_k=4)
    outs = {}
    for name, c in (("plain", ctx), ("spec", ctx_s)):
        be = BatchedEngine(c, n_slots=2)
        slot, first = be.add(REPETITIVE, max_new_tokens=20,
                             temperature=0.0, repetition_penalty=1.0)
        outs[name] = _drain(be, slot, first)
    assert outs["spec"] == outs["plain"]


def test_batched_spec_join_mid_stream():
    """A stream joining while another is mid-decode: both match plain."""
    import dataclasses
    from nano_tpu.serve.batching import BatchedEngine
    ctx = make_ctx()
    ctx_s = dataclasses.replace(ctx, spec_k=4)
    outs = {}
    for name, c in (("plain", ctx), ("spec", ctx_s)):
        be = BatchedEngine(c, n_slots=4)
        s1, f1 = be.add(REPETITIVE, max_new_tokens=24, temperature=0.0,
                        repetition_penalty=1.0)
        got1 = [] if f1 is None else [f1]
        r = be.step_burst(3)
        got1.extend(r.get(s1, []))
        s2, f2 = be.add(RANDOMISH, max_new_tokens=12, temperature=0.0,
                        repetition_penalty=1.0)
        got2 = [] if f2 is None else [f2]
        for _ in range(8):
            r = be.step_burst(3)
            got1.extend(r.get(s1, []))
            got2.extend(r.get(s2, []))
            if r.ended.get(s1) and r.ended.get(s2):
                break
        outs[name] = (got1, got2)
    assert outs["spec"] == outs["plain"]


# ---------------------------------------------------------------------
# penalized greedy (repetition_penalty != 1) speculative parity
# ---------------------------------------------------------------------

PEN = sampling.SamplerConfig(temperature=0.0, repetition_penalty=1.05)


def test_spec_penalized_greedy_session_parity():
    import dataclasses
    ctx = dataclasses.replace(make_ctx(), sampler=PEN)
    plain = engine.generate_sync(ctx, "abcabcabcabc", max_new_tokens=30)
    spec = engine.generate_sync(dataclasses.replace(ctx, spec_k=7),
                                "abcabcabcabc", max_new_tokens=30)
    assert spec.output_ids == plain.output_ids


def test_spec_penalized_greedy_on_device_parity():
    import dataclasses
    ctx = dataclasses.replace(make_ctx(), sampler=PEN)
    plain = engine.generate_on_device(ctx, REPETITIVE, 40)
    spec = engine.generate_on_device(dataclasses.replace(ctx, spec_k=7),
                                     REPETITIVE, 40)
    np.testing.assert_array_equal(spec, plain)


def test_batched_spec_penalized_greedy_parity():
    import dataclasses
    from nano_tpu.serve.batching import BatchedEngine
    ctx = make_ctx()
    ctx_s = dataclasses.replace(ctx, spec_k=4)
    outs = {}
    for name, c in (("plain", ctx), ("spec", ctx_s)):
        be = BatchedEngine(c, n_slots=3)
        slot, first = be.add(REPETITIVE, max_new_tokens=24,
                             temperature=0.0, repetition_penalty=1.05)
        outs[name] = _drain(be, slot, first)
    assert outs["spec"] == outs["plain"]


def test_on_device_penalized_matches_session():
    """generate_on_device and Session agree under repetition penalty —
    the first sampled token joins the penalty scope on both paths
    (Session._do_prefill semantics; C engine infer.c:1158-1160)."""
    import dataclasses
    ctx = dataclasses.replace(make_ctx(), sampler=PEN)
    sess = engine.generate_sync(ctx, "abcabcabc", max_new_tokens=24)
    dev = engine.generate_on_device(ctx, ctx.encode("abcabcabc"), 24)
    assert list(dev[:len(sess.output_ids)]) == sess.output_ids
    spec = engine.generate_on_device(
        dataclasses.replace(ctx, spec_k=7), ctx.encode("abcabcabc"), 24)
    np.testing.assert_array_equal(spec, dev)


def test_spec_adapt_controller_parks_and_recovers():
    """The draft-length controller: doubles on full acceptance, drops to
    the accepted-run bucket on a partial miss, and a fully rejected k=1
    probe parks spec at k=0 (plain steps) for _SPEC_PARK_STEPS — on
    free text even a 2-token verify loses to a plain step (PERF.md r4:
    session adaptive 17.7 vs plain 28.3 tok/s before the park)."""
    ctx = make_ctx(spec_k=8)
    s = engine.Session(ctx, "ab", max_new_tokens=4)
    s._spec_adapt(k=1, n_acc=1)            # full acceptance at k=1
    assert s._spec_k_cur == 2
    s._spec_adapt(k=2, n_acc=2)
    assert s._spec_k_cur == 4
    s._spec_adapt(k=4, n_acc=3)            # partial miss -> pow2 bucket
    assert s._spec_k_cur == 2
    s._spec_adapt(k=2, n_acc=0)            # full miss at k>1 -> floor 1
    assert s._spec_k_cur == 1
    s._spec_adapt(k=1, n_acc=0)            # rejected probe -> park
    assert s._spec_k_cur == 0
    assert s._spec_park == engine.Session._SPEC_PARK_MIN
    s._spec_adapt(k=1, n_acc=0)            # backoff doubles per rejection
    assert s._spec_park == 2 * engine.Session._SPEC_PARK_MIN
    for _ in range(8):
        s._spec_adapt(k=1, n_acc=0)
    assert s._spec_park == engine.Session._SPEC_PARK_MAX   # capped
    s._spec_adapt(k=1, n_acc=1)            # acceptance resets the backoff
    assert s._spec_k_cur == 2
    assert s._spec_park_len == engine.Session._SPEC_PARK_MIN
    s._spec_adapt(k=8, n_acc=8)            # cap respected
    assert s._spec_k_cur == 8


def test_session_spec_park_takes_plain_steps_then_reprobes():
    """While parked the session must emit via plain decode steps (no
    verify dispatches) and re-probe after the park expires; the token
    stream stays identical to plain greedy throughout."""
    ctx = make_ctx(spec_k=8)
    s = engine.Session(ctx, "ab", max_new_tokens=60)
    first = s.step()
    assert first is not None
    # force a long parked state as if k=1 probes were repeatedly rejected
    for _ in range(4):
        s._spec_adapt(k=1, n_acc=0)
    park0 = s._spec_park
    calls = {"n": 0}
    orig = speculative.verify_step

    def counting_verify(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    speculative.verify_step = counting_verify
    try:
        emitted = 0
        while emitted < park0 and s.step() is not None:
            emitted += 1
        assert calls["n"] == 0, "verify dispatched while parked"
        # park expired: the next non-pending step re-probes with k=1
        while s.step() is not None and calls["n"] == 0:
            pass
        assert calls["n"] >= 1, "never re-probed after park expiry"
    finally:
        speculative.verify_step = orig
    plain = engine.generate_sync(make_ctx(), "ab",
                                 max_new_tokens=60)
    assert s.output_ids == plain.output_ids[:len(s.output_ids)]
