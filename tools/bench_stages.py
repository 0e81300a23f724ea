"""Worker for bench.py: runs ONE panel stage in this process and prints
one JSON dict of result keys.

bench.py (the driver-facing orchestrator) launches each stage as
`python tools/bench_stages.py --stage NAME` with a timeout and lets this
process die alone on any in-process failure mode: tunnel wedge (timeout),
host-memory runaway (RLIMIT_AS -> MemoryError), or an axon teardown abort
(rc 134 after our JSON line is already out).  JAX backend init happens on
THIS process's main thread — never off-thread (CLAUDE.md: off-thread init
wedges the axon plugin).

Weights are random (throughput is content-independent); the quantized
pytrees are built in the exact device layout the .bin loader produces
(grouped int8-MXU form, binfmt._maybe_int8_layout), so a regression in
the quantized decode path shows up here.

Methodology (PERF.md, .claude/skills/verify/SKILL.md): the TPU tunnel
memoizes value-identical dispatches and adds ~30 ms fixed cost per
dispatched program, so every timed call chains inputs from previous
outputs, brackets a full host readback, and decodes inside one compiled
scan long enough to amortize the dispatch cost.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.ops import sampling
from nano_tpu.ops.qmatmul import Q80Tensor
from nano_tpu.ops.q4k import Q4KTensor, GROUP_LEN
from nano_tpu.infer import engine
from nano_tpu.serve import batching

BASELINE_RPI5_TOK_S = 10.0     # Qwen3-0.6B on Raspberry Pi 5: 8-12 tok/s
BASELINE_N150_TOK_S = 65.0     # Nano-168M Q80 on Intel N150

QWEN3_06B = dict(block_size=1024, vocab_size=151936, n_layer=28,
                 n_embd=1024, n_head=16, n_kv_head=8, n_hidden=3072,
                 head_dim=128, use_qk_norm=True, rope_style="half",
                 rope_theta=1e6, norm_eps=1e-6, tie_embeddings=True)
NANO_168M = dict(block_size=512, vocab_size=16384, n_layer=24, n_embd=768,
                 n_head=16, n_kv_head=8, n_hidden=2048)
# NANO_BENCH_TINY=1: shrink shapes for an orchestration smoke test (CPU)
if os.environ.get("NANO_BENCH_TINY"):
    QWEN3_06B = dict(block_size=256, vocab_size=512, n_layer=2,
                     n_embd=256, n_head=2, n_kv_head=1, n_hidden=512,
                     head_dim=128, use_qk_norm=True, rope_style="half",
                     rope_theta=1e6, norm_eps=1e-6, tie_embeddings=True)
    NANO_168M = dict(block_size=256, vocab_size=512, n_layer=2, n_embd=256,
                     n_head=2, n_kv_head=1, n_hidden=512)
GS = 256   # Q80 group size: the grouped int8-MXU path needs >= 256
           # (ops/qmatmul.py MIN_GROUPED_GS); our exporters default to it


# ---------------------------------------------------------------------
# random params in the loader's device layouts
# ---------------------------------------------------------------------

def _norms(cfg, rng):
    L, E, D = cfg.n_layer, cfg.n_embd, cfg.head_dim
    b = {"attn_norm": jnp.ones((L, E), jnp.float32),
         "ffn_norm": jnp.ones((L, E), jnp.float32)}
    if cfg.use_qk_norm:
        b["q_norm"] = jnp.ones((L, D), jnp.float32)
        b["k_norm"] = jnp.ones((L, D), jnp.float32)
    return b


def q80_params(cfg, rng):
    """Mirrors binfmt.quantized_device_params(fuse=True) + int8 layout."""
    def qt(*shape, inn):
        q = rng.randint(-127, 128, shape).astype(np.int8)
        s = (rng.rand(*shape[:-1], inn // GS).astype(np.float32)
             * 0.02 + 1e-3)
        return Q80Tensor(q=jnp.asarray(q), scales=jnp.asarray(s),
                         group_size=GS)

    L, E, F, V = cfg.n_layer, cfg.n_embd, cfg.n_hidden, cfg.vocab_size
    HD, KVD = cfg.n_head * cfg.head_dim, cfg.n_kv_head * cfg.head_dim
    blocks = dict(_norms(cfg, rng))
    blocks["wqkv"] = qt(L, HD + 2 * KVD, E, inn=E).to_grouped()
    blocks["wo"] = qt(L, E, HD, inn=HD).to_grouped()
    blocks["w13"] = qt(L, 2 * F, E, inn=E).to_grouped()
    blocks["w2"] = qt(L, E, F, inn=F).to_grouped()
    tok = qt(V, E, inn=E)
    return {"tok_embeddings": tok, "output_q": tok.to_grouped(),
            "norm": jnp.ones((E,), jnp.float32), "blocks": blocks}


def _q4t_packed(rng, shape_out, inn, stack=None, block_weight=True):
    """Random Q4K tensor in the loader's packed device layout.

    block_weight=True mirrors binfmt._q4k_device_params' layout knob
    (NANO_TPU_Q4K_LAYOUT=unpacked applies to block weights only; the
    embedding/head stay packed for the row gather)."""
    G = inn // GROUP_LEN
    lead = () if stack is None else (stack,)
    packed = rng.randint(0, 256, lead + (shape_out, inn // 2)).astype(np.uint8)
    s = rng.rand(*lead, shape_out, G).astype(np.float32) * 0.02 + 1e-3
    b = rng.rand(*lead, shape_out, G).astype(np.float32) * 0.02
    t = Q4KTensor(packed=jnp.asarray(packed), scales=jnp.asarray(s),
                  biases=jnp.asarray(b), in_dim=inn)
    layout = os.environ.get("NANO_TPU_Q4K_LAYOUT", "")
    if block_weight and layout == "unpacked":
        t = t.to_unpacked()
    elif block_weight and layout == "grouped":
        t = t.to_grouped()
    return t


# ---------------------------------------------------------------------
# timed programs
# ---------------------------------------------------------------------

def decode_tok_s(params, cfg, n_steps=256, reps=3, kv_dtype=jnp.bfloat16):
    """Single-stream decode on the engine's REAL path semantics:
    right-sized cache + segmented attn_len scan (what
    generate_on_device dispatches since the cache-length-bucketing
    change — the cache covers start+n_steps, not block_size, and each
    segment attends only its pow2 prefix).  NANO_TPU_DECODE_BUCKET=0
    measures the pre-bucketing full-cache path instead (the runbook's
    A/B baseline), exactly as generate_on_device would dispatch it."""
    s = sampling.SamplerConfig(temperature=0.0, repetition_penalty=1.0)
    start = 4
    # generate_on_device caps n_tokens to the cache room; mirror that or
    # _decode_segments (rightly) rejects the request.  Positions written
    # run start .. start+n_steps-1, so the cap is block_size - start.
    n_steps = min(n_steps, cfg.block_size - start)
    if engine._bucketing_enabled():
        cache_len = min(engine._bucket(start + n_steps), cfg.block_size)
        segs = engine._decode_segments(start, n_steps, cache_len)
    else:
        cache_len = cfg.block_size
        segs = [(None, n_steps)]
    cache = gpt.KVCache.create(cfg, 1, cache_len, kv_dtype)
    seen = jnp.zeros((1, cfg.vocab_size), jnp.bool_)
    key = jax.random.PRNGKey(0)
    tok = jnp.zeros((1,), jnp.int32)

    def run(tok, cache, seen, key):
        pos, outs = start, []
        for attn_b, take in segs:
            toks, cache, seen, key = engine._decode_scan(
                params, None, 0.0, tok, jnp.int32(pos), cache, seen, key,
                jnp.float32(s.temperature), jnp.float32(s.top_p),
                jnp.float32(s.repetition_penalty), cfg, jnp.bfloat16,
                s.top_k, take, True, attn_len=attn_b,
                penalized=s.repetition_penalty != 1.0)
            tok = toks[-1]
            outs.append(toks)
            pos += take
        return jnp.concatenate(outs, 0), cache, seen, key

    toks, cache, seen, key = run(tok, cache, seen, key)
    np.asarray(toks)                      # compile + warm
    best = 0.0
    for it in range(reps):
        tok = (toks[-1] + it + 1) % cfg.vocab_size     # chain values
        t0 = time.time()
        toks, cache, seen, key = run(tok, cache, seen, key)
        np.asarray(toks)                  # force full execution
        best = max(best, n_steps / (time.time() - t0))
    return best


def ttft_p50_ms(params, cfg, prompt_len=64, reps=9):
    # mirrors Session._do_prefill: the LM head runs only at the last
    # prompt position (last_idx) — the padded-width head dominated
    # quantized prefill latency (int32 group partials at 64x152k)
    cache0 = gpt.KVCache.create(cfg, 1, cfg.block_size, jnp.bfloat16)
    ids = np.zeros((1, prompt_len), np.int32)
    ids[0] = np.arange(prompt_len) % 1000 + 10
    last = jnp.int32(prompt_len - 1)
    times = []
    logits, _, _ = engine._prefill(params, None, 0.0, jnp.asarray(ids),
                                   cache0, cfg, jnp.bfloat16,
                                   last_idx=last)
    first = np.asarray(jnp.argmax(logits[0, 0]))               # warm
    for i in range(reps):
        # start at 11: the warm call used ids[0,0]=10, and a value-
        # identical dispatch would be memoized by the tunnel (a ~0 ms
        # fake sample biasing the published p50 low)
        ids[0, 0] = 11 + i                # new value -> no memoized hit
        t0 = time.time()
        logits, _, _ = engine._prefill(params, None, 0.0, jnp.asarray(ids),
                                       cache0, cfg, jnp.bfloat16,
                                       last_idx=last)
        first = np.asarray(jnp.argmax(logits[0, 0]))
        times.append((time.time() - t0) * 1e3)
    return float(np.percentile(times, 50))


def batched_aggregate(params, cfg, slots, n_steps=128, reps=2,
                      kv_dtype=jnp.int8, start_pos=380):
    """Aggregate decode throughput at the SERVING defaults: int8 KV
    cache + CAPACITY bucketing (serve/batching.py: the engine allocates
    the cache at the streams' pow2 bucket and grows it — the decode scan
    copies the whole buffer per layer, so dead tail rows cost ~6 ms/step
    at 32 slots x 1024 rows).

    start_pos models streams that already hold a prompt + some decode
    history (380 + 128 steps + 1 -> the 512 capacity bucket, exactly
    what step_burst would be running with).
    """
    if os.environ.get("NANO_BENCH_TINY"):
        start_pos = 16
    from nano_tpu.infer.engine import _bucket
    cache_len = min(cfg.block_size, _bucket(start_pos + n_steps + 1,
                                            minimum=128))
    cache = gpt.KVCache.create(cfg, slots, cache_len, kv_dtype)
    pos = jnp.full((slots,), start_pos, jnp.int32)
    tok = jnp.arange(slots, dtype=jnp.int32) % 997
    seen = jnp.zeros((slots, cfg.vocab_size), jnp.bool_)
    key = jax.random.PRNGKey(1)
    temp = jnp.zeros((slots,), jnp.float32)
    topp = jnp.full((slots,), 0.8, jnp.float32)
    rp = jnp.ones((slots,), jnp.float32)
    attn_len = None          # capacity == bucket: attend the whole cache

    def run(tok, pos, cache, seen, key):
        # greedy=True mirrors step_burst's static choice for this all-
        # temp-0 burst (compiles the sampler to a bare argmax)
        return batching._batched_scan(
            params, None, 0.0, tok, pos, cache, seen, key, temp, topp, rp,
            cfg, jnp.bfloat16, 0, n_steps, attn_len, greedy=True)

    toks, tok, pos, cache, seen, key = run(tok, pos, cache, seen, key)
    np.asarray(toks)
    best = 0.0
    for it in range(reps):
        tok = (tok + it + 1) % cfg.vocab_size
        pos = jnp.full((slots,), start_pos, jnp.int32)
        t0 = time.time()
        toks, tok, pos, cache, seen, key = run(tok, pos, cache, seen, key)
        np.asarray(toks)
        best = max(best, slots * n_steps / (time.time() - t0))
    return best


def spec_decode_tok_s(params, cfg, n_tokens=256, k=7, reps=3):
    """Speculative greedy decode on a cyclic stream (infer/speculative.py).

    Random weights decode greedily into a short cycle, so prompt-lookup
    acceptance approaches 1 — this measures the MECHANISM's ceiling
    (verify k+1 tokens at ~1 step's cost), not free-text acceptance;
    reported alongside tokens-per-round so the multiplier is explicit.
    """
    from nano_tpu.infer import speculative
    T = cfg.block_size
    prompt = ([5, 9, 3, 17, 11, 2, 29, 7] * 4)[:32]
    cache = gpt.KVCache.create(cfg, 1, T, jnp.bfloat16)
    ids = np.zeros((1, 32), np.int32)
    ids[0] = prompt
    logits, cache, _ = engine._prefill(params, None, 0.0, jnp.asarray(ids),
                                       cache, cfg, jnp.bfloat16)
    tok = jnp.argmax(logits[0, 31]).astype(jnp.int32)
    hist0 = np.zeros((T,), np.int32)
    hist0[:32] = prompt
    hist0[32] = int(tok)

    # plain greedy: empty seen-mask + rep_penalty 1.0 (the no-op values;
    # signature gained seen/rep_penalty with penalized-greedy support)
    seen = jnp.zeros((cfg.vocab_size,), jnp.bool_)

    def run(hist):
        return speculative.spec_decode_loop(
            params, None, 0.0, tok, jnp.int32(32), cache, hist,
            seen, jnp.float32(1.0), cfg, jnp.bfloat16, n_tokens, k)

    out, n_em, rounds, _ = run(jnp.asarray(hist0))
    np.asarray(out)                       # compile + warm
    best, tpr = 0.0, 0.0
    for it in range(reps):
        hist0[0] = 40 + it                # new value -> no memoized hit
        t0 = time.time()
        out, n_em, rounds, _ = run(jnp.asarray(hist0))
        np.asarray(out)                   # force full execution
        dt = time.time() - t0
        n = int(n_em)
        best = max(best, n / dt)
        tpr = n / max(int(rounds), 1)
    return best, tpr


def batched_spec_aggregate(params, cfg, slots, n_steps=64, k=7, reps=2,
                           kv_dtype=jnp.int8, start_pos=256):
    """Aggregate throughput of the SPECULATIVE batched scan on cyclic
    per-slot streams (serve/batching.py _batched_spec_scan).  Like
    spec_decode_tok_s this measures the mechanism's ceiling — every
    slot's stream is repetitive, so acceptance approaches 1 and each
    scan step emits ~k+1 tokens per slot at ~1 step's cost."""
    from nano_tpu.serve.batching import _batched_spec_scan
    from nano_tpu.infer.engine import _bucket
    if os.environ.get("NANO_BENCH_TINY"):
        start_pos = 16
    T = cfg.block_size
    # capacity bucketing like step_burst's spec branch
    cache_len = min(T, _bucket(start_pos + n_steps * (k + 1) + 2,
                               minimum=128))
    cache = gpt.KVCache.create(cfg, slots, cache_len, kv_dtype)
    pos = jnp.full((slots,), start_pos, jnp.int32)
    tok = jnp.arange(slots, dtype=jnp.int32) % 997
    seen = jnp.zeros((slots, cfg.vocab_size), jnp.bool_)
    temp = jnp.zeros((slots,), jnp.float32)
    topp = jnp.full((slots,), 0.8, jnp.float32)
    rp = jnp.ones((slots,), jnp.float32)
    spec_ok = jnp.ones((slots,), jnp.bool_)
    hist0 = np.tile(np.arange(T, dtype=np.int32) % 13, (slots, 1))

    def run(hist):
        return _batched_spec_scan(
            params, None, 0.0, tok, pos, cache, seen,
            jax.random.PRNGKey(1), hist, temp, topp, rp, spec_ok,
            cfg, jnp.bfloat16, 0, k, n_steps, None, greedy=True)

    out = run(jnp.asarray(hist0))
    np.asarray(out[0])
    best = 0.0
    for it in range(reps):
        hist0[0, 0] = 20 + it             # new value -> no memoized hit
        t0 = time.time()
        emits, n_outs, *_ = run(jnp.asarray(hist0))
        n_em = int(np.asarray(n_outs).sum())
        np.asarray(emits)
        best = max(best, n_em / (time.time() - t0))
    return best


# ---------------------------------------------------------------------
# stages — each returns a dict of result keys
# ---------------------------------------------------------------------

def stage_bf16():
    cfg = ModelConfig(**QWEN3_06B)
    pb = gpt.init_params(jax.random.PRNGKey(0), cfg,
                         param_dtype=jnp.bfloat16)
    return {"qwen3_0.6b_bf16_tok_s": round(decode_tok_s(pb, cfg), 1)}


def stage_q80():
    # the PRIMARY metric's stage: decode only (TTFT measures in its own
    # stage) so the headline number lands as early as possible even in a
    # flaky-tunnel window
    cfg = ModelConfig(**QWEN3_06B)
    pq = q80_params(cfg, np.random.RandomState(0))
    q80 = decode_tok_s(pq, cfg)
    return {"qwen3_0.6b_q80_tok_s": round(q80, 1),
            "qwen3_0.6b_q80_kv8_tok_s": round(
                decode_tok_s(pq, cfg, kv_dtype=jnp.int8), 1)}


def stage_ttft():
    cfg = ModelConfig(**QWEN3_06B)
    pq = q80_params(cfg, np.random.RandomState(0))
    out = {"ttft_p50_ms_q80_p64": round(ttft_p50_ms(pq, cfg), 1)}
    del pq
    pb = gpt.init_params(jax.random.PRNGKey(0), cfg,
                         param_dtype=jnp.bfloat16)
    out["ttft_p50_ms_bf16_p64"] = round(ttft_p50_ms(pb, cfg), 1)
    return out


def stage_batched():
    cfg = ModelConfig(**QWEN3_06B)
    pq = q80_params(cfg, np.random.RandomState(0))
    return {"q80_batch8_agg_tok_s": round(batched_aggregate(pq, cfg, 8), 1),
            "q80_batch32_agg_tok_s": round(
                batched_aggregate(pq, cfg, 32), 1),
            # 64 slots kept scaling once capacity bucketing removed the
            # B-proportional dead-tail copy (pre-fix it was SLOWER than
            # 32: 1636 vs 2049 agg)
            "q80_batch64_agg_tok_s": round(
                batched_aggregate(pq, cfg, 64), 1)}


TRAINED_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "trained")


def stage_spec():
    """Speculative decode on the committed TRAINED fixture
    (tests/fixtures/trained, tools/make_trained_fixture.py).

    Random weights can only measure speculative OVERHEAD (an n-gram
    draft never matches a random argmax — round 4 reported
    tokens/round 1.00, i.e. nothing).  The trained toy memorized a
    cyclic chorus, so a chorus prompt measures the real mechanism
    (drafts accepted, tokens/round > 1) and a free-text prompt
    exercises the adaptive Session's rejection/park guarantee.
    Reference contrast: the C engine has no speculative path at all
    (infer/infer.c:1196-1308)."""
    tiny = bool(os.environ.get("NANO_BENCH_TINY"))
    meta = json.load(open(os.path.join(TRAINED_FIXTURE, "META.json")))
    chorus = meta["chorus"]
    corpus = open(os.path.join(TRAINED_FIXTURE, "corpus.txt"),
                  encoding="utf-8").read()
    ctx = engine.LLMContext.from_bin(
        os.path.join(TRAINED_FIXTURE, "toy_q80.bin"), spec_k=7)
    n_new = 48 if tiny else 160
    out = {}

    # --- repetitive case: fixed-k generate_on_device, spec vs plain ---
    def timed_generate(spec_k, rep):
        # vary the prompt per rep: the tunnel memoizes value-identical
        # dispatches (a repeat run would time ~0)
        prompt = chorus[rep:] + chorus * 2
        ids = ctx.encode(prompt)
        ctx.spec_k = spec_k
        t0 = time.time()
        toks = engine.generate_on_device(ctx, ids, n_new)
        return len(toks) / (time.time() - t0), toks

    sp = pl = 0.0
    match = True
    for rep in range(3):
        s, stoks = timed_generate(7, rep)
        p, ptoks = timed_generate(0, rep)
        # reported, not asserted: on trained models the (1, k+1) verify
        # program can round near-tie argmaxes differently than the T=1
        # program (CLAUDE.md — quality-neutral); a flip must not cost
        # the whole stage's keys
        match = match and list(stoks) == list(ptoks)
        sp, pl = max(sp, s), max(pl, p)
    out["toy_q80_spec_tok_s"] = round(sp, 1)
    out["toy_q80_plain_tok_s"] = round(pl, 1)
    out["toy_q80_spec_plain_match"] = bool(match)
    out["toy_q80_spec_speedup_repetitive"] = round(sp / pl, 2)

    # --- tokens/round on the chorus (deterministic count) ---
    from nano_tpu.infer import speculative
    ids = ctx.encode(chorus * 2)
    n = len(ids)
    cache = ctx.new_cache(1)
    pad = engine._bucket(n)
    arr = np.zeros((1, pad), np.int32)
    arr[0, :n] = ids
    logits, cache, _ = engine._prefill(ctx.params, None, 0.0,
                                       jnp.asarray(arr), cache, ctx.cfg,
                                       jnp.bfloat16, attn_len=pad)
    tok = jnp.argmax(logits[0, n - 1]).astype(jnp.int32)
    hist = np.zeros((ctx.max_seq_len,), np.int32)
    hist[:n] = ids
    hist[n] = int(tok)
    seen = jnp.zeros((ctx.cfg.vocab_size,), jnp.bool_)
    _, n_em, rounds, _ = speculative.spec_decode_loop(
        ctx.params, None, 0.0, tok, jnp.int32(n), cache,
        jnp.asarray(hist), seen, jnp.float32(1.0), ctx.cfg, jnp.bfloat16,
        n_new, 7)
    out["spec_tokens_per_round_trained"] = round(
        int(n_em) / max(int(rounds), 1), 2)

    # --- free text: adaptive Session (parks on rejection) vs plain ---
    def session_tok_s(spec_k, rep):
        ctx.spec_k = spec_k
        prompt = corpus[rep * 7:rep * 7 + 100]
        sess = engine.Session(ctx, prompt, max_new_tokens=n_new)
        t0 = time.time()
        n_toks = 0
        while sess.step() is not None:
            n_toks += 1
        return n_toks / (time.time() - t0)

    ratios = []
    for rep in range(2):
        s = session_tok_s(7, rep)
        p = session_tok_s(0, rep)
        ratios.append(s / p)
    out["toy_q80_spec_free_ratio"] = round(max(ratios), 2)

    # park guarantee on genuinely UNSEEN text: the corpus reversed is
    # encodable (same charset) but never occurred in training, so
    # drafts reject and the adaptive Session must park to >= ~0.93x
    # plain (free_ratio above can exceed 1 because the toy memorized
    # its corpus — n-gram matches accept even on "free" prompts)
    def session_unseen_tok_s(spec_k, rep):
        ctx.spec_k = spec_k
        prompt = corpus[rep * 5:rep * 5 + 100][::-1]
        sess = engine.Session(ctx, prompt, max_new_tokens=n_new)
        t0 = time.time()
        n_toks = 0
        while sess.step() is not None:
            n_toks += 1
        return max(n_toks, 1) / (time.time() - t0)

    ratios = []
    for rep in range(2):
        s = session_unseen_tok_s(7, rep)
        p = session_unseen_tok_s(0, rep)
        ratios.append(s / p)
    out["toy_q80_spec_unseen_ratio"] = round(max(ratios), 2)
    return out


def stage_q4k():
    # Q4K in the loader's packed layout (binfmt._q4k_device_params)
    cfg = ModelConfig(**QWEN3_06B)
    rng = np.random.RandomState(0)
    L, E, F, V = cfg.n_layer, cfg.n_embd, cfg.n_hidden, cfg.vocab_size
    HD, KVD = cfg.n_head * cfg.head_dim, cfg.n_kv_head * cfg.head_dim
    blocks = dict(_norms(cfg, rng))
    blocks["wqkv"] = _q4t_packed(rng, HD + 2 * KVD, E, stack=L)
    blocks["wo"] = _q4t_packed(rng, E, HD, stack=L)
    blocks["w13"] = _q4t_packed(rng, 2 * F, E, stack=L)
    blocks["w2"] = _q4t_packed(rng, E, F, stack=L)
    tok = _q4t_packed(rng, V, E, block_weight=False)
    # the loader requantizes a Q4K head to grouped Q80-256 at load
    # (binfmt._maybe_int8_layout) — mirror that here
    head_q = rng.randint(-127, 128, (V, E)).astype(np.int8)
    head_s = rng.rand(V, E // 256).astype(np.float32) * 0.02 + 1e-3
    head = Q80Tensor(q=jnp.asarray(head_q), scales=jnp.asarray(head_s),
                     group_size=256).to_grouped()
    p4 = {"tok_embeddings": tok, "output_q": head,
          "norm": jnp.ones((E,), jnp.float32), "blocks": blocks}
    return {"qwen3_0.6b_q4k_tok_s": round(decode_tok_s(p4, cfg), 1)}


def stage_nano168m():
    # round-1 continuity: Nano-168M bf16, plus Q80 for the apples-to-
    # apples bar (the N150 reference number IS Q80, BASELINE.md)
    ncfg = ModelConfig(**NANO_168M)
    pn = gpt.init_params(jax.random.PRNGKey(0), ncfg,
                         param_dtype=jnp.bfloat16)
    nano = decode_tok_s(pn, ncfg, n_steps=512)
    del pn
    pq = q80_params(ncfg, np.random.RandomState(0))
    nano_q80 = decode_tok_s(pq, ncfg, n_steps=512)
    return {"nano168m_bf16_tok_s": round(nano, 1),
            "nano168m_q80_tok_s": round(nano_q80, 1),
            "nano168m_vs_n150_q80": round(
                nano_q80 / BASELINE_N150_TOK_S, 2)}


PPL_ROOTS = tuple(os.environ.get("NANO_BENCH_PPL_ROOTS",
                                 "/tmp/r4:/tmp/r3").split(":"))


def stage_ppl():
    """PPL + quantization deltas.  Preferred: the round's 56M trained
    exports when a runbook left them under /tmp (north-star scale).
    Always-available fallback: the COMMITTED trained toy fixture
    (tests/fixtures/trained) — its f32 PPL is a training-quality canary
    and the Q80/Q4K deltas measure pure quantization noise, so the
    panel carries PPL keys every round instead of only after a manual
    runbook (round-4 verdict weak-spot #2)."""
    import eval as evalmod
    out = {}
    root = next((r for r in PPL_ROOTS
                 if os.path.exists(f"{r}/m56_f32.bin")
                 and os.path.exists(f"{r}/eval_text.txt")), None)
    if root is not None:
        text = open(f"{root}/eval_text.txt", encoding="utf-8").read()
        base = evalmod.model_ppl(f"{root}/m56_f32.bin", text)
        out["ppl_f32_56m"] = round(base, 4)
        for q in ("q80", "q4k"):
            p = f"{root}/m56_{q}.bin"
            if os.path.exists(p):
                out[f"ppl_delta_{q}_56m"] = round(
                    evalmod.model_ppl(p, text) - base, 4)
    text = open(os.path.join(TRAINED_FIXTURE, "corpus.txt"),
                encoding="utf-8").read()
    if os.environ.get("NANO_BENCH_TINY"):
        text = text[:600]
    base = evalmod.model_ppl(
        os.path.join(TRAINED_FIXTURE, "toy_f32.bin"), text)
    out["ppl_f32_toy"] = round(base, 4)
    for q in ("q80", "q4k"):
        out[f"ppl_delta_{q}_toy"] = round(evalmod.model_ppl(
            os.path.join(TRAINED_FIXTURE, f"toy_{q}.bin"), text) - base, 4)
    return out


def _env_canary():
    """Environment drift canary: raw bf16 matmul TFLOP/s + per-dispatch
    round-trip ms.  The round-4 train regression (34.8k -> 22.8k tok/s)
    was ENVIRONMENTAL (tunnel-side compiler; tools/diag_train_regression
    .py) but only a hand-run diagnosis could tell — these keys make
    drift attributable at a glance on every panel.

    Tunnel methodology (PERF.md): the matmul timing differences two scan
    lengths inside compiled lax.scan (cancels the ~30 ms dispatch cost),
    chaining the carry so nothing is hoisted or memoized; dispatch_ms
    round-trips a fresh scalar each rep (new value -> no memoized hit)."""
    N = 1024 if os.environ.get("NANO_BENCH_TINY") else 8192
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (N, N), jnp.bfloat16)
    b = (jax.random.normal(jax.random.PRNGKey(1), (N, N), jnp.bfloat16)
         / np.float32(np.sqrt(N)))

    import functools
    # b is an ARGUMENT, not a closure constant: a captured 134 MB weight
    # becomes a compile-time constant and the tunnel rejects the >100 MB
    # program (HTTP 413, CLAUDE.md)
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(y0, b, n):
        def chain(y, _):
            return (y @ b).astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(chain, y0, None, length=n)
        # scalar result: a full-matrix readback ships 134 MB through the
        # HTTP tunnel (minutes); the sum still forces the whole chain
        return jnp.sum(y.astype(jnp.float32))

    short, long_ = 4, 20
    np.asarray(run(a, b, short)); np.asarray(run(a, b, long_))  # warm
    best = 0.0
    y = a
    for rep in range(3):
        y = y + jnp.bfloat16(rep + 1)      # chain values across reps
        t0 = time.time()
        np.asarray(run(y, b, long_))
        t1 = time.time()
        np.asarray(run(y, b, short))
        dt = (t1 - t0) - (time.time() - t1)
        if dt > 0:
            best = max(best, 2 * N ** 3 * (long_ - short) / dt / 1e12)
    times = []
    for i in range(7):
        t0 = time.time()
        np.asarray(jnp.float32(i + 1) * jnp.float32(1.5))
        times.append((time.time() - t0) * 1e3)
    for arr in (a, b):
        try:
            arr.delete()                   # free HBM before the nested
        except Exception:                  # train subprocess spins up
            pass
    return {"chip_bf16_tflops_canary": round(best, 1),
            "dispatch_ms_canary": round(float(np.median(times)), 1)}


def stage_train():
    # training throughput at Nano-168M batch 64 (BASELINE.md:12-13).
    # Nested subprocess (bench_train.py --one) kept: it already isolates
    # the ~14 GB training HBM footprint and reports a clean JSON row.
    import subprocess
    # canary in its OWN subprocess: initializing the TPU backend in this
    # process would leave a live HBM client alongside the ~14 GB nested
    # train run.  The canary is drift ATTRIBUTION, never worth the
    # train keys — any failure (slow-tunnel timeout, crash) is recorded
    # and the train measurement proceeds.
    out = {}
    try:
        rc = subprocess.run([sys.executable, "tools/bench_stages.py",
                             "--canary"], capture_output=True, text=True,
                            timeout=300, cwd=".")
        rows = [ln for ln in rc.stdout.splitlines()
                if ln.startswith("NANO_BENCH_RESULT ")]
        if rows:
            out.update(json.loads(rows[-1][len("NANO_BENCH_RESULT "):]))
    except (subprocess.TimeoutExpired, subprocess.SubprocessError,
            json.JSONDecodeError, OSError) as e:
        out["canary_error"] = f"{type(e).__name__}"
    # ffn: the fastest fitting policy under the CURRENT server-side
    # compiler (r4d sweep: 1272 ms vs full's 1555/1780; full remat was
    # faster in the r2-era environment — see PERF.md regression notes)
    combo = os.environ.get("NANO_BENCH_TRAIN_COMBO", "ffn:0")
    r = subprocess.run(
        [sys.executable, "tools/bench_train.py", "--one", combo],
        capture_output=True, text=True, timeout=900, cwd=".")
    rows = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    rec = json.loads(rows[-1]) if rows else {}
    if "tok_s" not in rec:
        raise RuntimeError(rec.get("error") or (r.stderr or r.stdout)[-200:])
    out.update({"nano168m_train_tok_s": rec["tok_s"],
                "nano168m_train_ms_step": rec["ms_step"],
                "train_remat_policy": combo})
    return out


STAGES = {
    "bf16": stage_bf16,
    "ttft": stage_ttft,
    "q80": stage_q80,
    "batched": stage_batched,
    "spec": stage_spec,
    "q4k": stage_q4k,
    "nano168m": stage_nano168m,
    "ppl": stage_ppl,
    "train": stage_train,
}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=sorted(STAGES))
    ap.add_argument("--canary", action="store_true",
                    help="run only the environment canary (own process: "
                         "keeps the TPU backend out of the train stage)")
    args = ap.parse_args()
    if args.canary:
        print("NANO_BENCH_RESULT " + json.dumps(_env_canary()), flush=True)
        return
    if not args.stage:
        ap.error("--stage or --canary required")
    # Cap this stage's address space: a runaway stage must die a clean
    # MemoryError here, not OOM-kill the host (observed: 130 GB RSS).
    cap = int(os.environ.get("NANO_BENCH_RSS_CAP_GB", "48")) << 30
    try:
        soft, hard = resource.getrlimit(resource.RLIMIT_AS)
        resource.setrlimit(resource.RLIMIT_AS, (cap, hard))
    except (ValueError, OSError):
        pass
    out = STAGES[args.stage]()
    print("NANO_BENCH_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
