"""C++ host engine: three-way greedy parity (C++ vs JAX vs reference C)
on shared .bin files, logits agreement, tokenizers, LoRA, seq2seq."""

import os
import subprocess

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.io import binfmt
from nano_tpu.infer import engine
from nano_tpu.ops import sampling
from nano_tpu.tokenizer.trie import TrieTokenizer
from nano_tpu import cpp_engine
from .conftest import REPO_ROOT
from .test_cross_engine import oracle_ok, run_oracle

cpp_ok = cpp_engine.build()


def make_tiny(tmp_path, quant, seed=7):
    cfg = ModelConfig(block_size=64, vocab_size=64, n_layer=2, n_embd=32,
                      n_head=4, n_kv_head=2, n_hidden=64)
    params = gpt.init_params(jax.random.PRNGKey(seed), cfg)
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(52)])
    path = str(tmp_path / f"tiny_{quant}.bin")
    binfmt.write_model(path, jax.tree.map(np.asarray, params), cfg,
                       tok.config, quant=quant)
    return cfg, params, tok, path


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
@pytest.mark.parametrize("quant", ["f32", "q80", "q4k"])
def test_cpp_greedy_matches_jax(tmp_path, quant):
    cfg, params, tok, path = make_tiny(tmp_path, quant)
    prompt_ids = tok.encode("abcdefgh")

    with cpp_engine.CppEngine(path, max_seq_len=64, temperature=0.0,
                              repetition_penalty=1.0) as eng:
        assert eng.vocab_size == 64
        assert eng.encode("abcdefgh") == prompt_ids
        cpp_out = eng.generate(prompt_ids, 16)

    ctx = engine.LLMContext.from_bin(
        path, max_seq_len=64, dtype=jnp.float32,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0))
    session = engine.Session(ctx, "abcdefgh", max_new_tokens=16)
    jax_out = []
    while (t := session.step()) is not None:
        jax_out.append(t)
    assert cpp_out == jax_out, f"cpp={cpp_out} jax={jax_out}"


@pytest.mark.skipif(not (cpp_ok and oracle_ok),
                    reason="C++ engine or reference oracle unavailable")
@pytest.mark.parametrize("quant", ["f32", "q80", "q4k"])
def test_cpp_greedy_matches_reference_c(tmp_path, quant):
    cfg, params, tok, path = make_tiny(tmp_path, quant)
    prompt = "abcdefgh"
    ref_prompt_ids, ref_out = run_oracle(path, prompt, max_new=16,
                                         temperature=0.0)
    with cpp_engine.CppEngine(path, max_seq_len=64, temperature=0.0,
                              repetition_penalty=1.0) as eng:
        assert eng.encode(prompt) == ref_prompt_ids
        cpp_out = eng.generate(ref_prompt_ids, 16)
    ref_trimmed = [t for t in ref_out if t not in (0, 3)]
    assert cpp_out == ref_trimmed[:len(cpp_out)]
    assert len(cpp_out) >= min(8, len(ref_trimmed))


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_cpp_logits_close_to_jax_f32(tmp_path):
    cfg, params, tok, path = make_tiny(tmp_path, "f32")
    with cpp_engine.CppEngine(path, max_seq_len=64) as eng:
        cpp_logits = eng.forward(5, 0)
    ctx = engine.LLMContext.from_bin(path, max_seq_len=64, dtype=jnp.float32)
    cache = gpt.KVCache.create(cfg, 1, 64, jnp.float32)
    logits, _ = gpt.forward_with_cache(
        ctx.params, jnp.asarray([[5]], jnp.int32), cache, jnp.int32(0),
        cfg, jnp.float32)
    # note: the C++ engine hardcodes rmsnorm eps=1e-5 like the reference C
    np.testing.assert_allclose(cpp_logits, np.asarray(logits[0, 0]),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_cpp_lora_changes_output_and_matches_jax(tmp_path):
    cfg, params, tok, path = make_tiny(tmp_path, "f32")
    rng = np.random.RandomState(0)
    L, E, H, KV, D = (cfg.n_layer, cfg.n_embd, cfg.n_head, cfg.n_kv_head,
                      cfg.head_dim)
    r = 4
    lora = {
        "wq_a": rng.randn(L, E, r).astype(np.float32) * 0.2,
        "wq_b": rng.randn(L, r, H * D).astype(np.float32) * 0.2,
        "wk_a": rng.randn(L, E, r).astype(np.float32) * 0.2,
        "wk_b": rng.randn(L, r, KV * D).astype(np.float32) * 0.2,
        "wv_a": rng.randn(L, E, r).astype(np.float32) * 0.2,
        "wv_b": rng.randn(L, r, KV * D).astype(np.float32) * 0.2,
        "wo_a": rng.randn(L, H * D, r).astype(np.float32) * 0.2,
        "wo_b": rng.randn(L, r, E).astype(np.float32) * 0.2,
    }
    lora_path = str(tmp_path / "l.bin")
    binfmt.write_lora(lora_path, lora, cfg, rank=r, alpha=8)
    ids = tok.encode("abcdef")

    with cpp_engine.CppEngine(path, max_seq_len=64, temperature=0.0,
                              repetition_penalty=1.0) as eng:
        base = eng.generate(ids, 10)
        eng.attach_lora(lora_path)
        with_lora = eng.generate(ids, 10)
        eng.detach_lora()
        again = eng.generate(ids, 10)
    assert base == again
    assert base != with_lora

    ctx = engine.LLMContext.from_bin(
        path, max_seq_len=64, dtype=jnp.float32,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0))
    ctx.load_lora(lora_path)
    jax_out = engine.generate_on_device(ctx, ids, 10).tolist()
    jax_out = [t for t in jax_out if t not in engine.NANO_STOP_TOKENS]
    assert with_lora == jax_out[:len(with_lora)]


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_cpp_seq2seq_matches_jax(tmp_path):
    cfg = ModelConfig(block_size=16, vocab_size=32, n_layer=2, n_embd=32,
                      n_head=4, n_kv_head=4, n_hidden=64, is_causal=False)
    params = gpt.init_params(jax.random.PRNGKey(3), cfg)
    tok = TrieTokenizer()
    tok.build(list("0123456789"))
    path = str(tmp_path / "s2s.bin")
    binfmt.write_model(path, jax.tree.map(np.asarray, params), cfg,
                       tok.config, quant="f32")
    ids = tok.encode("3141592653589793")

    ctx = engine.LLMContext.from_bin(path, max_seq_len=16, dtype=jnp.float32)
    jax_out = engine.seq2seq(ctx, ids)
    with cpp_engine.CppEngine(path, max_seq_len=16) as eng:
        cpp_out = eng.seq2seq(ids)
    assert cpp_out == list(jax_out)


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_cpp_stochastic_sampling_reproducible(tmp_path):
    cfg, params, tok, path = make_tiny(tmp_path, "f32")
    ids = tok.encode("abc")
    with cpp_engine.CppEngine(path, max_seq_len=64, temperature=0.9,
                              top_p=0.8, repetition_penalty=1.1,
                              seed=42) as eng:
        a = eng.generate(ids, 12)
        eng.set_sampler(0.9, 0.8, 1.1, seed=42)
        b = eng.generate(ids, 12)
    assert a == b and len(a) > 0


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_cpp_tokenizer_roundtrip(tmp_path):
    cfg, params, tok, path = make_tiny(tmp_path, "f32")
    with cpp_engine.CppEngine(path) as eng:
        ids = eng.encode("hello world")
        assert ids == tok.encode("hello world")
        assert eng.decode(ids) == tok.decode(ids)


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_cpp_rejects_garbage_file(tmp_path):
    p = tmp_path / "garbage.bin"
    p.write_bytes(b"\x00" * 1024)
    with pytest.raises(RuntimeError):
        cpp_engine.CppEngine(str(p))


def test_cpp_qwen3_matches_jax(tmp_path):
    """Qwen3 arch through the C++ engine: BPE field parse, chat template,
    qk-norm + half RoPE + untied classifier, greedy parity with JAX."""
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    if not cpp_ok:
        pytest.skip("C++ engine not built")
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM
    from nano_tpu.io.qwen import convert_hf_qwen
    from .test_qwen import _write_toy_hf_tokenizer_json

    d = tmp_path / "hf"
    d.mkdir()
    qcfg = Qwen3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rope_theta=1e6,
        rms_norm_eps=1e-6, tie_word_embeddings=False)
    torch.manual_seed(0)
    Qwen3ForCausalLM(qcfg).save_pretrained(str(d), safe_serialization=True)
    _write_toy_hf_tokenizer_json(str(d / "tokenizer.json"), 512)
    out = str(tmp_path / "qwen3.bin")
    convert_hf_qwen(str(d), out, quant="f32")

    ctx = engine.LLMContext.from_bin(
        out, max_seq_len=64, dtype=jnp.float32,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0))
    ids = ctx.encode("hello")
    jax_out = [t for t in engine.generate_on_device(ctx, ids, 10).tolist()
               if t not in ctx.stop_tokens]
    with cpp_engine.CppEngine(out, max_seq_len=64, temperature=0.0,
                              repetition_penalty=1.0) as eng:
        assert eng.encode("hello") == ids
        cpp_out = eng.generate(ids, 10)
    assert cpp_out == jax_out[:len(cpp_out)] and len(cpp_out) >= 5


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_cpp_ppl_matches_jax(tmp_path):
    """eval.py --engine cpp scores the same .bin within float-accumulation
    noise of the JAX engine (same strided-window token accounting)."""
    import sys
    sys.path.insert(0, str(REPO_ROOT))
    import eval as eval_mod

    cfg, params, tok, path = make_tiny(tmp_path, "f32")
    text = "abc defg hij klmno " * 12
    jax_ppl = eval_mod.model_ppl(path, text, block_size=32, stride=16)
    cpp_ppl = eval_mod.cpp_model_ppl(path, text, block_size=32, stride=16)
    assert abs(jax_ppl - cpp_ppl) / jax_ppl < 1e-3, (jax_ppl, cpp_ppl)


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
@pytest.mark.parametrize("quant", ["f32", "q80", "q4k"])
def test_batched_prefill_matches_per_token(tmp_path, quant):
    """NANO_CPP_BATCH_PREFILL=0/1 must produce identical greedy streams —
    the GEMM prefill reuses the per-token row-dot bodies, so the KV
    cache it writes is bit-identical (long prompt engages the P>8 gate)."""
    cfg, params, tok, path = make_tiny(tmp_path, quant)
    prompt = "abcdefghij" * 4                        # 40 prompt tokens
    cli = os.path.join(REPO_ROOT, "build", "nano_cpp")
    outs = []
    for flag in ("0", "1"):
        env = dict(os.environ, NANO_CPP_BATCH_PREFILL=flag)
        r = subprocess.run(
            [cli, path, "-t", "0", "-r", "1.0", "-n", "12", "-c", "64",
             "-q", prompt],
            capture_output=True, text=True, env=env, timeout=300)
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout)
    assert outs[0] == outs[1]


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_batched_prefill_with_lora_matches_per_token(tmp_path):
    """LoRA deltas apply inside the batched prefill too (per position,
    same order as the per-token path)."""
    cfg, params, tok, path = make_tiny(tmp_path, "f32")
    r, E = 4, cfg.n_embd
    L, H, KV, D = (cfg.n_layer, cfg.n_head, cfg.n_kv_head, cfg.head_dim)
    rng = np.random.RandomState(3)
    lora = {
        "wq_a": rng.randn(L, E, r).astype(np.float32) * 0.2,
        "wq_b": rng.randn(L, r, H * D).astype(np.float32) * 0.2,
        "wk_a": rng.randn(L, E, r).astype(np.float32) * 0.2,
        "wk_b": rng.randn(L, r, KV * D).astype(np.float32) * 0.2,
        "wv_a": rng.randn(L, E, r).astype(np.float32) * 0.2,
        "wv_b": rng.randn(L, r, KV * D).astype(np.float32) * 0.2,
        "wo_a": rng.randn(L, H * D, r).astype(np.float32) * 0.2,
        "wo_b": rng.randn(L, r, E).astype(np.float32) * 0.2,
    }
    lora_path = str(tmp_path / "l.bin")
    binfmt.write_lora(lora_path, lora, cfg, rank=r, alpha=8)

    cli = os.path.join(REPO_ROOT, "build", "nano_cpp")
    outs = []
    for flag in ("0", "1"):
        env = dict(os.environ, NANO_CPP_BATCH_PREFILL=flag)
        res = subprocess.run(
            [cli, path, "-l", lora_path, "-t", "0", "-r", "1.0", "-n",
             "10", "-c", "64", "-q", "abcdefghij" * 4],
            capture_output=True, text=True, env=env, timeout=300)
        assert res.returncode == 0, res.stderr
        outs.append(res.stdout)
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_cpp_qwen3_batched_prefill_matches_per_token(tmp_path):
    """Qwen3's extra prefill branches (per-head qk-norm, half RoPE,
    untied classifier) through the batched GEMM path: CLI output is
    byte-identical with NANO_CPP_BATCH_PREFILL=0/1 (the chat template
    makes the prompt long enough to engage the P>8 gate)."""
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    if not cpp_ok:
        pytest.skip("C++ engine not built")
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM
    from nano_tpu.io.qwen import convert_hf_qwen
    from .test_qwen import _write_toy_hf_tokenizer_json

    d = tmp_path / "hf"
    d.mkdir()
    qcfg = Qwen3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rope_theta=1e6,
        rms_norm_eps=1e-6, tie_word_embeddings=False)
    torch.manual_seed(1)
    Qwen3ForCausalLM(qcfg).save_pretrained(str(d), safe_serialization=True)
    _write_toy_hf_tokenizer_json(str(d / "tokenizer.json"), 512)
    out = str(tmp_path / "qwen3.bin")
    convert_hf_qwen(str(d), out, quant="f32")

    cli = os.path.join(REPO_ROOT, "build", "nano_cpp")
    outs = []
    for flag in ("0", "1"):
        env = dict(os.environ, NANO_CPP_BATCH_PREFILL=flag)
        res = subprocess.run(
            [cli, out, "-t", "0", "-r", "1.0", "-n", "8", "-c", "64",
             "-q", "hello world hello world"],
            capture_output=True, text=True, env=env, timeout=300)
        assert res.returncode == 0, res.stderr
        outs.append(res.stdout)
    assert outs[0] == outs[1] and len(outs[0]) > 0


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
@pytest.mark.parametrize("quant", ["f32", "q80", "q4k"])
def test_spec_decode_matches_plain(tmp_path, quant):
    """NANO_CPP_SPEC=k must produce identical greedy output — verify
    rounds reuse the prefill GEMM row-dot bodies at an offset, and
    acceptance is exact argmax equality (cpp/nano.cpp spec_round)."""
    cfg, params, tok, path = make_tiny(tmp_path, quant)
    cli = os.path.join(REPO_ROOT, "build", "nano_cpp")
    outs = []
    for spec in ("0", "7"):
        env = dict(os.environ, NANO_CPP_SPEC=spec)
        r = subprocess.run(
            [cli, path, "-t", "0", "-r", "1.0", "-n", "24", "-c", "64",
             "-T", "-q", "abcabcabcabc"],
            capture_output=True, text=True, env=env, timeout=300)
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout)
    assert outs[0] == outs[1] and len(outs[0]) > 0


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_spec_decode_with_lora_matches_plain(tmp_path):
    """Speculative verify applies LoRA deltas per position (same GEMM
    path as the LoRA batched prefill)."""
    cfg, params, tok, path = make_tiny(tmp_path, "f32")
    r, E = 4, cfg.n_embd
    L, H, KV, D = (cfg.n_layer, cfg.n_head, cfg.n_kv_head, cfg.head_dim)
    rng = np.random.RandomState(5)
    lora = {
        "wq_a": rng.randn(L, E, r).astype(np.float32) * 0.2,
        "wq_b": rng.randn(L, r, H * D).astype(np.float32) * 0.2,
        "wk_a": rng.randn(L, E, r).astype(np.float32) * 0.2,
        "wk_b": rng.randn(L, r, KV * D).astype(np.float32) * 0.2,
        "wv_a": rng.randn(L, E, r).astype(np.float32) * 0.2,
        "wv_b": rng.randn(L, r, KV * D).astype(np.float32) * 0.2,
        "wo_a": rng.randn(L, H * D, r).astype(np.float32) * 0.2,
        "wo_b": rng.randn(L, r, E).astype(np.float32) * 0.2,
    }
    lora_path = str(tmp_path / "ls.bin")
    binfmt.write_lora(lora_path, lora, cfg, rank=r, alpha=8)
    cli = os.path.join(REPO_ROOT, "build", "nano_cpp")
    outs = []
    for spec in ("0", "5"):
        env = dict(os.environ, NANO_CPP_SPEC=spec)
        res = subprocess.run(
            [cli, path, "-l", lora_path, "-t", "0", "-r", "1.0", "-n",
             "16", "-c", "64", "-T", "-q", "ababababab"],
            capture_output=True, text=True, env=env, timeout=300)
        assert res.returncode == 0, res.stderr
        outs.append(res.stdout)
    assert outs[0] == outs[1] and len(outs[0]) > 0


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_spec_decode_ignored_for_sampling(tmp_path):
    """NANO_CPP_SPEC with temperature > 0 must not change stochastic
    output (spec_eligible gates on greedy + no penalty)."""
    cfg, params, tok, path = make_tiny(tmp_path, "f32")
    cli = os.path.join(REPO_ROOT, "build", "nano_cpp")
    outs = []
    for spec in ("0", "7"):
        env = dict(os.environ, NANO_CPP_SPEC=spec)
        r = subprocess.run(
            [cli, path, "-t", "0.8", "-p", "0.9", "-r", "1.1", "-s", "11",
             "-n", "16", "-c", "64", "-T", "-q", "abcd"],
            capture_output=True, text=True, env=env, timeout=300)
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout)
    assert outs[0] == outs[1]


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
@pytest.mark.parametrize("quant", ["f32", "q80"])
def test_spec_decode_penalized_greedy_matches_plain(tmp_path, quant):
    """NANO_CPP_SPEC with -r 1.05 (the reference CLI's default-style
    penalized greedy): per-row penalty over seen + draft prefix must
    reproduce sequential Sampler::sample bit-for-bit."""
    cfg, params, tok, path = make_tiny(tmp_path, quant)
    cli = os.path.join(REPO_ROOT, "build", "nano_cpp")
    outs = []
    for spec in ("0", "7"):
        env = dict(os.environ, NANO_CPP_SPEC=spec)
        r = subprocess.run(
            [cli, path, "-t", "0", "-r", "1.05", "-n", "24", "-c", "64",
             "-T", "-q", "abcabcabcabc"],
            capture_output=True, text=True, env=env, timeout=300)
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout)
    assert outs[0] == outs[1] and len(outs[0]) > 0


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_cpp_rejects_truncated_tokenizer_field(tmp_path):
    """A .bin truncated inside the tokenizer field must load-fail
    cleanly (bounds-checked parse), not crash."""
    cfg, params, tok, path = make_tiny(tmp_path, "f32")
    blob = open(path, "rb").read()
    cut = str(tmp_path / "cut.bin")
    open(cut, "wb").write(blob[:300])      # header + partial tokenizer
    from nano_tpu import cpp_engine
    with pytest.raises(Exception):
        with cpp_engine.CppEngine(cut, max_seq_len=64) as eng:
            eng.generate([1], 2)


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_cpp_forward_rejects_out_of_bounds(tmp_path):
    """Out-of-range pos/token through the C API returns an error (the
    throw never unwinds into ctypes; previously heap corruption)."""
    cfg, params, tok, path = make_tiny(tmp_path, "f32")
    from nano_tpu import cpp_engine
    with cpp_engine.CppEngine(path, max_seq_len=32) as eng:
        with pytest.raises(RuntimeError):
            eng.forward(1, 999)            # pos past max_seq/block_size
        with pytest.raises(RuntimeError):
            eng.forward(10 ** 6, 0)        # token past vocab
        with pytest.raises(RuntimeError):
            eng.seq2seq(list(range(64)) * 2)   # input longer than ctx
        # engine still healthy afterwards
        assert len(eng.generate(eng.encode("ab"), 4)) >= 0


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_cpp_failed_reattach_keeps_old_lora(tmp_path):
    """attach_lora(bad) after attach_lora(good) must keep the good
    adapter fully intact (no dangling blob pointers)."""
    cfg, params, tok, path = make_tiny(tmp_path, "f32")
    r, E = 4, cfg.n_embd
    L, H, KV, D = (cfg.n_layer, cfg.n_head, cfg.n_kv_head, cfg.head_dim)
    rng = np.random.RandomState(9)
    lora = {k: rng.randn(*shape).astype(np.float32) * 0.2
            for k, shape in [
                ("wq_a", (L, E, r)), ("wq_b", (L, r, H * D)),
                ("wk_a", (L, E, r)), ("wk_b", (L, r, KV * D)),
                ("wv_a", (L, E, r)), ("wv_b", (L, r, KV * D)),
                ("wo_a", (L, H * D, r)), ("wo_b", (L, r, E))]}
    good = str(tmp_path / "good.bin")
    binfmt.write_lora(good, lora, cfg, rank=r, alpha=8)
    bad = str(tmp_path / "bad.bin")
    open(bad, "wb").write(open(good, "rb").read()[:300])  # truncated

    from nano_tpu import cpp_engine
    with cpp_engine.CppEngine(path, max_seq_len=64, temperature=0.0,
                              repetition_penalty=1.0) as eng:
        ids = eng.encode("abcd")
        eng.attach_lora(good)
        with_lora = eng.generate(ids, 8)
        try:
            eng.attach_lora(bad)
        except Exception:
            pass
        # the good adapter still drives generation, bit-for-bit
        assert eng.generate(ids, 8) == with_lora


@pytest.mark.skipif(not cpp_ok, reason="C++ engine not built")
def test_cpp_rejects_malformed_header_fields(tmp_path):
    """Corrupt header fields must fail the load with a clean error —
    not overflow take_f32's pointer math, SIGFPE on group_size=0, or
    drive new_runtime into absurd allocations (header layout: Config
    int32s at byte 24, quant at 60, group_size at 64)."""
    import struct

    _, _, _, good = make_tiny(tmp_path, "q80")
    blob = bytearray(open(good, "rb").read())

    def corrupted(offset, value):
        b = bytearray(blob)
        b[offset:offset + 4] = struct.pack("<i", value)
        p = tmp_path / f"bad_{offset}_{value & 0xffffffff:x}.bin"
        p.write_bytes(bytes(b))
        return str(p)

    cases = [
        (32, 0x40000000),    # n_layer huge
        (32, -1),            # n_layer negative
        (36, -32),           # n_embd negative
        (44, 3),             # n_kv_head not dividing n_head (4)
        (60, 0x77),          # unknown quant tag
        (64, 0),             # group_size zero (SIGFPE pre-fix)
        (16, 9),             # unknown arch
    ]
    for off, val in cases:
        with pytest.raises(RuntimeError):
            cpp_engine.CppEngine(corrupted(off, val))

    # the untouched blob still loads fine after all that
    eng = cpp_engine.CppEngine(good)
    eng.close()


# ------------------------------------------------------------------
# WASM bridge (cpp/main_wasm.cpp) — driven natively via
# build/nano_wasm_host, which stands in for the JS host so the export
# surface build_wasm.sh ships is execution-tested without a wasm
# toolchain (reference counterpart: infer/main_wasm.c)
# ------------------------------------------------------------------

WASM_HOST = os.path.join(REPO_ROOT, "build", "nano_wasm_host")


def _build_wasm_host():
    r = subprocess.run(["make", "-C", os.path.join(REPO_ROOT, "cpp"),
                        "wasm_host"], capture_output=True)
    return r.returncode == 0 and os.path.exists(WASM_HOST)


wasm_host_ok = _build_wasm_host()


def run_wasm_host(model, max_new, prompt, lora=None):
    cmd = [WASM_HOST, model, str(max_new)]
    if lora:
        cmd.append(lora)
    cmd += ["--", prompt]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    enc, gen, text = r.stdout.split("\n")[:3]
    return ([int(t) for t in enc.split()],
            [int(t) for t in gen.split()], text)


@pytest.mark.skipif(not (cpp_ok and wasm_host_ok),
                    reason="C++ engine or wasm host not built")
@pytest.mark.parametrize("quant", ["f32", "q80", "q4k"])
def test_wasm_bridge_greedy_matches_ctypes(tmp_path, quant):
    cfg, params, tok, path = make_tiny(tmp_path, quant)
    prompt_ids = tok.encode("abcdefgh")
    enc, gen, text = run_wasm_host(path, 16, "abcdefgh")
    assert enc == prompt_ids

    with cpp_engine.CppEngine(path, max_seq_len=64, temperature=0.0,
                              repetition_penalty=1.0) as eng:
        cpp_out = eng.generate(prompt_ids, 16)
        want_text = eng.decode([t for t in gen if t not in (0, 3)])
    strip = lambda ids: [t for t in ids if t not in (0, 3)]
    assert strip(gen) == strip(cpp_out), f"wasm={gen} ctypes={cpp_out}"
    assert text == want_text


@pytest.mark.skipif(not (cpp_ok and wasm_host_ok),
                    reason="C++ engine or wasm host not built")
def test_wasm_bridge_lora_from_buffer_matches_ctypes(tmp_path):
    cfg, params, tok, path = make_tiny(tmp_path, "f32")
    rng = np.random.RandomState(0)
    L, E, H, KV, D = (cfg.n_layer, cfg.n_embd, cfg.n_head, cfg.n_kv_head,
                      cfg.head_dim)
    r = 4
    lora = {
        "wq_a": rng.randn(L, E, r).astype(np.float32) * 0.2,
        "wq_b": rng.randn(L, r, H * D).astype(np.float32) * 0.2,
        "wk_a": rng.randn(L, E, r).astype(np.float32) * 0.2,
        "wk_b": rng.randn(L, r, KV * D).astype(np.float32) * 0.2,
        "wv_a": rng.randn(L, E, r).astype(np.float32) * 0.2,
        "wv_b": rng.randn(L, r, KV * D).astype(np.float32) * 0.2,
        "wo_a": rng.randn(L, H * D, r).astype(np.float32) * 0.2,
        "wo_b": rng.randn(L, r, E).astype(np.float32) * 0.2,
    }
    lora_path = str(tmp_path / "l.bin")
    binfmt.write_lora(lora_path, lora, cfg, rank=r, alpha=8)
    ids = tok.encode("abcdef")

    _, base, _ = run_wasm_host(path, 10, "abcdef")
    _, with_lora, _ = run_wasm_host(path, 10, "abcdef", lora=lora_path)
    assert base != with_lora   # the buffer-loaded adapter took effect

    with cpp_engine.CppEngine(path, max_seq_len=64, temperature=0.0,
                              repetition_penalty=1.0) as eng:
        eng.attach_lora(lora_path)
        cpp_lora = eng.generate(ids, 10)
    strip = lambda ids: [t for t in ids if t not in (0, 3)]
    assert strip(with_lora) == strip(cpp_lora)
