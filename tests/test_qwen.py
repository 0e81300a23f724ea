"""Qwen family tests: BPE tokenizer semantics, chat template ids, HF
converter round-trip with logits parity against transformers (torch CPU
as oracle)."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nano_tpu.tokenizer import bpe
from nano_tpu.io import binfmt


def make_toy_bpe():
    """Tiny byte-level vocab: single bytes for a-z/space + merges."""
    vocab = [b"<pad>", b"<unk>", b"<s>"]
    vocab += [bytes([i]) for i in range(256)]
    # merge-closed chains: every multi-byte token is buildable from pairs
    merges = [b"he", b"hel", b"hell", b"hello",
              b" w", b" wo", b" wor", b" worl", b" world"]
    scores = [0.0] * len(vocab) + [-(i + 1) for i in range(len(merges))]
    vocab = vocab + merges
    return bpe.BpeTokenizer(vocab, scores)


def test_bpe_encode_greedy_merge():
    tok = make_toy_bpe()
    ids = tok.encode("hello world")
    # "he"(-1) merges first, then "ll"(-2)... final pieces: hello, " world"
    pieces = [tok.vocab[i] for i in ids]
    assert b"hello" in pieces and b" world" in pieces
    assert tok.decode(ids) == "hello world"


def test_bpe_byte_fallback_roundtrip():
    tok = make_toy_bpe()
    ids = tok.encode("héllo✓")
    assert tok.decode(ids) == "héllo✓"


def test_bpe_field_roundtrip():
    tok = make_toy_bpe()
    blob = tok.serialize_field()
    tok2, nxt = bpe.BpeTokenizer.parse_field(blob, 0, tok.vocab_size)
    assert nxt == len(blob)
    assert tok2.vocab == tok.vocab
    assert tok2.encode("hello world") == tok.encode("hello world")


def test_chat_template_ids():
    # full-size vocab: template ids emitted verbatim
    small = make_toy_bpe()
    pad = [b"<x%d>" % i for i in range(bpe.QWEN_THINK_CLOSE + 1
                                       - len(small.vocab))]
    tok = bpe.BpeTokenizer(small.vocab + pad,
                           small.scores + [0.0] * len(pad))
    ids = tok.apply_chat_template("hi", enable_thinking=True)
    assert ids[0] == bpe.QWEN_IM_START
    assert ids[1] == bpe.QWEN_USER
    assert ids[-1] == bpe.QWEN_NEWLINE
    ids2 = tok.apply_chat_template("hi", enable_thinking=False)
    # empty think block appended (reference: infer/tokenizer.c:243-253)
    assert bpe.QWEN_THINK_OPEN in ids2 and bpe.QWEN_THINK_CLOSE in ids2
    assert len(ids2) == len(ids) + 6


def test_chat_template_small_vocab_falls_back():
    """Toy/test vocabs cannot contain the canonical control ids — the
    template falls back to raw encode instead of emitting out-of-range
    ids (mirrors cpp/nano.cpp; the reference engine reads OOB here)."""
    tok = make_toy_bpe()
    ids = tok.apply_chat_template("hello", enable_thinking=False)
    assert ids == tok.encode("hello")
    assert all(0 <= i < tok.vocab_size for i in ids)


def _write_toy_hf_tokenizer_json(path, vocab_size):
    """Synthetic HF tokenizer.json exercising the GPT-2 byte-unicode path."""
    b2u = bpe.gpt2_bytes_to_unicode()
    vocab = {}
    for i in range(256):
        vocab[b2u[i]] = i
    he = b2u[ord("h")] + b2u[ord("e")]
    vocab[he] = 256
    merges = [[b2u[ord("h")], b2u[ord("e")]]]
    for i in range(257, vocab_size):
        vocab[f"<extra_{i}>"] = i
    with open(path, "w") as f:
        json.dump({"model": {"vocab": vocab, "merges": merges},
                   "added_tokens": []}, f)


@pytest.fixture(scope="module")
def tiny_qwen3_dir(tmp_path_factory):
    """Random tiny Qwen3 checkpoint in HF format, saved with safetensors."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM
    d = tmp_path_factory.mktemp("qwen3")
    cfg = Qwen3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rope_theta=1e6,
        rms_norm_eps=1e-6, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(cfg)
    model.eval()
    model.save_pretrained(str(d), safe_serialization=True)
    _write_toy_hf_tokenizer_json(str(d / "tokenizer.json"), 512)
    return str(d), model


def test_hf_qwen3_convert_and_logits_parity(tiny_qwen3_dir, tmp_path):
    import torch
    from nano_tpu.io.qwen import convert_hf_qwen
    from nano_tpu.models import gpt

    hf_dir, hf_model = tiny_qwen3_dir
    out = str(tmp_path / "qwen3.bin")
    cfg = convert_hf_qwen(hf_dir, out, quant="f32")
    assert cfg.rope_style == "half"
    assert cfg.use_qk_norm
    assert cfg.head_dim == 32

    bm = binfmt.read_model(out)
    assert bm.header.model_type == binfmt.MODEL_TYPE_QWEN3
    assert "q_norm" in bm.params["blocks"]

    idx = np.random.RandomState(0).randint(0, 512, size=(1, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(idx)).logits.numpy()
    ours = gpt.forward(jax.tree.map(jnp.asarray, bm.params),
                       jnp.asarray(idx, jnp.int32), bm.config,
                       dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_hf_qwen3_engine_generation(tiny_qwen3_dir, tmp_path):
    import torch
    from nano_tpu.io.qwen import convert_hf_qwen
    from nano_tpu.infer import engine
    from nano_tpu.ops import sampling

    hf_dir, hf_model = tiny_qwen3_dir
    out = str(tmp_path / "qwen3.bin")
    convert_hf_qwen(hf_dir, out, quant="f32")

    ctx = engine.LLMContext.from_bin(
        out, max_seq_len=64, dtype=jnp.float32,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0))
    assert ctx.arch == "qwen3"
    assert ctx.stop_tokens == bpe.QWEN_STOP_TOKENS

    prompt_ids = [7, 8, 9, 10]
    ours = engine.generate_on_device(ctx, prompt_ids, 8).tolist()
    with torch.no_grad():
        x = torch.tensor([prompt_ids])
        want = []
        for _ in range(8):
            logits = hf_model(x).logits
            nxt = int(logits[0, -1].argmax())
            want.append(nxt)
            x = torch.cat([x, torch.tensor([[nxt]])], dim=1)
    assert ours == want


def test_hf_qwen3_q80_convert(tiny_qwen3_dir, tmp_path):
    from nano_tpu.io.qwen import convert_hf_qwen
    hf_dir, _ = tiny_qwen3_dir
    out = str(tmp_path / "qwen3_q80.bin")
    convert_hf_qwen(hf_dir, out, quant="q80", group_size=64)
    bm = binfmt.read_model(out)
    assert bm.header.quant_type == binfmt.QUANT_Q80
    assert bm.qparams is not None
    qp = binfmt.quantized_device_params(bm)
    assert "q_norm" in qp["blocks"]
    assert "output" in qp


def test_hf_qwen2_convert_logits_and_engines(tmp_path):
    """Qwen2 arch: qkv biases + permute-reverse to the interleaved RoPE
    layout (reference: export_qwen.py permute_reverse) — HF logits parity
    plus C++ engine greedy agreement (exercising its bias branch)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from nano_tpu.io.qwen import convert_hf_qwen
    from nano_tpu.models import gpt
    from nano_tpu.infer import engine
    from nano_tpu.ops import sampling
    from nano_tpu import cpp_engine

    d = tmp_path / "hf2"
    d.mkdir()
    qcfg = Qwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=1e6, rms_norm_eps=1e-6,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    hf_model = Qwen2ForCausalLM(qcfg)
    hf_model.eval()
    hf_model.save_pretrained(str(d), safe_serialization=True)
    _write_toy_hf_tokenizer_json(str(d / "tokenizer.json"), 512)

    out = str(tmp_path / "qwen2.bin")
    cfg = convert_hf_qwen(str(d), out, quant="f32")
    assert cfg.qkv_bias and cfg.rope_style == "interleaved"

    bm = binfmt.read_model(out)
    assert bm.header.model_type == binfmt.MODEL_TYPE_QWEN2
    idx = np.random.RandomState(0).randint(0, 512, size=(1, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(idx)).logits.numpy()
    ours = gpt.forward(jax.tree.map(jnp.asarray, bm.params),
                       jnp.asarray(idx, jnp.int32), bm.config,
                       dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)

    samp = sampling.SamplerConfig(temperature=0.0, repetition_penalty=1.0)
    ctx = engine.LLMContext.from_bin(out, max_seq_len=64,
                                     dtype=jnp.float32, sampler=samp)
    ids = ctx.encode("hehe")
    jax_out = [t for t in engine.generate_on_device(ctx, ids, 8).tolist()
               if t not in ctx.stop_tokens]
    if cpp_engine.build():
        with cpp_engine.CppEngine(out, max_seq_len=64, temperature=0.0,
                                  repetition_penalty=1.0) as eng:
            cpp_out = eng.generate(ids, 8)
        assert cpp_out == jax_out[:len(cpp_out)] and len(cpp_out) >= 4
