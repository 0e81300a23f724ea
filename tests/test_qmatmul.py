"""Quantized matmul tests: Q80Tensor round-trip, Pallas kernel (interpret
mode) vs reference path, and the quantized engine end-to-end."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.io import binfmt
from nano_tpu.ops import qmatmul
from nano_tpu.infer import engine
from nano_tpu.ops import sampling
from nano_tpu.tokenizer.trie import TrieTokenizer


def make_q80(rng, out, inn, gs):
    w = rng.randn(out, inn).astype(np.float32) * 0.1
    q, s, _ = binfmt.quantize_q80(w, gs)
    return w, qmatmul.Q80Tensor.from_numpy(q.reshape(out, inn), s, gs)


def test_q80tensor_dequant_matches_numpy():
    rng = np.random.RandomState(0)
    w, qt = make_q80(rng, 64, 128, 32)
    deq = np.asarray(qt.dequantize())
    ref = binfmt.dequantize_q80(np.asarray(qt.q).reshape(-1),
                                np.asarray(qt.scales).reshape(-1),
                                32).reshape(64, 128)
    np.testing.assert_allclose(deq, ref, atol=1e-7)
    # rounding error bounded by half the largest group scale
    assert np.abs(deq - w).max() <= np.abs(w).max() / 254 + 1e-6


def test_q80_matmul_ref_matches_dense():
    rng = np.random.RandomState(1)
    w, qt = make_q80(rng, 256, 128, 64)
    x = jnp.asarray(rng.randn(4, 128).astype(np.float32))
    y_q = qmatmul.q80_matmul_ref(x, qt, jnp.float32)
    y_d = x @ qt.dequantize(jnp.float32).T
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_d),
                               rtol=1e-5, atol=1e-5)


def test_pallas_kernel_interpret_matches_ref():
    """Run the actual Pallas kernel in interpreter mode on CPU."""
    rng = np.random.RandomState(2)
    w, qt = make_q80(rng, 256, 128, 32)
    x = jnp.asarray(rng.randn(16, 128).astype(np.float32))
    y_k = qmatmul._q80_matmul_2d(x.astype(jnp.bfloat16), qt.q, qt.scales,
                                 32, interpret=True)
    y_r = qmatmul.q80_matmul_ref(x.astype(jnp.bfloat16), qt, jnp.float32)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               rtol=2e-2, atol=2e-2)


def test_q80_tensor_scans_over_layers():
    """Q80Tensor leaves slice correctly through lax.scan."""
    rng = np.random.RandomState(3)
    L, out, inn, gs = 3, 64, 32, 16
    q = rng.randint(-127, 128, size=(L, out, inn)).astype(np.int8)
    s = rng.rand(L, out, inn // gs).astype(np.float32)
    qt = qmatmul.Q80Tensor(q=jnp.asarray(q), scales=jnp.asarray(s),
                           group_size=gs)
    x0 = jnp.ones((1, inn), jnp.float32)

    def body(x, layer_qt):
        y = qmatmul.q80_matmul_ref(x[:, :inn], layer_qt, jnp.float32)
        return y[:, :inn], None

    out_scan, _ = jax.lax.scan(body, x0, qt)
    ref = x0
    for l in range(L):
        layer = qmatmul.Q80Tensor(q=qt.q[l], scales=qt.scales[l], group_size=gs)
        ref = qmatmul.q80_matmul_ref(ref[:, :inn], layer, jnp.float32)[:, :inn]
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_quantized_engine_matches_dequantized(tmp_path):
    """LLMContext(quantized=True) greedy == dequantize-at-load greedy."""
    cfg = ModelConfig(block_size=64, vocab_size=64, n_layer=2, n_embd=32,
                      n_head=4, n_kv_head=2, n_hidden=64)
    params = gpt.init_params(jax.random.PRNGKey(7), cfg)
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(52)])
    path = str(tmp_path / "m.bin")
    binfmt.write_model(path, jax.tree.map(np.asarray, params), cfg,
                       tok.config, quant="q80")

    samp = sampling.SamplerConfig(temperature=0.0, repetition_penalty=1.0)
    ctx_q = engine.LLMContext.from_bin(path, max_seq_len=64,
                                       dtype=jnp.float32, quantized=True,
                                       sampler=samp)
    ctx_f = engine.LLMContext.from_bin(path, max_seq_len=64,
                                       dtype=jnp.float32, quantized=False,
                                       sampler=samp)
    ids = ctx_q.encode("abcdef")
    out_q = engine.generate_on_device(ctx_q, ids, 10).tolist()
    out_f = engine.generate_on_device(ctx_f, ids, 10).tolist()
    assert out_q == out_f
