"""Q4K quantization: bit-exactness vs the reference C implementation,
round-trip error bounds, fused-matmul correctness, .bin round-trip."""

import os
import subprocess

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nano_tpu.ops import q4k
from nano_tpu.io import binfmt
from .conftest import REFERENCE_DIR, reference_available, REPO_ROOT

ORACLE = os.path.join(REPO_ROOT, "build", "q4k_oracle")


def build_oracle():
    if os.path.exists(ORACLE):
        return True
    os.makedirs(os.path.dirname(ORACLE), exist_ok=True)
    src = os.path.join(REPO_ROOT, "tools", "q4k_oracle.c")
    ref = os.path.join(REFERENCE_DIR, "infer")
    cmd = ["gcc", "-O2", f"-I{ref}", src,
           os.path.join(ref, "tensor.c"),
           os.path.join(ref, "platform_linux.c"),
           os.path.join(ref, "utils.c"),
           "-o", ORACLE, "-lm", "-fopenmp", "-pthread"]
    return subprocess.run(cmd, capture_output=True).returncode == 0


oracle_ok = reference_available() and build_oracle()


def rnd(shape, seed=0, scale=1.0):
    r = np.random.RandomState(seed)
    return (r.randn(*shape) * scale).astype(np.float32)


# ---------------------------------------------------------------------
# bit-exact pack vs C
# ---------------------------------------------------------------------

@pytest.mark.skipif(not oracle_ok, reason="q4k oracle unavailable")
@pytest.mark.parametrize("rows,n", [(1, 256), (4, 256), (3, 512),
                                    (2, 768), (1, 64), (5, 32)])
def test_pack_bitexact_vs_c(tmp_path, rows, n):
    t = rnd((rows, n), seed=rows * 100 + n)
    raw = tmp_path / "t.f32"
    raw.write_bytes(t.tobytes())
    ref = subprocess.run([ORACLE, "quantize", str(raw), str(rows), str(n)],
                         capture_output=True, timeout=60)
    assert ref.returncode == 0, ref.stderr.decode()
    ours = q4k.pack_tensor_frame(t if rows > 1 else t.reshape(n))
    assert ours == ref.stdout


@pytest.mark.skipif(not oracle_ok, reason="q4k oracle unavailable")
def test_pack_bitexact_extreme_values(tmp_path):
    """All-negative groups, all-zero groups, constant groups — the edge
    paths (FLT_TRUE_MIN max-init, zero scales)."""
    t = np.zeros((4, 256), np.float32)
    t[0] = -np.abs(rnd((256,), 1))          # all negative
    t[1] = 0.0                              # all zero
    t[2] = 3.25                             # constant positive
    t[3, :32] = rnd((32,), 2)               # one live group, rest zero
    raw = tmp_path / "e.f32"
    raw.write_bytes(t.tobytes())
    ref = subprocess.run([ORACLE, "quantize", str(raw), "4", "256"],
                         capture_output=True, timeout=60)
    assert ref.returncode == 0
    assert q4k.pack_tensor_frame(t) == ref.stdout


# ---------------------------------------------------------------------
# matmul vs C (same quantization, f32 accumulation tolerance)
# ---------------------------------------------------------------------

@pytest.mark.skipif(not oracle_ok, reason="q4k oracle unavailable")
@pytest.mark.parametrize("d,n", [(64, 256), (128, 768), (32, 64)])
def test_matmul_matches_c(tmp_path, d, n):
    w = rnd((d, n), seed=7, scale=0.05)
    x = rnd((n,), seed=8)
    (tmp_path / "w.f32").write_bytes(w.tobytes())
    (tmp_path / "x.f32").write_bytes(x.tobytes())
    ref = subprocess.run(
        [ORACLE, "matmul", str(tmp_path / "w.f32"), str(d), str(n),
         str(tmp_path / "x.f32")], capture_output=True, timeout=60)
    assert ref.returncode == 0, ref.stderr.decode()
    expect = np.frombuffer(ref.stdout, np.float32)

    blocks = q4k.quantize_lines_np(w)
    wt = q4k.Q4KTensor.from_blocks(blocks, d, n)
    from nano_tpu.ops import qmatmul as qm
    # parity mode (f32-HIGHEST dot): value-for-value with the C engine
    old = qm._IMPL
    try:
        qm._IMPL = "xla"
        ours = np.asarray(q4k.q4k_matmul(jnp.asarray(x), wt, jnp.float32))
        np.testing.assert_allclose(ours, expect, rtol=2e-5, atol=2e-5)
    finally:
        qm._IMPL = old
    # fast mode (bf16 fused-dequant dot, the default): same math at bf16
    # precision — identical quantization decisions, looser float bound
    fast = np.asarray(q4k.q4k_matmul(jnp.asarray(x), wt, jnp.float32))
    np.testing.assert_allclose(fast, expect, rtol=3e-2,
                               atol=0.03 * np.abs(expect).max())


# ---------------------------------------------------------------------
# internal consistency
# ---------------------------------------------------------------------

def test_roundtrip_error_bound():
    t = rnd((8, 512), seed=3, scale=0.1)
    blocks = q4k.quantize_lines_np(t)
    deq = q4k.dequantize_lines_np(blocks, 8, 512)
    # 4-bit affine per 32-group: error < group range / 15 (plus 6-bit
    # scale quantization slack)
    rng = t.max(axis=1) - t.min(axis=1)
    assert np.max(np.abs(deq - t)) < np.max(rng) / 15.0


def test_device_tensor_matches_host_dequant():
    t = rnd((16, 768), seed=4)
    blocks = q4k.quantize_lines_np(t)
    wt = q4k.Q4KTensor.from_blocks(blocks, 16, 768)
    host = q4k.dequantize_lines_np(blocks, 16, 768)
    np.testing.assert_array_equal(np.asarray(wt.dequantize()), host)


def test_fake_quant_act_matches_host_quantizer():
    """fake_quant_act (jnp) must equal quantize->dequantize (numpy)."""
    for n in (256, 768, 64, 96):
        x = rnd((3, n), seed=n)
        blocks = q4k.quantize_lines_np(x)
        host = q4k.dequantize_lines_np(blocks, 3, n)
        dev = np.asarray(q4k.fake_quant_act(jnp.asarray(x)))
        np.testing.assert_array_equal(dev, host)


def test_act_quant_fq_modes_bit_identical(monkeypatch):
    """NANO_TPU_Q4K_FQ=tree and =max are the same values, different
    lowering (max/min are associative; the knob only affects speed)."""
    x = rnd((4, 512), seed=77)
    outs = {}
    for mode in ("max", "tree"):
        monkeypatch.setenv("NANO_TPU_Q4K_FQ", mode)
        outs[mode] = [np.asarray(a) for a in q4k.act_quant_q4k(jnp.asarray(x))]
    for a, b in zip(outs["max"], outs["tree"]):
        np.testing.assert_array_equal(a, b)


def test_fake_quant_lean_matches_int_path(monkeypatch):
    """The all-float lean fake-quant (default for aligned dims) must be
    BIT-identical to the integer-form path on random and edge inputs
    (zeros, all-negative, tiny denormal-adjacent values)."""
    cases = [rnd((4, 512), seed=5),
             np.zeros((2, 256), np.float32),
             -np.abs(rnd((2, 256), seed=6)),
             rnd((2, 256), seed=7) * 1e-40,
             np.where(rnd((3, 512), seed=8) > 0, 0.0,
                      rnd((3, 512), seed=9)).astype(np.float32)]
    for i, x in enumerate(cases):
        monkeypatch.setenv("NANO_TPU_Q4K_FQ", "lean")
        lean = np.asarray(q4k.fake_quant_act(jnp.asarray(x)))
        monkeypatch.setenv("NANO_TPU_Q4K_FQ", "int")
        ints = np.asarray(q4k.fake_quant_act(jnp.asarray(x)))
        np.testing.assert_array_equal(lean, ints, err_msg=f"case {i}")
        if i == 3:
            # denormal inputs: XLA flushes subnormals (both device paths
            # agree above; the -Ofast-built C engine flushes too), numpy
            # does not — skip the host comparison for this edge case
            continue
        # and both equal the host (C-parity) quantizer round-trip
        host = q4k.dequantize_lines_np(q4k.quantize_lines_np(x),
                                       x.shape[0], x.shape[1])
        np.testing.assert_array_equal(lean, host, err_msg=f"case {i} host")


def test_matmul_ref_equals_kernel_fallback():
    """q4k_matmul == explicit fake-quant dot (f32-exact in parity mode,
    bf16-bounded in the fast default)."""
    d, n = 128, 512
    w = rnd((d, n), seed=11, scale=0.05)
    x = rnd((2, n), seed=12)
    wt = q4k.Q4KTensor.from_blocks(q4k.quantize_lines_np(w), d, n)
    xq = np.asarray(q4k.fake_quant_act(jnp.asarray(x)))
    wdq = np.asarray(wt.dequantize())
    expect = xq @ wdq.T
    from nano_tpu.ops import qmatmul as qm
    old = qm._IMPL
    try:
        qm._IMPL = "xla"
        y = np.asarray(q4k.q4k_matmul(jnp.asarray(x), wt, jnp.float32))
        np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-5)
    finally:
        qm._IMPL = old
    y = np.asarray(q4k.q4k_matmul(jnp.asarray(x), wt, jnp.float32))
    np.testing.assert_allclose(y, expect, rtol=3e-2,
                               atol=0.03 * np.abs(expect).max())


def test_matmul_grouped_int8_matches_ref():
    """q4k_matmul on a grouped-layout weight (int8-MXU expansion) equals
    the f32 parity path's values: identical integer decisions, the four
    affine terms recombined — only f32 multiply/sum order differs, so a
    tight tolerance (not bit-equality) is the contract."""
    d, n = 128, 512
    w = rnd((d, n), seed=31, scale=0.05)
    x = rnd((2, n), seed=32)
    wt = q4k.Q4KTensor.from_blocks(q4k.quantize_lines_np(w), d, n)
    xq = np.asarray(q4k.fake_quant_act(jnp.asarray(x)))
    expect = xq @ np.asarray(wt.dequantize()).T
    y = np.asarray(q4k.q4k_matmul(jnp.asarray(x), wt.to_grouped(),
                                  jnp.float32))
    np.testing.assert_allclose(y, expect, rtol=2e-4,
                               atol=2e-4 * np.abs(expect).max())


@pytest.mark.soak   # long e2e; fast tier covers the feature (pytest.ini)
def test_grouped_layout_partial_in_dim_stays_packed_in_loader(monkeypatch):
    """NANO_TPU_Q4K_LAYOUT=grouped through the loader: block weights a
    multiple of 32 convert; the model still decodes to the same greedy
    tokens as the packed default (end-to-end value check)."""
    import tempfile
    from nano_tpu.config import ModelConfig
    from nano_tpu.models import gpt as gptmod
    from nano_tpu.tokenizer.trie import TrieTokenizer
    from nano_tpu.io import binfmt
    from nano_tpu.infer import engine
    from nano_tpu.ops import sampling
    import jax

    cfg = ModelConfig(block_size=64, vocab_size=96, n_layer=2, n_embd=64,
                      n_head=4, n_kv_head=2, n_hidden=128)
    params = jax.tree.map(np.asarray,
                          gptmod.init_params(jax.random.PRNGKey(5), cfg))
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(26)] + [" "])
    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/m.bin"
        binfmt.write_model(path, params, cfg, tok.config, quant="q4k")

        def decode(layout):
            if layout:
                monkeypatch.setenv("NANO_TPU_Q4K_LAYOUT", layout)
            else:
                monkeypatch.delenv("NANO_TPU_Q4K_LAYOUT", raising=False)
            ctx = engine.LLMContext.from_bin(
                path, max_seq_len=64,
                sampler=sampling.SamplerConfig(temperature=0.0,
                                               repetition_penalty=1.0))
            out = []
            engine.generate_sync(
                ctx, "abc", max_new_tokens=8,
                on_decoding=lambda s, t, txt: out.append(t))
            return out

        base = decode(None)
        grouped = decode("grouped")
    assert len(base) == 8
    assert base == grouped, (base, grouped)


def test_pallas_kernel_interpret():
    """The Pallas kernel itself, in interpreter mode on CPU."""
    d, n = 256, 512
    w = rnd((d, n), seed=21, scale=0.05)
    x = rnd((8, n), seed=22)
    wt = q4k.Q4KTensor.from_blocks(q4k.quantize_lines_np(w), d, n)
    xq = q4k.fake_quant_act(jnp.asarray(x))
    xp = q4k._permute_act(xq, wt.n_pad)
    y = np.asarray(q4k._q4k_matmul_2d(xp, wt.packed, wt.scales, wt.biases,
                                      interpret=True))
    expect = np.asarray(xq) @ np.asarray(wt.dequantize()).T
    np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------
# .bin round-trip
# ---------------------------------------------------------------------

def test_binfmt_q4k_roundtrip(tmp_path):
    from nano_tpu.config import ModelConfig
    from nano_tpu.models import gpt
    from nano_tpu.tokenizer.trie import TrieTokenizer

    cfg = ModelConfig(block_size=32, vocab_size=64, n_layer=2, n_embd=64,
                      n_head=4, n_kv_head=2, n_hidden=128)
    params = jax.tree.map(np.asarray,
                          gpt.init_params(jax.random.PRNGKey(5), cfg))
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(26)])
    path = str(tmp_path / "m.bin")
    binfmt.write_model(path, params, cfg, tok.config, quant="q4k")

    bm = binfmt.read_model(path)
    assert bm.header.quant_type == binfmt.QUANT_Q4K
    # dequantized weights within 4-bit error of originals
    w0 = params["blocks"]["w1"][0]
    r0 = bm.params["blocks"]["w1"][0]
    assert np.max(np.abs(w0 - r0)) < 0.02  # init std 0.02, 4-bit quant

    dev = binfmt.quantized_device_params(bm)
    assert isinstance(dev["tok_embeddings"], q4k.Q4KTensor)
    assert dev["blocks"]["wqkv"].packed.shape[0] == cfg.n_layer

    # forward runs end to end with quantized params
    from nano_tpu.models.gpt import forward
    logits = forward(dev, jnp.zeros((1, 4), jnp.int32), cfg,
                     dtype=jnp.float32)
    assert logits.shape == (1, 4, 64)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_unpacked_layout_bit_exact():
    Q4KTensor = q4k.Q4KTensor
    """NANO_TPU_Q4K_LAYOUT=unpacked trades 2x weight HBM for zero
    per-step nibble ops — the values must be bit-identical in every
    consumer (dequantize f32/bf16, the fused-dequant matmul, stacking)."""
    from nano_tpu.ops.q4k import q4k_matmul
    rng = np.random.RandomState(0)
    for out, inn in [(48, 256), (64, 512), (32, 320)]:  # incl. partial
        t = Q4KTensor.quantize(rng.randn(out, inn).astype(np.float32))
        u = t.to_unpacked()
        assert u.layout == "unpacked" and u.n_pad == t.n_pad
        for dt in (jnp.float32, jnp.bfloat16):
            a, b = t.dequantize(dt), u.dequantize(dt)
            assert a.dtype == b.dtype and bool(jnp.all(a == b))
        x = jnp.asarray(rng.randn(2, inn).astype(np.float32))
        assert bool(jnp.all(q4k_matmul(x, t) == q4k_matmul(x, u)))
    ts = Q4KTensor.stack([Q4KTensor.quantize(
        rng.randn(16, 256).astype(np.float32)) for _ in range(3)])
    us = ts.to_unpacked()
    assert bool(jnp.all(ts.dequantize(jnp.float32)
                        == us.dequantize(jnp.float32)))


def test_unpacked_layout_greedy_parity(tmp_path, monkeypatch):
    Q4KTensor = q4k.Q4KTensor  # noqa: F841
    """Loading a Q4K .bin with the unpacked layout knob produces the
    exact same greedy tokens as the default packed layout."""
    from nano_tpu.config import ModelConfig
    from nano_tpu.models import gpt
    from nano_tpu.tokenizer.trie import TrieTokenizer
    from nano_tpu.infer import engine
    from nano_tpu.ops import sampling

    cfg = ModelConfig(block_size=64, vocab_size=64, n_layer=2, n_embd=32,
                      n_head=4, n_kv_head=2, n_hidden=64)
    params = jax.tree.map(np.asarray,
                          gpt.init_params(jax.random.PRNGKey(7), cfg))
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(26)])
    path = str(tmp_path / "m.bin")
    binfmt.write_model(path, params, cfg, tok.config, quant="q4k")
    samp = sampling.SamplerConfig(temperature=0.0, repetition_penalty=1.0)

    def greedy():
        ctx = engine.LLMContext.from_bin(path, max_seq_len=64, sampler=samp)
        q4 = ctx.params["blocks"]["wqkv"]
        return list(np.asarray(
            engine.generate_on_device(ctx, tok.encode("abcabc"), 12))), q4

    base, t_packed = greedy()
    assert t_packed.layout == "packed"
    monkeypatch.setenv("NANO_TPU_Q4K_LAYOUT", "unpacked")
    unp, t_unpacked = greedy()
    assert t_unpacked.layout == "unpacked"
    assert base == unp
