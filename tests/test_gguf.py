"""GGUF bridge (nano_tpu/io/gguf.py): reader, dequantizers, writer.

The ggml block dequantizers are dual-implemented — the scalar reference
versions here follow ggml-common.h / dequantize_row_* literally, the
module's are vectorized — and the container round-trips through our own
writer (write_gguf -> GGUFFile -> load_gguf_qwen) down to a .bin that
generates the same greedy stream as a .bin exported directly.
"""

import numpy as np
import pytest

from nano_tpu.config import ModelConfig
from nano_tpu.io import gguf, binfmt
from nano_tpu.tokenizer.bpe import BpeTokenizer


# ---------------------------------------------------------------------
# scalar reference dequantizers (per the public ggml spec)
# ---------------------------------------------------------------------

def ref_q8_0(raw, n):
    out = np.zeros(n, np.float32)
    for b in range(n // 32):
        blk = raw[b * 34:(b + 1) * 34]
        d = float(np.frombuffer(blk[:2], "<f2")[0])
        qs = np.frombuffer(blk[2:], "i1")
        for j in range(32):
            out[b * 32 + j] = d * qs[j]
    return out


def ref_q4_0(raw, n):
    out = np.zeros(n, np.float32)
    for b in range(n // 32):
        blk = raw[b * 18:(b + 1) * 18]
        d = float(np.frombuffer(blk[:2], "<f2")[0])
        qs = blk[2:]
        for j in range(16):
            out[b * 32 + j] = d * ((qs[j] & 0x0F) - 8)
            out[b * 32 + 16 + j] = d * ((qs[j] >> 4) - 8)
    return out


def ref_scale_min_k4(j, scales):
    if j < 4:
        return scales[j] & 63, scales[j + 4] & 63
    sc = (scales[j + 4] & 0x0F) | ((scales[j - 4] >> 6) << 4)
    mn = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
    return sc, mn


def ref_q4_k(raw, n):
    out = np.zeros(n, np.float32)
    for b in range(n // 256):
        blk = raw[b * 144:(b + 1) * 144]
        d = float(np.frombuffer(blk[0:2], "<f2")[0])
        dmin = float(np.frombuffer(blk[2:4], "<f2")[0])
        scales = blk[4:16]
        qs = blk[16:144]
        y = b * 256
        for j in range(4):
            sc1, m1 = ref_scale_min_k4(2 * j, scales)
            sc2, m2 = ref_scale_min_k4(2 * j + 1, scales)
            for l in range(32):
                q = qs[32 * j + l]
                out[y + 64 * j + l] = d * sc1 * (q & 0x0F) - dmin * m1
                out[y + 64 * j + 32 + l] = d * sc2 * (q >> 4) - dmin * m2
    return out


def ref_q6_k(raw, n):
    out = np.zeros(n, np.float32)
    for b in range(n // 256):
        blk = raw[b * 210:(b + 1) * 210]
        ql = blk[0:128]
        qh = blk[128:192]
        sc = np.frombuffer(blk[192:208], "i1")
        d = float(np.frombuffer(blk[208:210], "<f2")[0])
        y = b * 256
        for half in range(2):
            lo, ho, so = 64 * half, 32 * half, 8 * half
            for l in range(32):
                is_ = l // 16
                q1 = ((ql[lo + l] & 0xF) | (((qh[ho + l] >> 0) & 3) << 4)) - 32
                q2 = ((ql[lo + l + 32] & 0xF) | (((qh[ho + l] >> 2) & 3) << 4)) - 32
                q3 = ((ql[lo + l] >> 4) | (((qh[ho + l] >> 4) & 3) << 4)) - 32
                q4 = ((ql[lo + l + 32] >> 4) | (((qh[ho + l] >> 6) & 3) << 4)) - 32
                base = y + 128 * half
                out[base + l] = d * sc[so + is_] * q1
                out[base + l + 32] = d * sc[so + 2 + is_] * q2
                out[base + l + 64] = d * sc[so + 4 + is_] * q3
                out[base + l + 96] = d * sc[so + 6 + is_] * q4
    return out


def _random_raw(n_bytes, seed):
    rng = np.random.RandomState(seed)
    raw = rng.randint(0, 256, n_bytes).astype(np.uint8)
    return np.ascontiguousarray(raw)


def _sanitize_f16(raw, stride, offsets):
    """Replace the f16 scale fields at the given block offsets with
    small finite values (random bytes can encode inf/NaN)."""
    rng = np.random.RandomState(7)
    raw = raw.copy()
    for off in offsets:
        for b in range(len(raw) // stride):
            d = np.float16(rng.rand() * 0.1 + 1e-3)
            raw[b * stride + off:b * stride + off + 2] = \
                np.frombuffer(d.tobytes(), np.uint8)
    return raw


@pytest.mark.parametrize("gtype,stride,f16_offs,ref,n", [
    (gguf.GGML_Q8_0, 34, (0,), ref_q8_0, 32 * 5),
    (gguf.GGML_Q4_0, 18, (0,), ref_q4_0, 32 * 5),
    (gguf.GGML_Q4_K, 144, (0, 2), ref_q4_k, 256 * 3),
    (gguf.GGML_Q6_K, 210, (208,), ref_q6_k, 256 * 3),
])
def test_dequant_matches_scalar_reference(gtype, stride, f16_offs, ref, n):
    raw = _sanitize_f16(_random_raw(n // (32 if stride < 100 else 256)
                                    * stride, seed=gtype), stride, f16_offs)
    got = gguf._DEQUANT[gtype](raw, n)
    want = ref(bytes(raw), n)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_q8_0_quantize_dequant_roundtrip():
    rng = np.random.RandomState(0)
    x = (rng.randn(32 * 64) * 3).astype(np.float32)
    raw = np.frombuffer(gguf.quantize_q8_0(x), np.uint8)
    y = gguf.dequant_q8_0(raw, x.size)
    scales = np.abs(x).reshape(-1, 32).max(axis=1) / 127.0
    err = np.abs(y - x).reshape(-1, 32).max(axis=1)
    assert (err <= scales * 0.51 + 1e-7).all()


# ---------------------------------------------------------------------
# container round trip
# ---------------------------------------------------------------------

def tiny_cfg(arch="qwen3"):
    return ModelConfig(
        block_size=64, vocab_size=256, n_layer=2, n_embd=64, n_head=2,
        n_kv_head=1, n_hidden=96, head_dim=32,
        use_qk_norm=(arch == "qwen3"), qkv_bias=(arch == "qwen2"),
        rope_style="half" if arch == "qwen3" else "interleaved",
        rope_theta=1e6, norm_eps=1e-6, tie_embeddings=True)


def tiny_params(cfg, seed=0, tied=True):
    rng = np.random.RandomState(seed)
    E, F, V, L = cfg.n_embd, cfg.n_hidden, cfg.vocab_size, cfg.n_layer
    HD = cfg.n_head * cfg.head_dim
    KVD = cfg.n_kv_head * cfg.head_dim

    def w(*s):
        return (rng.randn(*s) * 0.05).astype(np.float32)

    blocks = {
        "attn_norm": w(L, E) + 1, "ffn_norm": w(L, E) + 1,
        "wq": w(L, E, HD), "wk": w(L, E, KVD), "wv": w(L, E, KVD),
        "wo": w(L, HD, E), "w1": w(L, E, F), "w2": w(L, F, E),
        "w3": w(L, E, F),
    }
    if cfg.use_qk_norm:
        blocks["q_norm"] = w(L, cfg.head_dim) + 1
        blocks["k_norm"] = w(L, cfg.head_dim) + 1
    if cfg.qkv_bias:
        blocks["bq"] = w(L, HD)
        blocks["bk"] = w(L, KVD)
        blocks["bv"] = w(L, KVD)
    p = {"tok_embeddings": w(V, E), "norm": w(E) + 1, "blocks": blocks}
    if not tied:
        p["output"] = w(E, V)
    return p


def byte_tokenizer(vocab_size=256):
    vocab = [bytes([i]) for i in range(vocab_size)]
    return BpeTokenizer(vocab, [0.0] * vocab_size)


@pytest.mark.parametrize("arch", ["qwen3", "qwen2"])
@pytest.mark.parametrize("quant", ["f32", "q8_0"])
def test_write_read_roundtrip(tmp_path, arch, quant):
    cfg = tiny_cfg(arch)
    params = tiny_params(cfg, tied=(arch == "qwen3"))
    tok = byte_tokenizer()
    path = str(tmp_path / "m.gguf")
    gguf.write_gguf(path, params, cfg, tok, arch=arch, quant=quant)

    cfg2, params2, model_type, tok2 = gguf.load_gguf_qwen(path)
    assert cfg2.n_layer == cfg.n_layer
    assert cfg2.n_embd == cfg.n_embd
    assert cfg2.n_kv_head == cfg.n_kv_head
    assert cfg2.head_dim == cfg.head_dim
    assert cfg2.rope_style == cfg.rope_style
    assert cfg2.tie_embeddings == (arch == "qwen3")
    assert (model_type == binfmt.MODEL_TYPE_QWEN3) == (arch == "qwen3")

    tol = 0 if quant == "f32" else 0.02
    for k in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
        np.testing.assert_allclose(params2["blocks"][k],
                                   params["blocks"][k], atol=tol,
                                   err_msg=k)
    np.testing.assert_allclose(params2["tok_embeddings"],
                               params["tok_embeddings"], atol=tol)
    np.testing.assert_allclose(params2["norm"], params["norm"], atol=0)
    if arch == "qwen2":
        for k in ("bq", "bk", "bv"):
            np.testing.assert_allclose(params2["blocks"][k],
                                       params["blocks"][k], atol=0,
                                       err_msg=k)
        np.testing.assert_allclose(params2["output"], params["output"],
                                   atol=tol)
    else:
        for k in ("q_norm", "k_norm"):
            np.testing.assert_allclose(params2["blocks"][k],
                                       params["blocks"][k], atol=0,
                                       err_msg=k)
    assert tok2.encode("abc") == tok.encode("abc")


def test_convert_gguf_matches_direct_bin(tmp_path):
    """GGUF -> .bin must generate the same greedy stream as a .bin
    exported directly from the same params."""
    import jax.numpy as jnp
    from nano_tpu.infer import engine

    cfg = tiny_cfg("qwen3")
    params = tiny_params(cfg)
    tok = byte_tokenizer()
    gpath = str(tmp_path / "m.gguf")
    gguf.write_gguf(gpath, params, cfg, tok, arch="qwen3", quant="f32")
    bin_via_gguf = str(tmp_path / "via_gguf.bin")
    gguf.convert_gguf(gpath, bin_via_gguf, quant="f32")
    bin_direct = str(tmp_path / "direct.bin")
    binfmt.write_model(bin_direct, params, cfg, tok, quant="f32",
                       model_type=binfmt.MODEL_TYPE_QWEN3)

    outs = []
    for p in (bin_via_gguf, bin_direct):
        ctx = engine.LLMContext.from_bin(p, dtype=jnp.float32)
        outs.append(list(engine.generate_on_device(
            ctx, ctx.encode("ab"), 12)))
    assert outs[0] == outs[1], outs


def test_unsupported_arch_errors(tmp_path):
    cfg = tiny_cfg("qwen3")
    path = str(tmp_path / "m.gguf")
    gguf.write_gguf(path, tiny_params(cfg), cfg, byte_tokenizer(),
                    arch="qwen3", quant="f32")
    # rewrite the arch metadata by crafting a minimal llama-arch file
    g = gguf.GGUFFile(path)
    assert g.meta["general.architecture"] == "qwen3"
    import struct
    raw = open(path, "rb").read()
    patched = raw.replace(
        struct.pack("<Q", 5) + b"qwen3",
        struct.pack("<Q", 5) + b"llama", 1)
    lpath = str(tmp_path / "l.gguf")
    open(lpath, "wb").write(patched)
    with pytest.raises(ValueError, match="unsupported GGUF architecture"):
        gguf.load_gguf_qwen(lpath)


def test_truncated_file_errors(tmp_path):
    cfg = tiny_cfg("qwen3")
    path = str(tmp_path / "m.gguf")
    gguf.write_gguf(path, tiny_params(cfg), cfg, byte_tokenizer(),
                    arch="qwen3", quant="f32")
    data = open(path, "rb").read()
    tpath = str(tmp_path / "t.gguf")
    open(tpath, "wb").write(data[:len(data) // 2])
    with pytest.raises(ValueError, match="exceeds file size"):
        gguf.GGUFFile(tpath)


def test_from_gguf_context_matches_bin(tmp_path):
    """LLMContext.from_gguf (direct dequantized load) must produce the
    same greedy stream as loading the equivalent .bin."""
    import jax.numpy as jnp
    from nano_tpu.infer import engine

    cfg = tiny_cfg("qwen3")
    params = tiny_params(cfg)
    tok = byte_tokenizer()
    gpath = str(tmp_path / "m.gguf")
    gguf.write_gguf(gpath, params, cfg, tok, arch="qwen3", quant="f32")
    bpath = str(tmp_path / "m.bin")
    binfmt.write_model(bpath, params, cfg, tok, quant="f32",
                       model_type=binfmt.MODEL_TYPE_QWEN3)

    ctx_g = engine.LLMContext.from_gguf(gpath, dtype=jnp.float32)
    ctx_b = engine.LLMContext.from_bin(bpath, dtype=jnp.float32)
    assert ctx_g.arch == ctx_b.arch == "qwen3"
    ids = ctx_b.encode("ab")
    got = list(engine.generate_on_device(ctx_g, ids, 12))
    want = list(engine.generate_on_device(ctx_b, ids, 12))
    assert got == want


def test_export_cli_gguf_both_directions(tmp_path, monkeypatch, capsys):
    """export.py --to-gguf / --from-gguf round trip through the CLI."""
    import sys
    import export as export_cli
    import jax.numpy as jnp
    from nano_tpu.infer import engine

    cfg = tiny_cfg("qwen3")
    params = tiny_params(cfg)
    tok = byte_tokenizer()
    bpath = str(tmp_path / "m.bin")
    binfmt.write_model(bpath, params, cfg, tok, quant="f32",
                       model_type=binfmt.MODEL_TYPE_QWEN3)
    gpath = str(tmp_path / "m.gguf")
    monkeypatch.setattr(sys, "argv",
                        ["export.py", gpath, "--to-gguf", bpath,
                         "--to", "f32"])
    export_cli.main()
    b2path = str(tmp_path / "back.bin")
    monkeypatch.setattr(sys, "argv",
                        ["export.py", b2path, "--from-gguf", gpath,
                         "--to", "f32"])
    export_cli.main()
    out = capsys.readouterr().out
    assert "exported GGUF" in out and "converted GGUF" in out

    ids = list(range(4, 10))
    ctx_a = engine.LLMContext.from_bin(bpath, dtype=jnp.float32)
    ctx_b = engine.LLMContext.from_bin(b2path, dtype=jnp.float32)
    got = list(engine.generate_on_device(ctx_b, ids, 10))
    want = list(engine.generate_on_device(ctx_a, ids, 10))
    assert got == want


# ---------------------------------------------------------------------
# quantized device load (lossless ggml -> our-layout mapping)
# ---------------------------------------------------------------------

def _tensor_from_raw(name, shape, gtype, raw):
    return gguf.GGUFTensor(name, shape, gtype, np.asarray(raw, np.uint8))


def test_q4_k_maps_losslessly_to_q4ktensor():
    n, out, inn = 256 * 2, 2, 256 * 2 // 2
    raw = _sanitize_f16(_random_raw(n // 256 * 144, seed=1), 144, (0, 2))
    t = _tensor_from_raw("w", (out, inn), gguf.GGML_Q4_K, raw)
    q4 = gguf.q4k_from_q4_k(t)
    import jax.numpy as jnp
    got = np.asarray(q4.dequantize(jnp.float32))
    want = t.to_f32()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_q8_0_maps_losslessly_to_q80tensor():
    n, out, inn = 32 * 8, 4, 64
    raw = _sanitize_f16(_random_raw(n // 32 * 34, seed=2), 34, (0,))
    t = _tensor_from_raw("w", (out, inn), gguf.GGML_Q8_0, raw)
    q8 = gguf.q80_from_q8_0(t)
    assert q8.group_size == 32
    got = (np.asarray(q8.q, np.float32).reshape(out, inn // 32, 32)
           * np.asarray(q8.scales)[:, :, None]).reshape(out, inn)
    np.testing.assert_allclose(got, t.to_f32(), rtol=0, atol=1e-6)


def test_q6_k_maps_losslessly_to_q80tensor():
    n, out, inn = 256 * 2, 2, 256
    raw = _sanitize_f16(_random_raw(n // 256 * 210, seed=3), 210, (208,))
    t = _tensor_from_raw("w", (out, inn), gguf.GGML_Q6_K, raw)
    q8 = gguf.q80_from_q6_k(t)
    assert q8.group_size == 16
    got = (np.asarray(q8.q, np.float32).reshape(out, inn // 16, 16)
           * np.asarray(q8.scales)[:, :, None]).reshape(out, inn)
    np.testing.assert_allclose(got, t.to_f32(), rtol=0, atol=1e-6)


def _logits_close(ctx_q, ctx_d, ids):
    """Prefill logits of the quantized vs dense load must agree within
    the small-group fused-dequant compute tolerance (the weight VALUES
    are mapped losslessly; only matmul numerics differ — bf16 fused
    dequant vs dense f32), and greedy must agree on the first token."""
    import jax.numpy as jnp
    from nano_tpu.infer import engine
    from nano_tpu.models import gpt

    outs = []
    for ctx in (ctx_q, ctx_d):
        cache = ctx.new_cache(1)
        arr = np.zeros((1, len(ids)), np.int32)
        arr[0] = ids
        logits, _, _ = engine._prefill(ctx.params, None, 0.0,
                                       jnp.asarray(arr), cache, ctx.cfg,
                                       ctx.dtype)
        outs.append(np.asarray(logits[0, len(ids) - 1], np.float32))
    lq, ld = outs
    scale = max(1e-3, float(np.abs(ld).max()))
    assert float(np.abs(lq - ld).max()) / scale < 0.05, \
        float(np.abs(lq - ld).max())
    assert int(lq.argmax()) == int(ld.argmax())


def test_from_gguf_quantized_load(tmp_path):
    """A Q8_0 GGUF loads with quantized leaves by default; the mapped
    weights are lossless, so prefill logits track the dense load within
    compute-path tolerance."""
    import jax.numpy as jnp
    from nano_tpu.infer import engine
    from nano_tpu.ops.qmatmul import Q80Tensor

    cfg = tiny_cfg("qwen3")
    params = tiny_params(cfg)
    tok = byte_tokenizer()
    gpath = str(tmp_path / "m.gguf")
    gguf.write_gguf(gpath, params, cfg, tok, arch="qwen3", quant="q8_0")

    ctx_q = engine.LLMContext.from_gguf(gpath, dtype=jnp.float32)
    assert isinstance(ctx_q.params["blocks"]["wq"], Q80Tensor)
    assert isinstance(ctx_q.params["tok_embeddings"], Q80Tensor)
    ctx_d = engine.LLMContext.from_gguf(gpath, dtype=jnp.float32,
                                        quantized=False)
    ids = ctx_d.encode("ab")
    _logits_close(ctx_q, ctx_d, ids)
    # the quantized context must also decode end to end
    out = list(engine.generate_on_device(ctx_q, ids, 8))
    assert len(out) == 8


def test_from_gguf_quantized_load_qwen2(tmp_path):
    """qwen2: the quantized load's row-permutation of q/k must match the
    dense load's rope_permute_reverse (logits track within tolerance)."""
    import jax.numpy as jnp
    from nano_tpu.infer import engine

    cfg = tiny_cfg("qwen2")
    params = tiny_params(cfg, tied=False)
    tok = byte_tokenizer()
    gpath = str(tmp_path / "m.gguf")
    gguf.write_gguf(gpath, params, cfg, tok, arch="qwen2", quant="q8_0")

    ctx_q = engine.LLMContext.from_gguf(gpath, dtype=jnp.float32)
    ctx_d = engine.LLMContext.from_gguf(gpath, dtype=jnp.float32,
                                        quantized=False)
    _logits_close(ctx_q, ctx_d, ctx_d.encode("ab"))


def test_server_build_ctx_accepts_gguf(tmp_path):
    """The shared serving CLI loads .gguf models (wss / openai_http)."""
    import argparse
    from nano_tpu.serve.cli import add_engine_args, build_ctx

    cfg = tiny_cfg("qwen3")
    gpath = str(tmp_path / "m.gguf")
    gguf.write_gguf(gpath, tiny_params(cfg), cfg, byte_tokenizer(),
                    arch="qwen3", quant="q8_0")
    ap = argparse.ArgumentParser()
    add_engine_args(ap, port=0)
    args = ap.parse_args(["--model", gpath])
    ctx, adapters = build_ctx(args)
    assert ctx.arch == "qwen3"
    assert adapters is None
    # and it reaches the engine: one greedy token
    import dataclasses
    from nano_tpu.infer import engine
    from nano_tpu.ops import sampling
    ctx = dataclasses.replace(ctx, sampler=sampling.SamplerConfig(
        temperature=0.0, repetition_penalty=1.0))
    out = engine.generate_on_device(ctx, [1, 2, 3], 4)
    assert len(out) == 4


def test_q4_0_maps_losslessly_to_q4ktensor():
    n, out, inn = 32 * 8, 4, 64
    raw = _sanitize_f16(_random_raw(n // 32 * 18, seed=4), 18, (0,))
    t = _tensor_from_raw("w", (out, inn), gguf.GGML_Q4_0, raw)
    q4 = gguf.q4k_from_q4_0(t)
    import jax.numpy as jnp
    got = np.asarray(q4.dequantize(jnp.float32))
    np.testing.assert_allclose(got, t.to_f32(), rtol=0, atol=1e-6)
