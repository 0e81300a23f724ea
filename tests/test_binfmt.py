"""`.bin` format tests: round-trip, Q80 quant error bounds, and
bit-compatibility with the reference exporter (torch oracle)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.io import binfmt
from nano_tpu.tokenizer.trie import TrieTokenizer
from .conftest import reference_available, import_reference_module

TINY = dict(block_size=32, vocab_size=64, n_layer=2, n_embd=32,
            n_head=4, n_kv_head=2, n_hidden=64)


def make_model():
    cfg = ModelConfig(**TINY)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(52)])
    assert tok.vocab_size == 64
    return cfg, params, tok


def test_q80_quant_roundtrip_error():
    rng = np.random.RandomState(0)
    w = rng.randn(256, 128).astype(np.float32)
    q, s, err = binfmt.quantize_q80(w, 64)
    deq = binfmt.dequantize_q80(q, s, 64).reshape(w.shape)
    # max error bounded by scale/2 per group
    assert err < np.abs(w).max() / 127.0 * 0.5 + 1e-6
    assert np.abs(deq - w).max() == pytest.approx(err, abs=1e-7)


def test_tokenizer_field_roundtrip():
    _, _, tok = make_model()
    blob = binfmt.serialize_tokenizer_field(tok.config)
    cfg2, nxt = binfmt.parse_tokenizer_field(blob, 0)
    assert nxt == len(blob)
    assert cfg2["itos"] == tok.itos
    assert cfg2["special_tokens"] == tok.special_tokens


def test_f32_roundtrip(tmp_path):
    cfg, params, tok = make_model()
    path = str(tmp_path / "m.bin")
    binfmt.write_model(path, params, cfg, tok.config, quant="f32")
    bm = binfmt.read_model(path)
    assert bm.config.n_layer == cfg.n_layer
    assert bm.config.vocab_size == cfg.vocab_size
    assert bm.tokenizer_config["itos"] == tok.itos

    for a, b in zip(jax.tree.leaves(bm.params), jax.tree.leaves(
            jax.tree.map(lambda x: np.asarray(x, np.float32), params))):
        np.testing.assert_array_equal(a, b)

    # logits identical through the round trip
    idx = jnp.arange(16, dtype=jnp.int32)[None, :]
    l0 = gpt.forward(params, idx, cfg, dtype=jnp.float32)
    l1 = gpt.forward(jax.tree.map(jnp.asarray, bm.params), idx, bm.config,
                     dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-6)


def test_q80_roundtrip(tmp_path):
    cfg, params, tok = make_model()
    path = str(tmp_path / "m_q80.bin")
    binfmt.write_model(path, params, cfg, tok.config, quant="q80", group_size=128)
    bm = binfmt.read_model(path)
    # group size backed off to divide n_embd=32
    assert bm.header.group_size == 32
    assert bm.qparams is not None
    # dequantized weights close to originals
    w_ref = np.asarray(params["blocks"]["wq"], np.float32)
    w_deq = bm.params["blocks"]["wq"]
    assert np.abs(w_ref - w_deq).max() < 0.02  # |w|~0.08, scale/2 bound

    idx = jnp.arange(16, dtype=jnp.int32)[None, :]
    l0 = gpt.forward(params, idx, cfg, dtype=jnp.float32)
    l1 = gpt.forward(jax.tree.map(jnp.asarray, bm.params), idx, bm.config,
                     dtype=jnp.float32)
    # quantization error bounded on logits
    assert np.abs(np.asarray(l0) - np.asarray(l1)).max() < 0.5


def test_lora_roundtrip(tmp_path):
    cfg, params, tok = make_model()
    lora = gpt.init_lora_params(jax.random.PRNGKey(1), cfg, rank=4)
    # randomize B so the file content is nontrivial
    lora = jax.tree.map(
        lambda x: jnp.asarray(np.random.RandomState(0).randn(*x.shape),
                              jnp.float32), lora)
    path = str(tmp_path / "l.bin")
    binfmt.write_lora(path, lora, cfg, rank=4, alpha=32)
    bl = binfmt.read_lora(path, cfg)
    assert bl.rank == 4 and bl.alpha == 32
    for k in lora:
        np.testing.assert_allclose(np.asarray(lora[k]), bl.lora[k], atol=1e-7)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_reference_export_compat(tmp_path):
    """A file written by the REFERENCE exporter parses identically here."""
    import sys
    import torch
    ref_model = import_reference_module("model")
    # export.py does `from model import GPT`; alias the reference module
    sys.modules.setdefault("model", ref_model)
    ref_export = import_reference_module("export")

    rcfg = ref_model.ModelConfig(**TINY, dropout=0.0)
    torch.manual_seed(0)
    rm = ref_model.GPT(rcfg)
    rm.eval()

    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(52)])

    ref_path = str(tmp_path / "ref.bin")
    ref_export.export_model(rm, tok.config, ref_path)
    bm = binfmt.read_model(ref_path)

    # forward parity: reference torch model vs our params read from its file
    idx_np = np.random.RandomState(0).randint(0, 64, size=(1, 16))
    with torch.no_grad():
        ref_logits, _ = rm(torch.tensor(idx_np, dtype=torch.long),
                           targets=torch.tensor(idx_np, dtype=torch.long))
    ours = gpt.forward(jax.tree.map(jnp.asarray, bm.params),
                       jnp.asarray(idx_np, jnp.int32), bm.config,
                       dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), ref_logits.numpy(),
                               rtol=1e-4, atol=1e-4)

    # and byte-level: our writer must produce the identical file
    our_path = str(tmp_path / "ours.bin")
    params = {
        "tok_embeddings": np.asarray(bm.params["tok_embeddings"]),
        "norm": np.asarray(bm.params["norm"]),
        "blocks": {k: np.asarray(v) for k, v in bm.params["blocks"].items()},
    }
    binfmt.write_model(our_path, params, bm.config, tok.config, quant="f32",
                       rope_tables=(bm.rope_cos, bm.rope_sin))
    with open(ref_path, "rb") as f:
        ref_bytes = f.read()
    with open(our_path, "rb") as f:
        our_bytes = f.read()
    assert ref_bytes == our_bytes


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_reference_q80_export_compat(tmp_path):
    """Q80 files from the reference exporter parse + dequantize identically.

    Uses n_embd=128 AND n_hidden=256 so the reference's group-size
    backoff never fires: the reference writes group_size into the header
    BEFORE backing it off (export.py:398 vs 418-420) and only checks
    n_embd — with gs not dividing n_hidden its own engine silently drops
    tail columns (infer/infer.c:668 `j <= n - group_size`).  Our writer
    requires gs | gcd(E, H*D, F) (binfmt._q80_group_size), so byte-parity
    is asserted in the regime where the reference file is actually
    self-consistent.
    """
    import sys
    import torch
    ref_model = import_reference_module("model")
    sys.modules.setdefault("model", ref_model)
    ref_export = import_reference_module("export")

    tiny128 = dict(TINY, n_embd=128, n_hidden=256)
    rcfg = ref_model.ModelConfig(**tiny128, dropout=0.0)
    torch.manual_seed(0)
    rm = ref_model.GPT(rcfg)
    rm.eval()
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(52)])

    ref_path = str(tmp_path / "ref_q80.bin")
    ref_export.export_quantized(rm, tok.config, ref_path, group_size=128)
    bm = binfmt.read_model(ref_path)
    assert bm.header.quant_type == binfmt.QUANT_Q80
    assert bm.header.group_size == 128

    # our q80 writer reproduces the reference file byte-for-byte
    our_path = str(tmp_path / "ours_q80.bin")
    wt = rm.state_dict()

    def stack_T(prefix, attr):
        return np.stack([
            wt[f"layers.{l}.{prefix}.{attr}.weight"].numpy().T.copy()
            for l in range(rcfg.n_layer)])

    params = {
        "tok_embeddings": wt["tok_embeddings.weight"].numpy(),
        "norm": wt["norm.weight"].numpy(),
        "blocks": {
            "attn_norm": np.stack([wt[f"layers.{l}.attention_norm.weight"].numpy()
                                   for l in range(rcfg.n_layer)]),
            "ffn_norm": np.stack([wt[f"layers.{l}.ffn_norm.weight"].numpy()
                                  for l in range(rcfg.n_layer)]),
            "wq": stack_T("attention", "wq"), "wk": stack_T("attention", "wk"),
            "wv": stack_T("attention", "wv"), "wo": stack_T("attention", "wo"),
            "w1": stack_T("feed_forward", "w1"), "w2": stack_T("feed_forward", "w2"),
            "w3": stack_T("feed_forward", "w3"),
        },
    }
    binfmt.write_model(our_path, params, bm.config, tok.config,
                       quant="q80", group_size=128,
                       rope_tables=(bm.rope_cos, bm.rope_sin))
    with open(ref_path, "rb") as f:
        ref_bytes = f.read()
    with open(our_path, "rb") as f:
        our_bytes = f.read()
    assert ref_bytes == our_bytes


def test_rope_theta_header_extension(tmp_path):
    """Non-default rope_theta survives the .bin round-trip (stored in the
    header's zero-padding; default-theta files stay byte-identical with
    the reference format)."""
    cfg = ModelConfig(block_size=32, vocab_size=64, n_layer=2, n_embd=32,
                      n_head=4, n_kv_head=2, n_hidden=64, rope_theta=1e7)
    params = jax.tree.map(np.asarray, gpt.init_params(jax.random.PRNGKey(0), cfg))
    tok = TrieTokenizer()
    tok.build([chr(97 + i) for i in range(26)])
    path = str(tmp_path / "theta.bin")
    binfmt.write_model(path, params, cfg, tok.config, quant="f32")
    bm = binfmt.read_model(path)
    assert bm.header.rope_theta == 1e7
    assert bm.config.rope_theta == 1e7

    # default theta -> extension bytes stay zero (reference byte-compat)
    cfg2 = ModelConfig(block_size=32, vocab_size=64, n_layer=2, n_embd=32,
                       n_head=4, n_kv_head=2, n_hidden=64)
    binfmt.write_model(str(tmp_path / "d.bin"), params, cfg2, tok.config,
                       quant="f32")
    with open(tmp_path / "d.bin", "rb") as f:
        hdr = f.read(256)
    assert hdr[68:72] == b"\x00\x00\x00\x00"
