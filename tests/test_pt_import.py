"""Reference `.pt` checkpoint import: a checkpoint written by the actual
reference trainer schema (train.py:402-427) loads into our layout, the
forward pass matches the reference torch model, and the export chain to
`.bin` greedy-matches the reference C engine (VERDICT r1 item 8)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.io import binfmt, pt_import
from nano_tpu.infer import engine
from nano_tpu.ops import sampling
from nano_tpu.tokenizer.trie import TrieTokenizer
from .conftest import (REFERENCE_DIR, reference_available,
                       import_reference_module)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_ckpt(tmp_path_factory):
    """A real reference-model checkpoint in the reference's on-disk
    schema, built from the reference's own model.py."""
    if not reference_available():
        pytest.skip("reference not mounted")
    d = tmp_path_factory.mktemp("pt")
    ref_model = import_reference_module("model")
    cfg = ref_model.ModelConfig(
        block_size=32, vocab_size=64, n_layer=2, n_embd=32, n_head=4,
        n_kv_head=2, n_hidden=64, dropout=0.0, use_rope=True,
        norm_eps=1e-5, is_causal=True)
    torch.manual_seed(5)
    m = ref_model.GPT(cfg)
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(26)])
    ck = {
        "version": "2024.10",
        "is_lora": False,
        "model": m.state_dict(),
        "optimizer": {},
        "step_count": 123,
        "train_config": ref_model.TrainConfig(),
        "model_config": cfg,
        "tokenizer_config": tok.config,
    }
    path = str(d / "ref.pt")
    torch.save(ck, path)

    # and a LoRA checkpoint on the same base
    m.to_lora(lora_rank=4, lora_alpha=8)
    with torch.no_grad():
        for name, p in m.named_parameters():
            if "lora_b" in name:
                p.copy_(torch.randn_like(p) * 0.3)
    lora_ck = {
        "version": "2024.10", "is_lora": True,
        "lora": m.get_lora_state_dict(), "optimizer": {},
        "step_count": 7,
        "train_config": ref_model.TrainConfig(lora_rank=4, lora_alpha=8),
        "model_config": cfg,
    }
    lora_path = str(d / "ref_lora.pt")
    torch.save(lora_ck, lora_path)
    return d, path, lora_path, m, cfg, tok


def test_import_matches_torch_forward(ref_ckpt):
    d, path, _lora, m, rcfg, tok = ref_ckpt
    cfg, params, tok_cfg, step, tc = pt_import.import_checkpoint(path)
    assert step == 123
    assert cfg.n_layer == 2 and cfg.n_embd == 32
    assert tok_cfg["vocab_size"] == tok.vocab_size

    ids = np.array([[5, 9, 3, 7, 2, 11]], np.int64)
    with torch.no_grad():
        m.eval()
        # base weights only: compare against the PRE-LoRA state dict we
        # saved (the module was LoRA-wrapped after saving)
    base = pt_import.load_pt(path)["model"]
    ref_model = import_reference_module("model")
    m2 = ref_model.GPT(ref_model.ModelConfig(
        block_size=32, vocab_size=64, n_layer=2, n_embd=32, n_head=4,
        n_kv_head=2, n_hidden=64))
    m2.load_state_dict(base)
    m2.eval()
    with torch.no_grad():
        out = m2(torch.from_numpy(ids))  # last position only
        ref_logits = out[0] if isinstance(out, tuple) else out
    ref_last = ref_logits.numpy().reshape(1, -1)

    ours = np.asarray(gpt.forward(
        jax.tree.map(jnp.asarray, params), jnp.asarray(ids, jnp.int32),
        cfg, dtype=jnp.float32))[:, -1]
    np.testing.assert_allclose(ours, ref_last, rtol=2e-4, atol=2e-4)


def test_pt_to_bin_greedy_matches_c_engine(ref_ckpt, tmp_path):
    from .test_cross_engine import oracle_ok, run_oracle
    if not oracle_ok:
        pytest.skip("reference oracle unavailable")
    d, path, _lora, _m, _rcfg, tok = ref_ckpt
    out = str(tmp_path / "ref_pt.bin")
    pt_import.pt_to_bin(path, out)

    ref_prompt_ids, ref_out = run_oracle(out, "abcdef", max_new=12,
                                         temperature=0.0)
    ctx = engine.LLMContext.from_bin(
        out, max_seq_len=32, dtype=jnp.float32,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0))
    session = engine.Session(ctx, "abcdef", max_new_tokens=12)
    ours = []
    while (t := session.step()) is not None:
        ours.append(t)
    ref_trimmed = [t for t in ref_out if t not in engine.NANO_STOP_TOKENS]
    assert ours == ref_trimmed[:len(ours)]


def test_lora_import_matches_torch(ref_ckpt):
    d, path, lora_path, m, _rcfg, tok = ref_ckpt
    cfg, params, _tok, _step, _tc = pt_import.import_checkpoint(path)
    lora, rank, alpha = pt_import.import_lora(lora_path, cfg)
    assert rank == 4 and alpha == 8
    assert lora["wq_a"].shape == (2, 32, 4)
    assert lora["wq_b"].shape == (2, 4, 32)

    ids = np.array([[3, 8, 1, 4]], np.int64)
    m.eval()
    with torch.no_grad():
        out = m(torch.from_numpy(ids))
        ref_logits = (out[0] if isinstance(out, tuple) else out
                      ).numpy().reshape(1, -1)
    ours = np.asarray(gpt.forward(
        jax.tree.map(jnp.asarray, params), jnp.asarray(ids, jnp.int32),
        cfg, dtype=jnp.float32,
        lora=jax.tree.map(jnp.asarray, lora),
        lora_scale=alpha / rank))[:, -1]
    np.testing.assert_allclose(ours, ref_logits, rtol=2e-4, atol=2e-4)


def test_pt_to_npz_roundtrip(ref_ckpt, tmp_path):
    d, path, _lora, _m, _rcfg, _tok = ref_ckpt
    npz = str(tmp_path / "conv.npz")
    cfg = pt_import.pt_to_npz(path, npz)
    from nano_tpu.io.checkpoint import Checkpoint
    ck = Checkpoint(npz)
    assert ck.step == 123
    like = gpt.init_params(jax.random.PRNGKey(0), cfg)
    params = ck.load_params(like)
    assert params["tok_embeddings"].shape == (64, 32)


def test_export_cli_accepts_pt(ref_ckpt, tmp_path):
    import subprocess, sys
    from .conftest import REPO_ROOT
    d, path, _lora, _m, _rcfg, _tok = ref_ckpt
    out = str(tmp_path / "cli.bin")
    r = subprocess.run(
        [sys.executable, "export.py", out, "--quant", path],
        cwd=REPO_ROOT, capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    bm = binfmt.read_model(out)
    assert bm.header.quant_type == binfmt.QUANT_Q80
