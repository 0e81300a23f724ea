"""Model tests: shapes, KV-cache consistency, and parity vs the reference
torch implementation (used strictly as a numerical oracle)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from .conftest import REFERENCE_DIR, reference_available

TINY = dict(block_size=32, vocab_size=64, n_layer=2, n_embd=32,
            n_head=4, n_kv_head=2, n_hidden=64)


def tiny_cfg(**over):
    d = dict(TINY)
    d.update(over)
    return ModelConfig(**d)


def test_forward_shapes():
    cfg = tiny_cfg()
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    idx = jnp.zeros((2, 16), jnp.int32)
    logits = gpt.forward(params, idx, cfg, dtype=jnp.float32)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_loss_decreases_direction():
    cfg = tiny_cfg()
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (4, 16), 0, cfg.vocab_size)
    loss = gpt.loss_fn(params, idx, tgt, None, cfg, dtype=jnp.float32)
    # random init -> loss near ln(V)
    assert abs(float(loss) - np.log(cfg.vocab_size)) < 1.0


def test_loss_mask_changes_loss():
    cfg = tiny_cfg()
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, cfg.vocab_size)
    mask = jnp.zeros((2, 16), jnp.int32).at[:, :4].set(1)
    l_all = gpt.loss_fn(params, idx, tgt, None, cfg, dtype=jnp.float32)
    l_masked = gpt.loss_fn(params, idx, tgt, mask, cfg, dtype=jnp.float32)
    assert not np.isclose(float(l_all), float(l_masked))


@pytest.mark.soak   # long e2e; fast tier covers the feature (pytest.ini)
def test_chunked_ce_matches_full_loss_and_grads():
    """ce_chunk must reproduce the one-shot CE (values to f32 summation
    order, grads close) — masked and unmasked, incl. a chunk size that
    does not divide the token count (padding path)."""
    cfg = tiny_cfg()
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, cfg.vocab_size)
    mask = jnp.zeros((2, 16), jnp.int32).at[:, 3:].set(1)
    for m in (None, mask):
        full, gfull = jax.value_and_grad(gpt.loss_fn)(
            params, idx, tgt, m, cfg, dtype=jnp.float32)
        for chunk in (8, 12, 32, 64):
            ck, gck = jax.value_and_grad(gpt.loss_fn)(
                params, idx, tgt, m, cfg, dtype=jnp.float32, ce_chunk=chunk)
            assert np.isclose(float(full), float(ck), rtol=1e-6), (
                m is None, chunk, float(full), float(ck))
            flat_a = jax.tree.leaves(gfull)
            flat_b = jax.tree.leaves(gck)
            for a, b in zip(flat_a, flat_b):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-5, atol=1e-6)


@pytest.mark.soak   # long e2e; fast tier covers the feature (pytest.ini)
def test_named_remat_policies_match_full():
    """"ffn"/"heads"/"dots" remat policies change memory scheduling only —
    loss and grads must match the unrematerialized forward."""
    cfg = tiny_cfg()
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, cfg.vocab_size)
    base, gbase = jax.value_and_grad(gpt.loss_fn)(
        params, idx, tgt, None, cfg, dtype=jnp.float32)
    for policy in (True, "dots", "ffn", "heads"):
        loss, g = jax.value_and_grad(gpt.loss_fn)(
            params, idx, tgt, None, cfg, dtype=jnp.float32, remat=policy)
        assert np.isclose(float(base), float(loss), rtol=1e-6), policy
        for a, b in zip(jax.tree.leaves(gbase), jax.tree.leaves(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6,
                                       err_msg=str(policy))


def test_kv_cache_matches_full_forward():
    """Prefill+decode through the cache must equal the full forward."""
    cfg = tiny_cfg()
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    B, S = 2, 12
    idx = jax.random.randint(jax.random.PRNGKey(3), (B, S), 0, cfg.vocab_size)

    full = gpt.forward(params, idx, cfg, dtype=jnp.float32)

    cache = gpt.KVCache.create(cfg, B, cfg.block_size, dtype=jnp.float32)
    # prefill first 8 tokens, then decode 4 one at a time
    logits_p, cache = gpt.forward_with_cache(
        params, idx[:, :8], cache, jnp.int32(0), cfg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full[:, :8]),
                               rtol=2e-4, atol=2e-4)
    for t in range(8, S):
        step_logits, cache = gpt.forward_with_cache(
            params, idx[:, t:t+1], cache, jnp.int32(t), cfg, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                                   np.asarray(full[:, t]),
                                   rtol=2e-4, atol=2e-4)


def test_learned_pos_emb_and_non_causal():
    cfg = tiny_cfg(use_rope=False, is_causal=False)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    idx = jnp.zeros((1, 8), jnp.int32)
    logits = gpt.forward(params, idx, cfg, dtype=jnp.float32)
    assert logits.shape == (1, 8, cfg.vocab_size)


def test_non_causal_sees_future():
    """With global attention, changing a later token changes earlier logits."""
    cfg = tiny_cfg(is_causal=False)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    a = jnp.array([[1, 2, 3, 4]], jnp.int32)
    b = jnp.array([[1, 2, 3, 5]], jnp.int32)
    la = gpt.forward(params, a, cfg, dtype=jnp.float32)
    lb = gpt.forward(params, b, cfg, dtype=jnp.float32)
    assert not np.allclose(np.asarray(la[:, 0]), np.asarray(lb[:, 0]))

    cfg_c = tiny_cfg(is_causal=True)
    params_c = gpt.init_params(jax.random.PRNGKey(0), cfg_c)
    la = gpt.forward(params_c, a, cfg_c, dtype=jnp.float32)
    lb = gpt.forward(params_c, b, cfg_c, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(la[:, :3]), np.asarray(lb[:, :3]),
                               rtol=1e-5, atol=1e-5)


def test_lora_zero_init_is_identity():
    cfg = tiny_cfg()
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    lora = gpt.init_lora_params(jax.random.PRNGKey(1), cfg, rank=4)
    idx = jnp.zeros((1, 8), jnp.int32)
    base = gpt.forward(params, idx, cfg, dtype=jnp.float32)
    with_lora = gpt.forward(params, idx, cfg, dtype=jnp.float32,
                            lora=lora, lora_scale=2.0)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora),
                               rtol=1e-6, atol=1e-6)


# =====================================================================
# Reference parity (torch oracle)
# =====================================================================

@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_forward_parity_vs_reference():
    """Same weights -> same logits as the reference torch model (fp32)."""
    import torch
    from .conftest import import_reference_module
    ref_model = import_reference_module("model")
    if True:
        rcfg = ref_model.ModelConfig(
            block_size=32, vocab_size=64, n_layer=2, n_embd=32,
            n_head=4, n_kv_head=2, n_hidden=64, dropout=0.0)
        torch.manual_seed(0)
        rm = ref_model.GPT(rcfg)
        rm.eval()

        cfg = tiny_cfg()
        params = _params_from_torch(rm, cfg)

        idx_np = np.random.RandomState(0).randint(0, 64, size=(2, 16))
        with torch.no_grad():
            ref_logits, _ = rm(torch.tensor(idx_np, dtype=torch.long),
                               targets=torch.tensor(idx_np, dtype=torch.long))
        ours = gpt.forward(params, jnp.asarray(idx_np, jnp.int32), cfg,
                           dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(ours), ref_logits.numpy(),
                                   rtol=2e-4, atol=2e-4)


def _params_from_torch(rm, cfg):
    """Convert a reference torch GPT's weights into our pytree layout.

    torch nn.Linear stores (out, in); we store (in, out) -> transpose.
    Layers are stacked along a leading axis.
    """
    def t(x):
        return jnp.asarray(x.detach().numpy())

    def stack(getter, transpose=True):
        mats = [getter(layer) for layer in rm.layers]
        arrs = [t(m).T if transpose else t(m) for m in mats]
        return jnp.stack(arrs)

    return {
        "tok_embeddings": t(rm.tok_embeddings.weight),
        "norm": t(rm.norm.weight),
        "blocks": {
            "attn_norm": stack(lambda l: l.attention_norm.weight, False),
            "ffn_norm": stack(lambda l: l.ffn_norm.weight, False),
            "wq": stack(lambda l: l.attention.wq.weight),
            "wk": stack(lambda l: l.attention.wk.weight),
            "wv": stack(lambda l: l.attention.wv.weight),
            "wo": stack(lambda l: l.attention.wo.weight),
            "w1": stack(lambda l: l.feed_forward.w1.weight),
            "w2": stack(lambda l: l.feed_forward.w2.weight),
            "w3": stack(lambda l: l.feed_forward.w3.weight),
        },
    }


def test_merge_lora_matches_runtime_adapter():
    """merge_lora folds A@B into the base weights: merged-params forward
    must equal base+adapter forward (the reference's model.py:433-434
    leaves merge_lora as an unimplemented TODO)."""
    cfg = tiny_cfg()
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    lora = gpt.init_lora_params(jax.random.PRNGKey(1), cfg, rank=4)
    # zero-init B would make the test vacuous: randomize both halves
    lora = {k: (jax.random.normal(jax.random.PRNGKey(i + 2), v.shape,
                                  jnp.float32) * 0.05)
            for i, (k, v) in enumerate(sorted(lora.items()))}
    idx = jnp.array([[1, 5, 9, 2, 7, 3]], jnp.int32)
    want = gpt.forward(params, idx, cfg, dtype=jnp.float32,
                       lora=lora, lora_scale=1.5)
    merged = gpt.merge_lora(params, lora, 1.5)
    got = gpt.forward(merged, idx, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # base params untouched
    base_again = gpt.forward(params, idx, cfg, dtype=jnp.float32)
    assert not np.allclose(np.asarray(base_again), np.asarray(want))
