"""Fused decode-attention kernel vs the XLA einsum path (interpret mode
on CPU; the real-TPU win is measured in PERF.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nano_tpu.ops import decode_attn


def einsum_reference(q, kc, vc, ks, vs, pos, n_kv, rep):
    """The models/gpt.py decode-attention math, S=1."""
    B, H, D = q.shape
    T = kc.shape[1]
    qg = q.astype(jnp.float32).reshape(B, 1, n_kv, rep, D)
    scores = jnp.einsum("bskrd,btkd->bkrst", qg, kc.astype(jnp.float32))
    scores = scores / np.sqrt(D)
    if ks is not None:
        scores = scores * ks.transpose(0, 2, 1)[:, :, None, None, :]
    mask = jnp.where(jnp.arange(T)[None, :] <= pos[:, None], 0.0, -jnp.inf)
    scores = scores + mask[:, None, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    if vs is not None:
        probs = probs * vs.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum("bkrst,btkd->bskrd", probs, vc.astype(jnp.float32))
    return out.reshape(B, H * D)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("B,T,n_kv,rep,D", [
    (1, 128, 2, 2, 128),     # GQA single stream
    (3, 256, 2, 1, 128),     # MHA batched, per-slot positions
    (2, 128, 1, 4, 256),     # wide rep, D=256
])
def test_kernel_matches_einsum(quant, B, T, n_kv, rep, D):
    rng = np.random.RandomState(B * 1000 + T + n_kv + rep + D + quant)
    H = n_kv * rep
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    if quant:
        kc = jnp.asarray(rng.randint(-127, 128, (B, T, n_kv, D)),
                         jnp.int8)
        vc = jnp.asarray(rng.randint(-127, 128, (B, T, n_kv, D)),
                         jnp.int8)
        ks = jnp.asarray(rng.rand(B, T, n_kv).astype(np.float32) * 0.02)
        vs = jnp.asarray(rng.rand(B, T, n_kv).astype(np.float32) * 0.02)
    else:
        kc = jnp.asarray(rng.randn(B, T, n_kv, D).astype(np.float32))
        vc = jnp.asarray(rng.randn(B, T, n_kv, D).astype(np.float32))
        ks = vs = None
    pos = jnp.asarray(rng.randint(0, T, (B,)), jnp.int32)

    got = decode_attn.decode_attention(q, kc, vc, ks, vs, pos, n_kv, rep,
                                       interpret=True)
    want = einsum_reference(q, kc, vc, ks, vs, pos, n_kv, rep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_supported_gating(monkeypatch):
    # default OFF: the kernel measured slower end-to-end (Mosaic launch
    # overhead, see decode_attn.supported docstring / PERF.md)
    assert not decode_attn.supported(1024, 128, 2, True)
    monkeypatch.setenv("NANO_TPU_DECODE_ATTN", "pallas")
    assert decode_attn.supported(1024, 128, 2, True)
    assert not decode_attn.supported(1024, 128, 2, False)   # CPU
    assert not decode_attn.supported(1000, 128, 2, True)    # T % 128
    assert not decode_attn.supported(1024, 48, 2, True)     # D % 128
    monkeypatch.setenv("NANO_TPU_DECODE_ATTN", "xla")
    assert not decode_attn.supported(1024, 128, 2, True)
