"""Sequence-parallel (GSPMD) and pipeline-parallel (shard_map + ppermute)
training paths: loss and gradients must match the single-device
gpt.loss_fn values, and full Trainer steps must run on the mixed meshes.

All on the 8-device virtual CPU mesh (conftest).  f32 throughout so the
comparisons are tight — PP reorders nothing inside a stage (same layer
scan), so its loss is bit-comparable up to the psum's f32 reduction.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.parallel import mesh as meshlib
from nano_tpu.parallel import pipeline

CFG = ModelConfig(block_size=32, vocab_size=96, n_layer=4, n_embd=32,
                  n_head=4, n_kv_head=2, n_hidden=64)


def make_batch(rng, B=8, S=32):
    x = rng.integers(0, CFG.vocab_size, size=(B, S)).astype(np.int32)
    y = rng.integers(0, CFG.vocab_size, size=(B, S)).astype(np.int32)
    m = (rng.random((B, S)) > 0.25).astype(np.int32)
    return x, y, m


def ref_loss_and_grads(params, x, y, m):
    def f(p):
        return gpt.loss_fn(p, x, y, m, CFG, dtype=jnp.float32)
    return jax.value_and_grad(f)(params)


# ---------------------------------------------------------------------
# sequence parallel: shard the batch's S axis, let GSPMD partition
# ---------------------------------------------------------------------

def test_seq_parallel_loss_matches_single_device():
    params = gpt.init_params(jax.random.PRNGKey(0), CFG)
    x, y, m = make_batch(np.random.default_rng(1))

    ref, ref_g = ref_loss_and_grads(params, x, y, m)

    mesh = meshlib.make_mesh(n_data=2, n_seq=2, n_model=2)
    assert mesh.axis_names == ("data", "seq", "model")
    bspec = meshlib.batch_spec(mesh)
    assert bspec == P("data", "seq")
    bsh = NamedSharding(mesh, bspec)
    xs, ys, ms = (jax.device_put(a, bsh) for a in (x, y, m))
    p_sh = meshlib.shard_params(params, mesh, tensor_parallel=True)

    def f(p, x, y, m):
        return gpt.loss_fn(p, x, y, m, CFG, dtype=jnp.float32)

    loss, grads = jax.jit(jax.value_and_grad(f))(p_sh, xs, ys, ms)
    np.testing.assert_allclose(float(loss), float(ref), rtol=2e-5)
    for gr, gs in zip(jax.tree.leaves(ref_g), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   rtol=3e-4, atol=2e-5)


def test_seq_parallel_trainer_step():
    """Full Trainer on a data=2 x seq=2 x model=2 mesh: one real step."""
    from nano_tpu.train.trainer import Trainer

    tc = dict(batch_size=4, gradient_accumulation_steps=2,
              learning_rate=1e-3, eval_interval=10 ** 9, eval_iters=1,
              log_interval=1, dtype="float32",
              mesh_shape={"data": 2, "seq": 2, "model": 2})
    t = Trainer(CFG.to_dict(), tc, max_steps=1)
    t.init()
    assert t.mesh.shape["seq"] == 2

    rng = np.random.default_rng(3)
    A, B, S = 2, 4, 32
    xs = rng.integers(0, 96, size=(A, B, S)).astype(np.int32)
    ys = rng.integers(0, 96, size=(A, B, S)).astype(np.int32)
    ms = np.ones((A, B, S), np.int32)
    _, _, loss = t._train_step(t.params, None, t.opt_state, xs, ys, ms)
    assert np.isfinite(float(loss))


# ---------------------------------------------------------------------
# pipeline parallel
# ---------------------------------------------------------------------

@pytest.mark.parametrize("n_pipe,n_data", [(4, 2), (2, 2)])
def test_pp_loss_matches_single_device(n_pipe, n_data):
    params = gpt.init_params(jax.random.PRNGKey(0), CFG)
    x, y, m = make_batch(np.random.default_rng(2))

    ref, ref_g = ref_loss_and_grads(params, x, y, m)

    mesh = meshlib.make_mesh(n_data=n_data, n_pipe=n_pipe,
                             devices=jax.devices()[:n_data * n_pipe])
    p_sh = pipeline.shard_params_pp(params, mesh)
    loss_fn = pipeline.make_pp_loss(CFG, mesh, dtype=jnp.float32)

    loss, grads = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, x, y, m)))(p_sh)
    np.testing.assert_allclose(float(loss), float(ref), rtol=2e-5)
    for gr, gs in zip(jax.tree.leaves(ref_g), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   rtol=3e-4, atol=2e-5)


def test_pp_loss_with_mask_none_and_micro():
    """n_micro=4 explicit, loss_mask=None path."""
    params = gpt.init_params(jax.random.PRNGKey(4), CFG)
    x, y, _ = make_batch(np.random.default_rng(5))
    ref = gpt.loss_fn(params, x, y, None, CFG, dtype=jnp.float32)

    mesh = meshlib.make_mesh(n_data=2, n_pipe=4)
    p_sh = pipeline.shard_params_pp(params, mesh)
    loss_fn = pipeline.make_pp_loss(CFG, mesh, dtype=jnp.float32, n_micro=4)
    loss = jax.jit(lambda p: loss_fn(p, x, y, None))(p_sh)
    np.testing.assert_allclose(float(loss), float(ref), rtol=2e-5)


def test_pp_remat_matches():
    params = gpt.init_params(jax.random.PRNGKey(6), CFG)
    x, y, m = make_batch(np.random.default_rng(7))
    ref, ref_g = ref_loss_and_grads(params, x, y, m)

    mesh = meshlib.make_mesh(n_data=2, n_pipe=4)
    p_sh = pipeline.shard_params_pp(params, mesh)
    loss_fn = pipeline.make_pp_loss(CFG, mesh, dtype=jnp.float32,
                                    remat=True)
    loss, grads = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, x, y, m)))(p_sh)
    np.testing.assert_allclose(float(loss), float(ref), rtol=2e-5)
    for gr, gs in zip(jax.tree.leaves(ref_g), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   rtol=3e-4, atol=2e-5)


@pytest.mark.soak   # long e2e; fast tier covers the feature (pytest.ini)
def test_pp_trainer_two_steps_match_dp():
    """Trainer on data=2 x pipe=4 vs pure-DP: same losses step for step."""
    from nano_tpu.train.trainer import Trainer

    rng = np.random.default_rng(8)
    A, B, S = 2, 8, 32
    xs = rng.integers(0, 96, size=(A, B, S)).astype(np.int32)
    ys = rng.integers(0, 96, size=(A, B, S)).astype(np.int32)
    ms = np.ones((A, B, S), np.int32)

    losses = {}
    for name, mesh_shape in (("dp", {"data": 8}),
                             ("pp", {"data": 2, "pipe": 4})):
        tc = dict(batch_size=8, gradient_accumulation_steps=2,
                  learning_rate=1e-3, eval_interval=10 ** 9, eval_iters=1,
                  log_interval=1, dtype="float32", mesh_shape=mesh_shape)
        t = Trainer(CFG.to_dict(), tc, max_steps=2)
        t.init()
        params, opt_state = t.params, t.opt_state
        ls = []
        for _ in range(2):
            params, opt_state, loss = t._train_step(
                params, None, opt_state, xs, ys, ms)
            ls.append(float(loss))
        losses[name] = ls

    np.testing.assert_allclose(losses["pp"], losses["dp"], rtol=3e-5)


def test_pp_ce_chunk_matches():
    """ce_chunk under pipeline parallelism: chunked head+CE on the last
    stage matches the one-shot loss (values equal up to f32 summation
    order)."""
    params = gpt.init_params(jax.random.PRNGKey(9), CFG)
    x, y, m = make_batch(np.random.default_rng(10))
    ref = gpt.loss_fn(params, x, y, m, CFG, dtype=jnp.float32)

    mesh = meshlib.make_mesh(n_data=2, n_pipe=4)
    p_sh = pipeline.shard_params_pp(params, mesh)
    loss_fn = pipeline.make_pp_loss(CFG, mesh, dtype=jnp.float32,
                                    ce_chunk=16)
    loss = jax.jit(lambda p: loss_fn(p, x, y, m))(p_sh)
    np.testing.assert_allclose(float(loss), float(ref), rtol=3e-5)
