"""Pipeline-parallel training — GPipe schedule as a scan over ppermute.

TPU-native pipeline parallelism over a ("data", "pipe") mesh: the
layer-stacked parameter pytree is sharded on its leading (layer) axis
over "pipe" — n_layer/n_pipe contiguous layers per device — and the
forward runs under `jax.shard_map` as one `lax.scan` over
M + P - 1 pipeline ticks.  Each tick every stage runs its local layer
chunk on its resident microbatch activation, then hands the result to
the next stage with a single `ppermute` over ICI.  Stage 0 feeds fresh
microbatches, the last stage runs final-norm + head + CE inside a
`lax.cond` (no collectives in the branch, so per-device divergence is
legal SPMD), and the scalar loss is psum'd across the mesh.

Backward is plain `jax.grad` THROUGH the shard_map: `ppermute`
transposes to the reverse permutation (activation cotangents flow
last stage -> first over the same ICI links, i.e. the textbook 1F-then-
1B wave), per-stage parameter grads stay resident on their stage, and
replicated leaves (embeddings, norms, head) get their cotangents
psum'd by the shard_map transpose itself — no hand-written backward
schedule, no NCCL send/recv state machine.

The reference has no pipeline story (single-GPU + DDP, reference
train.py:171-191); this module exists for the multi-chip scaling
surface.  Composition: DP x PP on one mesh here; TP and SP compose
with DP on the jit/GSPMD path (parallel/mesh.py) instead — at Nano
scales a model either fits one chip (use DP/TP/SP) or is layer-rich
enough that PP's per-stage memory win pays for the bubble.

Schedule cost: M microbatches over P stages runs M + P - 1 ticks, so
the bubble fraction is (P-1)/(M+P-1); choose n_micro >= 2P to keep it
under ~1/3 (the default when pp_microbatches is 0 picks 2P, clamped
to the local batch).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS


def pp_param_specs(params: Any) -> Any:
    """PartitionSpecs sharding stacked block leaves over "pipe".

    Block leaves are (L, ...) stacks (models/gpt.py init_params); the
    layer axis is the pipeline axis.  Everything outside "blocks"
    (embeddings, final norm, head, wpe) is replicated — each stage
    holds a copy, and only the stage that uses it contributes a
    nonzero cotangent (psum'd by the shard_map transpose).
    """
    def walk(tree, under_blocks=False):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, under_blocks or k == "blocks")
            else:
                out[k] = P(PIPE_AXIS) if (under_blocks or k == "blocks") \
                    else P()
        return out
    return walk(params)


def shard_params_pp(params: Any, mesh: Mesh) -> Any:
    """device_put a training params pytree with pipeline shardings."""
    specs = pp_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def default_n_micro(n_pipe: int, batch_local: int) -> int:
    """2P microbatches (bubble < 1/3), clamped to what the local batch
    can supply; always a divisor of batch_local."""
    m = min(2 * n_pipe, batch_local)
    while batch_local % m != 0:
        m -= 1
    return max(m, 1)


def make_pp_loss(cfg: ModelConfig, mesh: Mesh, dtype=jnp.bfloat16,
                 n_micro: int = 0, remat: Any = False,
                 ce_chunk: int = 0):
    """Build loss(params, x, y, m) -> scalar CE over a ("data","pipe") mesh.

    The returned function is jit-compatible and differentiable; wrap it
    in jax.value_and_grad exactly like gpt.loss_fn.  `x`/`y`/`m` are the
    global (B, S) batch sharded over "data"; params must be sharded with
    shard_params_pp.  `remat` and `ce_chunk` accept the same values as
    gpt.loss_fn — with ce_chunk the last stage's head+CE runs in token
    chunks (full logits never materialize; gpt._chunked_ce_sums).
    """
    assert PIPE_AXIS in mesh.axis_names, mesh.axis_names
    n_pipe = mesh.shape[PIPE_AXIS]
    assert cfg.n_layer % n_pipe == 0, (cfg.n_layer, n_pipe)
    perm = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]
    axes = tuple(mesh.axis_names)

    policy = gpt.REMAT_POLICIES.get(remat)() if isinstance(remat, str) \
        and remat in gpt.REMAT_POLICIES else None

    def local_forward(blocks_local, inp, cos, sin, mask):
        """Run this stage's layer chunk (L/P layers) on (mb, S, E)."""
        def body(carry, layer):
            out, _ = gpt.block(carry, layer, cfg, cos, sin, mask, dtype)
            return out, ()
        if remat:
            body = jax.checkpoint(body, policy=policy) if policy \
                else jax.checkpoint(body)
        h, _ = lax.scan(body, inp, blocks_local)
        return h

    def device_loss(params, x, y, m):
        """Per-device body under shard_map: x/y/m local (B_loc, S)."""
        stage = lax.axis_index(PIPE_AXIS)
        B_loc, S = x.shape
        M = n_micro if n_micro > 0 else default_n_micro(n_pipe, B_loc)
        assert B_loc % M == 0, (B_loc, M)
        mb = B_loc // M
        E = cfg.n_embd

        if cfg.use_rope:
            cos, sin = gpt.precompute_rope(cfg.head_dim, S, cfg.rope_theta)
        else:
            cos = sin = None
        mask = gpt._causal_mask(S) if cfg.is_causal else None

        x_mb = x.reshape(M, mb, S)
        blocks_local = params["blocks"]

        def embed_mb(idx_tokens):
            h0 = gpt.embed_tokens(params, idx_tokens, dtype)
            if not cfg.use_rope:
                h0 = h0 + params["wpe"][:S].astype(dtype)
            return h0

        def tick(carry, t):
            state, outputs = carry
            mb_idx = jnp.clip(t, 0, M - 1)
            # embed only on stage 0 (same runtime-stage lax.cond pattern
            # as head_ce; no collectives inside): every other stage was
            # paying the (V, E) row gather forward and a zero-cotangent
            # scatter-add into the embedding grad backward, per tick
            inp = lax.cond(
                stage == 0,
                lambda: embed_mb(lax.dynamic_index_in_dim(
                    x_mb, mb_idx, keepdims=False)),
                lambda: state)
            out = local_forward(blocks_local, inp, cos, sin, mask)
            # the last stage banks one finished microbatch per tick once
            # the pipeline is full (tick >= P-1)
            widx = jnp.clip(t - (n_pipe - 1), 0, M - 1)
            store = jnp.logical_and(stage == n_pipe - 1, t >= n_pipe - 1)
            cur = lax.dynamic_index_in_dim(outputs, widx, keepdims=True)
            outputs = lax.dynamic_update_index_in_dim(
                outputs, jnp.where(store, out[None], cur), widx, 0)
            state = lax.ppermute(out, PIPE_AXIS, perm)
            return (state, outputs), ()

        zeros_state = jnp.zeros((mb, S, E), dtype)
        zeros_out = jnp.zeros((M, mb, S, E), dtype)
        (_, outputs), _ = lax.scan(
            tick, (zeros_state, zeros_out), jnp.arange(M + n_pipe - 1))

        # head + CE only execute on the last stage (lax.cond with a
        # runtime stage predicate: both branches are compiled once, each
        # device runs one — legal because the branch has no collectives)
        mw = (jnp.ones((B_loc, S), jnp.float32) if m is None
              else m.astype(jnp.float32))

        def head_ce():
            h = outputs.reshape(B_loc, S, E)
            h = gpt.rms_norm(h, params["norm"], cfg.norm_eps)
            if ce_chunk and ce_chunk > 0:
                total, msum = gpt._chunked_ce_sums(
                    h, params, y, mw, dtype, ce_chunk)
                return total, msum
            logits = gpt.compute_logits(h, params, dtype).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
            return jnp.sum(nll * mw), jnp.sum(mw)

        def no_op():
            return jnp.float32(0.0), jnp.float32(0.0)

        nll_sum, m_sum = lax.cond(stage == n_pipe - 1, head_ce, no_op)
        total = lax.psum(nll_sum, axes)
        denom = lax.psum(m_sum, axes)
        return total / jnp.maximum(denom, 1.0)

    p_specs = None

    def loss(params, x, y, m):
        nonlocal p_specs
        if p_specs is None:
            p_specs = pp_param_specs(params)
        mm = jnp.ones_like(x) if m is None else m
        f = jax.shard_map(
            device_loss, mesh=mesh,
            in_specs=(p_specs, P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(), check_vma=False)
        return f(params, x, y, mm)

    return loss
