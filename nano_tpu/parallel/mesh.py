"""Device mesh + sharding rules.

Replaces the reference's DDP/NCCL stack (reference: train.py:171-191,289-291;
SURVEY §2.2, §5.8): instead of process groups and explicit all-reduce, we
declare a `jax.sharding.Mesh` with ("data", "model") axes and annotate
arrays with NamedShardings — XLA inserts the collectives (psum for DP
gradients, all-gather/reduce-scatter for TP) over ICI.

Sharding rules
  * batch arrays: ("data", None, ...) — each data-parallel group gets a
    slice of the global batch.
  * parameters (default): fully replicated (pure DP) — the models are
    small (≤168M), so DP is the right default.
  * tensor parallel (opt-in): attention heads and FFN hidden sharded over
    "model" — wq/wk/wv/w1/w3 on the output dim, wo/w2 on the input dim,
    embeddings on the vocab dim.  This is a sharding-spec change only;
    the model code is unchanged (SURVEY §2.2 "a sharding spec, not new
    code").
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"      # sequence/context parallel (GSPMD partitions attention)
PIPE_AXIS = "pipe"    # pipeline parallel (parallel/pipeline.py)


def maybe_distributed_init() -> bool:
    """Multi-host bring-up: initialize the JAX distributed runtime when a
    multi-host launch is detected (replaces the reference's torchrun
    env-var rendezvous, train.py:171-186).  On a single host this is a
    no-op.  Set COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID (or run
    under a TPU pod launcher, where JAX autodetects everything).

    Order matters: jax.distributed.initialize() must run before anything
    that initializes the XLA backends — including jax.process_count() —
    or it raises RuntimeError.  So the env-var check comes first and
    process_count() is only consulted afterwards."""
    import os
    if ("COORDINATOR_ADDRESS" in os.environ
            or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ):
        backends_up = False
        try:
            from jax._src import xla_bridge
            backends_up = xla_bridge.backends_are_initialized()
        except Exception:
            pass
        if not backends_up:
            jax.distributed.initialize()
            return True
        # Backends already up: initialize() would raise.  Either a pod
        # launcher already did the rendezvous (process_count > 1) or the
        # caller initialized JAX too early — surface that instead of
        # crashing deep inside jax.distributed.
        if jax.process_count() > 1:
            return True
        raise RuntimeError(
            "COORDINATOR_ADDRESS is set but the XLA backends were already "
            "initialized single-process; call maybe_distributed_init() "
            "before any other JAX API.")
    return jax.process_count() > 1


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              n_seq: int = 1, n_pipe: int = 1, devices=None) -> Mesh:
    """Build a device mesh; axes ordered ("data", "seq", "pipe", "model").

    "seq" and "pipe" only appear when their size > 1, so the default
    call keeps the original ("data", "model") two-axis mesh (and every
    existing sharding spec) unchanged.  Axis order puts "model" last —
    innermost on the physical topology, where TP's per-layer
    all-gather/reduce-scatter traffic wants the shortest ICI hops —
    then "pipe"/"seq" (per-tick and per-attention collectives), with
    "data" outermost (one gradient psum per step tolerates the longest
    links, including DCN in multi-pod layouts).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // (n_model * n_seq * n_pipe)
    assert n_data * n_model * n_seq * n_pipe == n, \
        (n_data, n_seq, n_pipe, n_model, n)
    dims = [(DATA_AXIS, n_data)]
    if n_seq > 1:
        dims.append((SEQ_AXIS, n_seq))
    if n_pipe > 1:
        dims.append((PIPE_AXIS, n_pipe))
    dims.append((MODEL_AXIS, n_model))
    arr = np.asarray(devices).reshape([d for _, d in dims])
    return Mesh(arr, tuple(name for name, _ in dims))


def batch_spec(mesh: Optional[Mesh] = None) -> P:
    """(B, S) batch spec: B over "data", S over "seq" when present.

    Sharding the sequence axis is the whole of sequence/context
    parallelism on the jit path: tokens, targets and therefore every
    (B, S, ...) activation downstream are partitioned on S, and GSPMD
    partitions the attention score/prob einsums itself (all-gathering
    K/V over "seq" — the all-gather variant of context parallelism;
    the causal mask is an iota comparison, partitioned exactly).
    """
    if mesh is not None and SEQ_AXIS in mesh.axis_names:
        return P(DATA_AXIS, SEQ_AXIS)
    return P(DATA_AXIS)


def param_specs(params: Any, tensor_parallel: bool = False) -> Any:
    """PartitionSpec pytree matching a model params pytree."""
    def spec_for(path_key: str, leaf) -> P:
        if not tensor_parallel:
            return P()
        nd = np.ndim(leaf)
        # stacked block weights are (L, in, out)
        if path_key in ("wq", "wk", "wv", "w1", "w3"):
            return P(None, None, MODEL_AXIS)
        if path_key in ("wo", "w2"):
            return P(None, MODEL_AXIS, None)
        if path_key in ("bq", "bk", "bv"):
            return P(None, MODEL_AXIS)
        if path_key == "tok_embeddings" and nd == 2:
            return P()       # replicated; logits matmul stays local
        return P()

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = spec_for(k, v)
        return out

    return walk(params)


def shard_params(params: Any, mesh: Mesh,
                 tensor_parallel: bool = False) -> Any:
    specs = param_specs(params, tensor_parallel)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def infer_param_specs(params: Any) -> Any:
    """Tensor-parallel PartitionSpecs for INFERENCE params.

    Handles dense (L, in, out) stacks and quantized Q80/Q4K pytrees whose
    leaves keep the file's (L, out, in) layout: column-parallel
    projections (wq/wk/wv/wqkv/w1/w3/w13) shard the OUT dim, row-parallel
    (wo/w2) shard the IN dim — Megatron-style, expressed purely as
    sharding specs (SURVEY §2.2).  Norms, embeddings and the classifier
    stay replicated (the models are small; vocab matmul is one op).
    """
    from nano_tpu.ops.qmatmul import Q80Tensor
    from nano_tpu.ops.q4k import Q4KTensor

    COL = ("wq", "wk", "wv", "wqkv", "w1", "w3", "w13")
    ROW = ("wo", "w2")

    def qspec(key: str, w) -> Any:
        grouped = getattr(w, "layout", "rows") in ("grouped",)
        cleaf = P()
        if grouped:
            # values (L, G, out, gs): out is dim -2, in spans (G, gs);
            # scales/biases (L, out, G); corr/qsum (L, out, 2, G)
            if key in COL:
                vleaf = P(None, None, MODEL_AXIS, None)
                sleaf = P(None, MODEL_AXIS, None)
                cleaf = P(None, MODEL_AXIS, None, None)
            elif key in ROW:     # shard the group axis (contraction)
                vleaf = P(None, MODEL_AXIS, None, None)
                sleaf = P(None, None, MODEL_AXIS)
                cleaf = P(None, None, None, MODEL_AXIS)
            else:
                vleaf, sleaf = P(), P()
        else:
            # file layout: q/packed (L, out, in[/2]), scales (L, out, g)
            if key in COL:      # shard out (dim -2)
                vleaf = sleaf = P(None, MODEL_AXIS, None)
            elif key in ROW:    # shard in (dim -1); groups follow in
                vleaf = sleaf = P(None, None, MODEL_AXIS)
            else:
                vleaf, sleaf = P(), P()
        if isinstance(w, Q80Tensor):
            return Q80Tensor(q=vleaf, scales=sleaf,
                             group_size=w.group_size, layout=w.layout)
        return Q4KTensor(packed=vleaf, scales=sleaf, biases=sleaf,
                         in_dim=w.in_dim, layout=w.layout,
                         qsum=None if w.qsum is None else cleaf)

    def spec_for(key: str, w) -> Any:
        from nano_tpu.ops.qmatmul import Q80Tensor as Q80
        from nano_tpu.ops.q4k import Q4KTensor as Q4K
        if isinstance(w, (Q80, Q4K)):
            return qspec(key, w)
        if key in COL:      # dense stacked (L, in, out)
            return P(None, None, MODEL_AXIS)
        if key in ROW:
            return P(None, MODEL_AXIS, None)
        if key in ("bq", "bk", "bv"):
            return P(None, MODEL_AXIS)
        return P()

    def walk(tree):
        out = {}
        for k, v in tree.items():
            out[k] = walk(v) if isinstance(v, dict) else spec_for(k, v)
        return out

    return walk(params)


def kv_cache_spec() -> P:
    """KV cache (L, B, T, KV, D): shard KV heads over the model axis.

    The batch axis stays unsharded — decode batches are small (often 1)
    and slot counts need not divide the data axis.
    """
    return P(None, None, None, MODEL_AXIS, None)


def _divisible(shape, spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, tuple(spec) + (None,) * len(shape)):
        if axis is not None and dim % mesh.shape[axis] != 0:
            return False
    return True


def shard_inference_params(params: Any, mesh: Mesh) -> Any:
    """device_put params with TP shardings (leaf-wise, quantization-aware).

    Leaves whose sharded dim does not divide the mesh axis (e.g. a single
    quantization group in toy models) fall back to replication.
    """
    specs = infer_param_specs(params)
    flat_p, treedef = jax.tree.flatten(params)
    flat_s = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert len(flat_p) == len(flat_s), (len(flat_p), len(flat_s))
    out = []
    for x, s in zip(flat_p, flat_s):
        if not _divisible(np.shape(x), s, mesh):
            s = P()
        out.append(jax.device_put(x, NamedSharding(mesh, s)))
    return jax.tree.unflatten(treedef, out)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
