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


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, (n_data, n_model, n)
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_spec() -> P:
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


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
