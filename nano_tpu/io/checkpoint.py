"""Checkpoint save/load — self-contained, resumable.

Parity with the reference .pt schema (reference: train.py:402-427, SURVEY
§2.6): a checkpoint holds version, is_lora flag, model params (or LoRA-only
params), optimizer state, step_count, both configs, and the FULL tokenizer
config — inference never needs a sidecar vocab file.

Format: a single ``.npz`` (zip of npy arrays) — pickle-free, portable,
mmap-friendly — with pytree leaves flattened to path-keyed arrays and JSON
metadata under reserved keys.
"""

from __future__ import annotations

import io
import json
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax

VERSION = "nano-tpu-2026.08"

_META_KEY = "__meta__"

# npz can't represent ml_dtypes dtypes (they round-trip as raw void):
# store them as a same-width uint view with the dtype name suffixed to
# the key, and view back on load.  Matters for bf16 Adam moments
# (TrainConfig.adam_mu_dtype) and any bf16-param checkpoints.
_DTYPE_SEP = "::"
try:
    import ml_dtypes
    _EXT_DTYPES = {"bfloat16": np.dtype(ml_dtypes.bfloat16),
                   "float8_e4m3fn": np.dtype(ml_dtypes.float8_e4m3fn),
                   "float8_e5m2": np.dtype(ml_dtypes.float8_e5m2)}
except ImportError:                                  # pragma: no cover
    _EXT_DTYPES = {}


def _flatten(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "/" + "/".join(_path_str(p) for p in path)
        arr = np.asarray(leaf)
        for name, dt in _EXT_DTYPES.items():
            if arr.dtype == dt:
                key += _DTYPE_SEP + name
                arr = arr.view(np.dtype(f"u{dt.itemsize}"))
                break
        flat[key] = arr
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def _unflatten(flat: Dict[str, np.ndarray], prefix: str, like: Any) -> Any:
    """Rebuild a pytree with the same structure as `like`."""
    paths_and_leaves = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path, leaf in paths_and_leaves[0]:
        key = prefix + "/" + "/".join(_path_str(p) for p in path)
        if key in flat:
            leaves.append(flat[key])
            continue
        for name, dt in _EXT_DTYPES.items():
            k2 = key + _DTYPE_SEP + name
            if k2 in flat:
                leaves.append(flat[k2].view(dt))
                break
        else:
            raise KeyError(f"checkpoint missing {key}")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves)


def save_checkpoint(path: str, *, params: Any = None, lora: Any = None,
                    opt_state: Any = None, step: int = 0,
                    model_config: Optional[dict] = None,
                    train_config: Optional[dict] = None,
                    tokenizer_config: Optional[dict] = None,
                    extra: Optional[dict] = None) -> None:
    arrays: Dict[str, np.ndarray] = {}
    if params is not None:
        arrays.update(_flatten(params, "model"))
    if lora is not None:
        arrays.update(_flatten(lora, "lora"))
    if opt_state is not None:
        arrays.update(_flatten(opt_state, "opt"))
    meta = {
        "version": VERSION,
        "is_lora": lora is not None,
        "step_count": int(step),
        "model_config": model_config,
        "train_config": train_config,
        "tokenizer_config": tokenizer_config,
        "extra": extra or {},
    }
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    # atomic-ish write
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    import os
    os.replace(tmp, path)


class Checkpoint:
    """Lazy checkpoint reader."""

    def __init__(self, path: str):
        self._npz = np.load(path)
        self.meta = json.loads(bytes(self._npz[_META_KEY]).decode("utf-8"))

    @property
    def step(self) -> int:
        return self.meta["step_count"]

    @property
    def is_lora(self) -> bool:
        return self.meta["is_lora"]

    @property
    def model_config(self) -> Optional[dict]:
        return self.meta["model_config"]

    @property
    def train_config(self) -> Optional[dict]:
        return self.meta["train_config"]

    @property
    def tokenizer_config(self) -> Optional[dict]:
        return self.meta["tokenizer_config"]

    def _collect(self, prefix: str) -> Dict[str, np.ndarray]:
        out = {}
        for key in self._npz.files:
            if key.startswith(prefix + "/"):
                out[key] = self._npz[key]
        return out

    def load_params(self, like: Any) -> Any:
        return _unflatten(self._collect("model"), "model", like)

    def load_lora(self, like: Any) -> Any:
        return _unflatten(self._collect("lora"), "lora", like)

    def load_opt_state(self, like: Any) -> Any:
        return _unflatten(self._collect("opt"), "opt", like)

    def has(self, prefix: str) -> bool:
        return any(k.startswith(prefix + "/") for k in self._npz.files)
