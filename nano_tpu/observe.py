"""Observation hook — a per-phase tap into the compiled forward pass.

Parity with the reference's unique observation feature (reference:
infer/infer.h:63-87, fire sites infer/infer.c:755-1003,1085-1096): a
callback receives (phase, layer, data) for each of the 12 forward phases,
which the reference Pod UI uses to render live per-layer activity.

TPU-native design: taps are `jax.debug.callback` calls inserted at TRACE
time, so they exist in the compiled program only while an observer is
attached — detached runs compile a tap-free program with zero overhead.
Attaching/detaching busts the jit cache via a static `observed` flag in
the engine's step functions (engine.py); swapping the observer *function*
while attached takes effect immediately (the callback reads the module
global at fire time).

Usage:
    from nano_tpu import observe

    def my_observer(obs: observe.Observation):
        print(obs.phase.name, obs.layer, obs.data.shape)

    ctx = LLMContext.from_bin(path, observation=my_observer)
    # ... generate as usual; my_observer fires per phase ...

The C++ host engine exposes the same hook natively (cpp/nano.hpp
ObservationHook).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Any, Callable, Optional

import numpy as np
import jax


class Phase(enum.IntEnum):
    """Forward phases (mirrors reference infer/infer.h:63-87)."""
    EMBEDDING = 0
    ATTN_NORM = 1
    QKV = 2
    ROPE = 3
    ATTENTION = 4
    ATTN_OUT = 5
    FFN_NORM = 6
    FFN = 7
    RESIDUAL = 8
    FINAL_NORM = 9
    LOGITS = 10
    SAMPLE = 11


@dataclass
class Observation:
    phase: Phase
    layer: int          # -1 outside the layer stack
    data: np.ndarray    # activation snapshot (host copy)


_OBSERVER: Optional[Callable[[Observation], None]] = None


def set_observer(fn: Optional[Callable[[Observation], None]]) -> None:
    global _OBSERVER
    _OBSERVER = fn


def active() -> bool:
    return _OBSERVER is not None


def _fire(phase_value: int, layer, data) -> None:
    obs = _OBSERVER
    if obs is not None:
        obs(Observation(phase=Phase(int(phase_value)),
                        layer=int(np.asarray(layer)),
                        data=np.asarray(data)))


_warned_unsupported = False


def _callbacks_supported() -> bool:
    """Host callbacks need PJRT send/recv support.  CPU and
    directly-attached TPUs have it; the axon remote-tunnel backend does
    not (UNIMPLEMENTED at compile time).  The tunnel registers itself as
    plain "tpu", so sniff its platform_version string."""
    try:
        client = getattr(jax.devices()[0], "client", None)
        version = getattr(client, "platform_version", "") or ""
        return "axon" not in version.lower()
    except Exception:
        return True


def tap(phase: Phase, layer: Any, x: Any) -> None:
    """Insert a tap if an observer is attached at trace time.

    `layer` may be a traced int (the lax.scan layer index); `x` is the
    activation to snapshot.  No-op (and no compiled artifact) when no
    observer is attached.
    """
    if _OBSERVER is None:
        return
    if not _callbacks_supported():
        global _warned_unsupported
        if not _warned_unsupported:
            _warned_unsupported = True
            import warnings
            warnings.warn(
                "observation hook disabled: this backend (remote-tunneled "
                "TPU) lacks host-callback support; run on CPU or a "
                "directly-attached TPU to observe")
        return
    jax.debug.callback(_fire, int(phase), layer, x)


def top_candidates(logits: np.ndarray, k: int = 6):
    """Helper for observers: (ids, probs) of the k most likely tokens
    (the reference UI renders top-6, infer/ui_app.c:798-855)."""
    logits = np.asarray(logits, np.float32).reshape(-1)
    ids = np.argsort(-logits)[:k]
    z = logits - logits.max()
    p = np.exp(z) / np.exp(z).sum()
    return ids, p[ids]
