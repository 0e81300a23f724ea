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
    # --- summary-mode fields (fallback path, see tap()) ---
    summary: bool = False
    mean_abs: Optional[float] = None      # mean |activation|
    top_ids: Optional[np.ndarray] = None  # LOGITS/SAMPLE: top-6 token ids
    top_vals: Optional[np.ndarray] = None  # matching logits


_OBSERVER: Optional[Callable[[Observation], None]] = None


def set_observer(fn: Optional[Callable[[Observation], None]]) -> None:
    global _OBSERVER
    _OBSERVER = fn


def active() -> bool:
    return _OBSERVER is not None


def trace_token():
    """Static jit-cache key for the engine's `observed` flag: False /
    "callback" / "fallback".  The two observing modes produce different
    programs (debug.callback taps vs summary-row outputs), so they must
    not share a cache entry."""
    if _OBSERVER is None:
        return False
    return "fallback" if fallback_active() else "callback"


def _fire(phase_value: int, layer, data) -> None:
    obs = _OBSERVER
    if obs is not None:
        obs(Observation(phase=Phase(int(phase_value)),
                        layer=int(np.asarray(layer)),
                        data=np.asarray(data)))


_warned_unsupported = False

# Fallback ("summary") mode: backends without host-callback support (the
# axon remote tunnel) materialize the taps as EXTRA JITTED OUTPUTS — one
# bounded 15-float row per tap: [phase, layer, mean|x|, top6 ids, top6
# logits] — which the engine reads back and replays to the observer.
# NANO_TPU_OBSERVE=fallback forces it (used by the CPU tests).
import os as _os
_FORCE_FALLBACK = _os.environ.get("NANO_TPU_OBSERVE", "") == "fallback"
ROW = 15
_CAPTURE: Optional[list] = None     # traced row matrices, per trace scope


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


def fallback_active() -> bool:
    """True when taps must ride as extra outputs instead of callbacks."""
    return _OBSERVER is not None and (_FORCE_FALLBACK
                                      or not _callbacks_supported())


def start_capture() -> None:
    """Open a capture scope (call at the top of a jitted fn's trace)."""
    global _CAPTURE
    if fallback_active():
        _CAPTURE = []


def collect_rows():
    """Pop the rows captured in the current trace scope -> (N, 15) f32.

    Called at the end of a traced function (or a lax.scan body — scan
    bodies must route their rows out through the scan's ys, gpt.py)."""
    import jax.numpy as jnp
    global _CAPTURE
    if _CAPTURE is None:
        return jnp.zeros((0, ROW), jnp.float32)
    rows, _CAPTURE = _CAPTURE, []
    if not rows:
        return jnp.zeros((0, ROW), jnp.float32)
    return jnp.concatenate(rows, axis=0)


def end_capture():
    """Close the scope and return everything captured -> (N, 15) f32."""
    global _CAPTURE
    out = collect_rows()
    _CAPTURE = None
    return out


def push_rows(rows) -> None:
    """Re-inject rows that crossed a scan boundary ((L, N, 15) ys)."""
    if _CAPTURE is not None:
        _CAPTURE.append(rows.reshape(-1, ROW))


def _summary_row(phase: Phase, layer, x):
    import jax.numpy as jnp
    xa = jnp.asarray(x).astype(jnp.float32)
    xf = xa.reshape(-1)
    mean_abs = jnp.mean(jnp.abs(xf))
    if phase == Phase.LOGITS and xa.shape[-1] >= 6:
        # top-6 over the LAST position's vocab row (never the flattened
        # (positions x vocab) tensor — prefill logits are (1, pad, V))
        vals, ids = jax.lax.top_k(xa.reshape(-1, xa.shape[-1])[-1], 6)
    else:
        vals = jnp.full((6,), jnp.nan, jnp.float32)
        ids = jnp.full((6,), -1.0, jnp.float32)
    return jnp.concatenate([
        jnp.full((1,), float(int(phase)), jnp.float32),
        jnp.asarray(layer, jnp.float32).reshape(1),
        mean_abs.reshape(1),
        ids.astype(jnp.float32),
        vals.astype(jnp.float32)])[None, :]


def deliver(rows: np.ndarray) -> None:
    """Replay summary rows read back from the device to the observer."""
    obs = _OBSERVER
    if obs is None:
        return
    rows = np.asarray(rows, np.float32).reshape(-1, ROW)
    for r in rows:
        phase = Phase(int(r[0]))
        has_top = r[3] >= 0
        obs(Observation(
            phase=phase, layer=int(r[1]), data=np.asarray([r[2]]),
            summary=True, mean_abs=float(r[2]),
            top_ids=r[3:9].astype(np.int64) if has_top else None,
            top_vals=r[9:15].copy() if has_top else None))


def tap(phase: Phase, layer: Any, x: Any) -> None:
    """Insert a tap if an observer is attached at trace time.

    `layer` may be a traced int (the lax.scan layer index); `x` is the
    activation to snapshot.  No-op (and no compiled artifact) when no
    observer is attached.  On backends without host-callback support the
    tap records a bounded summary row instead (see deliver()).
    """
    if _OBSERVER is None:
        return
    if fallback_active():
        if _CAPTURE is not None:
            _CAPTURE.append(_summary_row(phase, layer, x))
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


# ---------------------------------------------------------------------
# XLA-level profiling (the other half of SURVEY §5.1's TPU equivalent:
# per-phase taps above for parity, compiler/runtime traces below for
# actual performance work — the reference's wall timers can't see inside
# a fused program, jax.profiler can)
# ---------------------------------------------------------------------

from contextlib import contextmanager as _contextmanager


@_contextmanager
def profile_trace(logdir: str = "/tmp/nano_tpu_trace",
                  annotate: str = ""):
    """Capture a jax.profiler trace of everything dispatched inside the
    block.  View with TensorBoard (`tensorboard --logdir …`) or upload
    the .trace.json.gz to Perfetto.  `annotate` wraps the block in a
    named TraceAnnotation so it is findable in the timeline.

        with observe.profile_trace("/tmp/tr"):
            engine.generate_sync(ctx, prompt, 32)

    CLI: `python infer.py … --trace /tmp/tr`.
    """
    jax.profiler.start_trace(logdir)
    try:
        if annotate:
            with jax.profiler.TraceAnnotation(annotate):
                yield logdir
        else:
            yield logdir
    finally:
        jax.profiler.stop_trace()
