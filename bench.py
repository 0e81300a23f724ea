"""Benchmark: the north-star metrics (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Primary metric: Qwen3-0.6B-shape Q80 single-stream greedy decode tok/s on
one chip, vs the reference C engine's 8-12 tok/s on a Raspberry Pi 5
(reference doc/nano-pod.md:14; BASELINE.md) — midpoint 10 tok/s.

"extra" carries the full panel: bf16 / Q80-int8 / Q4K-int8 decode tok/s at
the 0.6B shape, p50 TTFT, continuous-batching aggregate throughput
(slots=8/32, Q80), the round-1 continuity number (Nano-168M bf16), PPL
deltas at 56M when the round's trained exports exist, and Nano-168M
training throughput.

This file is the ORCHESTRATOR and never imports jax.  Every stage runs
in its own subprocess (`python tools/bench_stages.py --stage NAME`) with
a timeout and an address-space cap, because three distinct in-process
failure modes have each killed a whole panel before:
  * JAX backend init on a non-main thread wedges the axon plugin and
    aborts the process at teardown (rc 134, "FATAL: exception not
    rethrown") — burned the round-3 driver bench;
  * one stage ballooning host RSS (observed: 130 GB -> host OOM-kill)
    — burned the round-4 runbook's first panel;
  * a tunnel wedge mid-stage hanging the panel with zero output.
With per-stage subprocesses each of those costs ONE stage's keys; the
final JSON line always prints.
"""

import json
import os
import subprocess
import sys
import time

# (stage name, timeout seconds).  Timeouts are generous per-stage caps;
# the global deadline (NANO_BENCH_DEADLINE_S) trims the tail if the
# earlier stages ran long.
STAGE_PLAN = [
    ("q80", 1200),        # primary metric first: always gets full budget
    ("bf16", 900),
    ("q4k", 900),
    ("batched", 900),
    ("spec", 700),
    ("nano168m", 900),     # 600 s was hit during a slow tunnel window
    ("ppl", 900),          # (r4d panel) — both stages normally finish
    ("train", 1000),       # in minutes; headroom over raw retries
]


def _probe_device(timeout_s: float = 180.0) -> bool:
    """One tiny dispatched program with a full readback, bounded by a
    timeout: if the TPU tunnel is wedged (observed outage: trivial
    matmuls hang forever), the bench must still emit its JSON line
    rather than hang until the driver kills it."""
    # import nano_tpu first: the axon plugin overrides JAX_PLATFORMS
    # during registration, and nano_tpu re-asserts it — without this a
    # CPU-forced smoke run probes the tunneled TPU instead (CLAUDE.md).
    code = ("import nano_tpu\n"
            "import jax, numpy as np, jax.numpy as jnp\n"
            "x = jnp.ones((128, 128), jnp.float32)\n"
            "assert float(np.asarray(x @ x)[0, 0]) == 128.0\n"
            "print('probe-ok')\n")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s, cwd=".")
        return "probe-ok" in r.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def _run_stage(name: str, timeout_s: float, extra: dict) -> None:
    """Run one stage subprocess; merge its result keys into extra.
    Any failure (timeout, OOM, compile error, teardown abort after the
    result line) costs only this stage's keys."""
    try:
        r = subprocess.run(
            [sys.executable, "tools/bench_stages.py", "--stage", name],
            capture_output=True, text=True, timeout=timeout_s, cwd=".")
    except subprocess.TimeoutExpired:
        extra[name + "_error"] = f"timeout after {timeout_s:.0f}s"
        return
    except OSError as e:
        extra[name + "_error"] = f"OSError: {e}"
        return
    rows = [ln for ln in r.stdout.splitlines()
            if ln.startswith("NANO_BENCH_RESULT ")]
    if rows:
        # a teardown abort AFTER the result line still counts as success
        try:
            extra.update(json.loads(rows[-1][len("NANO_BENCH_RESULT "):]))
            return
        except json.JSONDecodeError:
            pass
    tail = (r.stderr or r.stdout or "").strip()[-200:]
    extra[name + "_error"] = f"rc={r.returncode}: {tail}"


def main():
    primary = {
        "metric": "qwen3_0.6b_q80_decode_tok_s_batch1",
        "value": 0.0,
        "unit": "tok/s",
        "vs_baseline": 0.0,
    }
    extra: dict = {}
    t0 = time.time()
    # must print the JSON line BEFORE any outer kill: the runbook wraps
    # bench in `timeout 3600` and the driver likely similar — leave
    # probe time (180 s) + margin
    deadline_s = float(os.environ.get("NANO_BENCH_DEADLINE_S", "3100"))
    if not _probe_device():
        extra["error"] = ("device unreachable: the dispatch probe did not "
                          "complete within 180 s (tunnel outage); see "
                          "PERF.md round-3/4 status")
        print(json.dumps({**primary, "extra": extra}))
        return

    only = os.environ.get("NANO_BENCH_STAGES")       # e.g. "q80,bf16"
    plan = [(n, t) for n, t in STAGE_PLAN
            if only is None or n in only.split(",")]
    failed = []
    for name, cap in plan:
        left = deadline_s - (time.time() - t0)
        if left < 120:
            extra["deadline_note"] = (
                f"global deadline {deadline_s:.0f}s reached before "
                f"stage '{name}'; later stages skipped")
            break
        _run_stage(name, min(cap, left), extra)
        if name + "_error" in extra:
            failed.append((name, cap))
    # one retry pass for failed stages: the tunnel FLAPS (observed:
    # minutes-long wedges between healthy windows), so a stage that died
    # early may succeed later in the run — budget permitting
    for name, cap in failed:
        left = deadline_s - (time.time() - t0)
        if left < 180:
            break
        first_err = extra.pop(name + "_error")
        _run_stage(name, min(cap, left), extra)
        if name + "_error" in extra:
            extra[name + "_error"] = (
                f"attempt1: {first_err}; attempt2: "
                f"{extra[name + '_error']}")

    q80 = extra.get("qwen3_0.6b_q80_tok_s")
    if q80:
        primary["value"] = round(q80, 2)
        primary["vs_baseline"] = round(q80 / 10.0, 2)  # RPi5 midpoint
    print(json.dumps({**primary, "extra": extra}))


if __name__ == "__main__":
    main()
