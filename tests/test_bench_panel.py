"""Flow-check the driver bench panel at tiny shapes on CPU.

The panel is normally only executed on the real TPU at round end, so a
signature drift in any helper it calls (e.g. spec_decode_loop growing
seen/rep_penalty args) would otherwise first surface as a silently
missing metric.  Two layers:

  * the stage functions (tools/bench_stages.py) run end-to-end in-process
    at tiny shapes and must return their metric keys;
  * the orchestrator (bench.py) is exercised with stubbed stage
    subprocesses — it must merge stage keys, derive the primary metric,
    survive a failing stage, and always print one JSON line.
"""

import importlib.util

import pytest
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(name,
                                                  os.path.join(REPO, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.soak   # long e2e; fast tier covers the feature (pytest.ini)
def test_stage_functions_flow(monkeypatch):
    bs = _load("bench_stages_under_test", "tools/bench_stages.py")

    tiny = dict(block_size=64, vocab_size=512, n_layer=2, n_embd=256,
                n_head=4, n_kv_head=2, n_hidden=256, head_dim=64,
                use_qk_norm=True, rope_style="half", rope_theta=1e6,
                norm_eps=1e-6, tie_embeddings=True)
    monkeypatch.setattr(bs, "QWEN3_06B", tiny)
    monkeypatch.setattr(bs, "NANO_168M",
                        dict(block_size=64, vocab_size=512, n_layer=2,
                             n_embd=256, n_head=4, n_kv_head=2,
                             n_hidden=256))
    # shrink every stage's step counts; keep the real call signatures
    d = bs.decode_tok_s
    monkeypatch.setattr(bs, "decode_tok_s",
                        lambda p, c, n_steps=None, **kw:
                        d(p, c, n_steps=8, **kw))
    b = bs.batched_aggregate
    monkeypatch.setattr(bs, "batched_aggregate",
                        lambda p, c, s, **kw:
                        b(p, c, s, n_steps=4, reps=1, start_pos=16))
    # tiny runtime branches: spec stage token counts, ppl text slice and
    # the canary's matmul size (N=8192 on CPU is minutes) — the stage
    # CONFIG dicts are already monkeypatched above, and the canary /
    # train subprocesses re-read this env on their own import
    monkeypatch.setenv("NANO_BENCH_TINY", "1")
    # ppl: point at roots that do not exist -> silent empty result (the
    # real roots may hold a 56M model whose CPU eval is minutes)
    monkeypatch.setattr(bs, "PPL_ROOTS", ("/nonexistent-bench-test",))

    # train stage: tiny model + 2 steps via the env knobs its subprocess
    # reads (it inherits JAX_PLATFORMS=cpu from this process)
    import tempfile
    mdir = tempfile.mkdtemp()
    mpath = os.path.join(mdir, "m.json")
    with open(mpath, "w") as f:
        json.dump(dict(block_size=64, vocab_size=512, n_layer=2,
                       n_embd=64, n_head=4, n_kv_head=2, n_hidden=128),
                  f)
    monkeypatch.setenv("BENCH_TRAIN_MODEL", mpath)
    monkeypatch.setenv("BENCH_TRAIN_BATCH", "2")
    monkeypatch.setenv("BENCH_TRAIN_STEPS", "2")

    extra = {}
    for name, fn in bs.STAGES.items():
        extra.update(fn())

    for key in ("qwen3_0.6b_bf16_tok_s", "qwen3_0.6b_q80_tok_s",
                "qwen3_0.6b_q80_kv8_tok_s", "q80_batch8_agg_tok_s",
                "q80_batch32_agg_tok_s", "toy_q80_spec_tok_s",
                "spec_tokens_per_round_trained", "toy_q80_spec_free_ratio",
                "qwen3_0.6b_q4k_tok_s", "nano168m_bf16_tok_s",
                "ppl_f32_toy", "ppl_delta_q80_toy", "ppl_delta_q4k_toy",
                "nano168m_train_tok_s", "chip_bf16_tflops_canary",
                "dispatch_ms_canary"):
        assert key in extra, key
    assert extra["qwen3_0.6b_q80_tok_s"] > 0
    # the trained fixture makes speculation MEASURABLE: near-perfect
    # draft acceptance on the memorized chorus (random weights could
    # only ever report 1.0 — round-4 verdict weak-spot #6)
    assert extra["spec_tokens_per_round_trained"] > 4.0


def test_orchestrator_merges_and_survives_stage_failure(monkeypatch, capsys):
    bench = _load("bench_under_test", "bench.py")
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)

    def fake_stage(name, timeout_s, extra):
        if name == "q80":
            extra["qwen3_0.6b_q80_tok_s"] = 500.0
        elif name == "bf16":
            extra["bf16_error"] = "rc=-9: simulated OOM kill"
        else:
            extra[name + "_done"] = True
    monkeypatch.setattr(bench, "_run_stage", fake_stage)

    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "qwen3_0.6b_q80_decode_tok_s_batch1"
    assert rec["value"] == 500.0            # primary derived from q80 stage
    assert rec["vs_baseline"] == 50.0
    # a persistently failing stage is retried once and both attempts
    # are recorded (tunnel-flap insurance)
    assert rec["extra"]["bf16_error"] == (
        "attempt1: rc=-9: simulated OOM kill; "
        "attempt2: rc=-9: simulated OOM kill")
    assert rec["extra"]["q4k_done"] is True  # later stages still ran


def test_orchestrator_retry_recovers_transient_failure(monkeypatch,
                                                       capsys):
    bench = _load("bench_under_test_retry", "bench.py")
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)
    calls = {"bf16": 0}

    def fake_stage(name, timeout_s, extra):
        if name == "bf16":
            calls["bf16"] += 1
            if calls["bf16"] == 1:
                extra["bf16_error"] = "timeout after 60s"
            else:
                extra["qwen3_0.6b_bf16_tok_s"] = 123.0
        elif name == "q80":
            extra["qwen3_0.6b_q80_tok_s"] = 500.0
    monkeypatch.setattr(bench, "_run_stage", fake_stage)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert calls["bf16"] == 2
    assert "bf16_error" not in rec["extra"]         # retry cleared it
    assert rec["extra"]["qwen3_0.6b_bf16_tok_s"] == 123.0


def test_orchestrator_outage_guard_waits_and_reruns(monkeypatch, capsys):
    """A stage timeout against a DEAD tunnel must not feed the following
    stages to the outage (the first full-panel run burned 1981 s of its
    deadline on three consecutive timeouts): after a timeout the
    orchestrator probes, waits for the heal, and re-runs the stage."""
    bench = _load("bench_under_test_outage", "bench.py")
    probes = {"n": 0}

    def fake_probe(timeout_s=120.0):
        probes["n"] += 1
        return probes["n"] not in (2, 3)   # startup ok; dead after the
        #                                    timeout; healed on probe 4

    runs = {"q80": 0}

    def fake_stage(name, timeout_s, extra):
        if name == "q80":
            runs["q80"] += 1
            if runs["q80"] == 1:
                extra["q80_error"] = "timeout after 1s"
            else:
                extra["qwen3_0.6b_q80_tok_s"] = 600.0
        else:
            extra[name + "_done"] = True
    monkeypatch.setattr(bench, "_probe_device", fake_probe)
    monkeypatch.setattr(bench, "_run_stage", fake_stage)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert runs["q80"] == 2                       # re-ran after the heal
    assert rec["value"] == 600.0
    assert "q80_error" not in rec["extra"]
    assert "healed" in rec["extra"]["outage_note"]
    assert rec["extra"]["bf16_done"] is True      # panel continued


def test_orchestrator_emits_error_line_when_device_unreachable(monkeypatch,
                                                               capsys):
    bench = _load("bench_under_test2", "bench.py")
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: False)
    # a permanently-dead device now waits for a heal inside the deadline
    # budget; shrink the budget below the wait threshold and neuter
    # sleep so the test observes the final error line promptly
    monkeypatch.setenv("NANO_BENCH_DEADLINE_S", "300")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 0.0
    assert "device unreachable" in rec["extra"]["error"]


def _bench_env(tmp_path, stages):
    env = dict(os.environ)
    env.update({
        "NANO_BENCH_SKIP_PROBE": "1",
        "NANO_BENCH_STAGE_CMD":
            f"{sys.executable} {os.path.join(REPO, 'tests', 'fake_bench_stage.py')}",
        "NANO_BENCH_STAGES": stages,
        "NANO_BENCH_LOG_DIR": str(tmp_path),
    })
    return env


def test_orchestrator_survives_sigkill_mid_panel(tmp_path):
    """The round-4 failure: the driver's outer timeout killed bench.py
    before it printed anything.  The cumulative protocol must leave the
    completed stages' keys on stdout no matter when the kill lands:
    SIGKILL the orchestrator while a stage is wedged and assert the last
    already-emitted line parses and carries the fast stage's key."""
    import signal
    import subprocess
    import time as _time
    env = _bench_env(tmp_path, "q80,bf16")
    env["NANO_BENCH_STAGE_TIMEOUT_S"] = "300"   # bf16 wedge outlives us
    p = subprocess.Popen([sys.executable, os.path.join(REPO, "bench.py")],
                         stdout=subprocess.PIPE, text=True, cwd=REPO,
                         env=env)
    lines = []
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline:
            line = p.stdout.readline()
            if not line:
                break
            lines.append(line)
            rec = json.loads(line)
            if "qwen3_0.6b_q80_tok_s" in rec.get("extra", {}):
                break                           # q80 done, bf16 wedged
        else:
            raise AssertionError("q80 line never appeared")
    finally:
        p.send_signal(signal.SIGKILL)
        p.wait(timeout=30)
        # the wedged fake bf16 stage is in its own process group and
        # cannot be killpg'd once bench is dead; it self-expires (the
        # fake stage sleeps a bounded 120 s)
    rec = json.loads(lines[-1])
    assert rec["metric"] == "qwen3_0.6b_q80_decode_tok_s_batch1"
    assert rec["value"] == 555.0
    assert rec["extra"]["qwen3_0.6b_q80_tok_s"] == 555.0


def test_orchestrator_not_hung_by_orphaned_grandchild(tmp_path):
    """A timed-out stage whose grandchild survives must cost ONE stage's
    keys and a prompt return — never an indefinite pipe-read hang (the
    likely round-4 root cause).  Stage timeout 3 s, orchestrator must
    finish well under a minute with the timeout recorded."""
    import subprocess
    import time as _time
    env = _bench_env(tmp_path, "q80,q4k")
    env["NANO_BENCH_STAGE_TIMEOUT_S"] = "3"
    t0 = _time.time()
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, cwd=REPO,
                       timeout=120, env=env)
    elapsed = _time.time() - t0
    assert elapsed < 60, f"orchestrator took {elapsed:.0f}s"
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["extra"]["qwen3_0.6b_q80_tok_s"] == 555.0
    assert "timeout" in rec["extra"]["q4k_error"]


def test_stage_subprocess_protocol(monkeypatch):
    """One real stage subprocess round-trip: bench._run_stage must parse
    the NANO_BENCH_RESULT line from a ppl stage pointed at an empty 56M
    root — which still carries the committed-fixture keys (the ppl
    stage became self-sufficient in round 5: no /tmp dependence)."""
    bench = _load("bench_under_test3", "bench.py")
    monkeypatch.setenv("NANO_BENCH_PPL_ROOTS", "/nonexistent-bench-test")
    monkeypatch.setenv("NANO_BENCH_TINY", "1")
    extra = {}
    bench._run_stage("ppl", 600, extra)
    assert "ppl_f32_toy" in extra and "ppl_delta_q4k_toy" in extra, extra
    assert "ppl_f32_56m" not in extra
    assert not any(k.endswith("_error") for k in extra), extra
