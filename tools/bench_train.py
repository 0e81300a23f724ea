"""Training-throughput sweep at the Nano-168M shape (batch 64, bf16).

Measures ms/step and tokens/s for remat-policy x ce_chunk combinations
(PERF.md methodology: in-process, compile first, then N timed steps with
a loss readback forcing completion per step — the per-step log timer is
corrupted by async dispatch).

Run SOLO from /root/repo on the real TPU:
    python tools/bench_train.py                 # default sweep
    python tools/bench_train.py full:0 dots:8192 ffn:8192 dots:8192:bf16mu
(each arg is remat_policy:ce_chunk[:bf16mu]; "full" means plain
remat=True, the optional third field stores the Adam first moment in
bf16 — the optimizer-memory lever that can fit the faster policies)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_one(policy: str, ce_chunk: int, bf16mu: bool = False,
            n_steps: int = 20) -> dict:
    import os
    from nano_tpu.train.trainer import Trainer

    mc = json.load(open(os.environ.get("BENCH_TRAIN_MODEL",
                                       "config/model_168m.json")))
    tc = json.load(open("config/pretrain.json"))
    n_steps = int(os.environ.get("BENCH_TRAIN_STEPS", n_steps))
    tc.update(remat=True, remat_policy=policy, ce_chunk=ce_chunk,
              adam_mu_dtype="bfloat16" if bf16mu else None,
              save_checkpoint_to=None, log_interval=10 ** 9,
              batch_size=int(os.environ.get("BENCH_TRAIN_BATCH", 64)))
    t = Trainer(mc, tc, max_steps=n_steps + 2)
    t.init()

    B, S = tc["batch_size"], mc["block_size"]
    A = tc["gradient_accumulation_steps"]
    rng = np.random.RandomState(0)

    def batch(i):
        xs = rng.randint(0, mc["vocab_size"], (A, B, S)).astype(np.int32)
        return xs, np.roll(xs, -1, axis=-1), np.ones((A, B, S), np.float32)

    trainable, opt_state = t.params, t.opt_state
    try:
        xs, ys, ms = batch(0)
        trainable, opt_state, loss = t._train_step(
            trainable, None, opt_state, xs, ys, ms)
        float(loss)                                   # compile + settle
        t0 = time.time()
        for i in range(n_steps):
            xs, ys, ms = batch(i + 1)
            trainable, opt_state, loss = t._train_step(
                trainable, None, opt_state, xs, ys, ms)
            last = float(loss)                        # forces completion
        dt = (time.time() - t0) / n_steps
    except Exception as e:                            # OOM etc.
        return {"policy": policy, "ce_chunk": ce_chunk, "bf16mu": bf16mu,
                "error": f"{type(e).__name__}: {str(e)[:160]}"}
    toks = A * B * S / dt
    return {"policy": policy, "ce_chunk": ce_chunk, "bf16mu": bf16mu,
            "ms_step": round(dt * 1e3, 1), "tok_s": round(toks),
            "loss": round(last, 3)}


def main():
    if sys.argv[1:2] == ["--one"]:
        parts = sys.argv[2].split(":")
        rec = run_one(parts[0], int(parts[1]), bf16mu="bf16mu" in parts[2:])
        if "remote_compile" in str(rec.get("error", "")):
            # the tunnel's compile helper crashes transiently (observed
            # runbook r4c: HTTP 500 "tpu_compile_helper subprocess exit
            # code 1" on configs that compiled in earlier rounds) — one
            # retry after a pause separates crash-y from genuinely
            # uncompilable
            time.sleep(30)
            rec = run_one(parts[0], int(parts[1]),
                          bf16mu="bf16mu" in parts[2:])
            rec["retried"] = True
        print(json.dumps(rec), flush=True)
        return
    # one subprocess per combo: a fresh process per config releases HBM
    # and compile caches between variants (a single process accumulates
    # both and the later combos OOM spuriously)
    import subprocess
    combos = sys.argv[1:] or ["full:0", "full:8192", "ffn:8192",
                              "heads:8192", "dots:8192", "dots:0",
                              "dots:8192:bf16mu", "ffn:8192:bf16mu"]
    for c in combos:
        r = subprocess.run([sys.executable, __file__, "--one", c],
                           capture_output=True, text=True, cwd=".")
        out = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(out[-1] if out else json.dumps(
            {"combo": c, "error": (r.stderr or r.stdout)[-300:]}),
            flush=True)


if __name__ == "__main__":
    main()
