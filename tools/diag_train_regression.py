"""Diagnose the 168M train-step regression (r2: 942 ms/step full remat;
r4d: 1555 ms same config).

Experiments (each its own subprocess, one in-process measurement each):
  head        — HEAD as-is (control; expect ~1555 ms)
  noname      — HEAD with gpt.checkpoint_name patched to identity
                (H1: the remat-policy name markers obstruct XLA fusion
                under plain full remat)
  r2          — the round-2 tree (git worktree) for the true baseline
                (expect ~942 ms; PYTHONPATH swap)

Run SOLO on the real TPU from /root/repo:
    python tools/diag_train_regression.py [head|noname|r2 ...]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# NANO_DIAG_TREE overrides which tree provides nano_tpu (the r2 worktree
# baseline); it must come BEFORE the repo root on sys.path
_tree = os.environ.get("NANO_DIAG_TREE")
if _tree:
    sys.path.insert(0, _tree)
sys.path.insert(1 if _tree else 0, REPO)

R2_COMMIT = "108e5d9"
R2_TREE = "/tmp/r2tree"


def measure(n_steps=12):
    import numpy as np
    from nano_tpu.train.trainer import Trainer

    mc = json.load(open("config/model_168m.json"))
    tc = json.load(open("config/pretrain.json"))
    tc.update(remat=True, save_checkpoint_to=None, log_interval=10 ** 9,
              batch_size=64)
    t = Trainer(mc, tc, max_steps=n_steps + 2)
    t.init()
    B, S = tc["batch_size"], mc["block_size"]
    A = tc["gradient_accumulation_steps"]
    rng = np.random.RandomState(0)

    def batch():
        xs = rng.randint(0, mc["vocab_size"], (A, B, S)).astype(np.int32)
        return xs, np.roll(xs, -1, axis=-1), np.ones((A, B, S), np.float32)

    trainable, opt_state = t.params, t.opt_state
    xs, ys, ms = batch()
    trainable, opt_state, loss = t._train_step(trainable, None, opt_state,
                                               xs, ys, ms)
    float(loss)
    t0 = time.time()
    for _ in range(n_steps):
        xs, ys, ms = batch()
        trainable, opt_state, loss = t._train_step(trainable, None,
                                                   opt_state, xs, ys, ms)
        float(loss)
    dt = (time.time() - t0) / n_steps
    return {"ms_step": round(dt * 1e3, 1),
            "tok_s": round(A * B * S / dt)}


def main():
    if sys.argv[1:2] == ["--child"]:
        mode = sys.argv[2]
        if mode == "noname":
            from nano_tpu.models import gpt
            gpt.checkpoint_name = lambda x, name: x
        print("RESULT " + json.dumps({**measure(), "mode": mode}),
              flush=True)
        return

    modes = sys.argv[1:] or ["head", "noname", "r2"]
    for mode in modes:
        env = dict(os.environ)
        if mode == "r2":
            if not os.path.exists(R2_TREE):
                subprocess.run(["git", "worktree", "add", "--detach",
                                R2_TREE, R2_COMMIT], cwd=REPO, check=True)
            env["NANO_DIAG_TREE"] = R2_TREE
        r = subprocess.run(
            [sys.executable, __file__, "--child",
             "head" if mode == "r2" else mode],
            capture_output=True, text=True, env=env, timeout=1200,
            cwd=REPO)
        rows = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if rows:
            rec = json.loads(rows[-1][7:])
            rec["mode"] = mode
            print(json.dumps(rec), flush=True)
        else:
            print(json.dumps({"mode": mode, "error":
                              (r.stderr or r.stdout)[-300:]}), flush=True)


if __name__ == "__main__":
    main()
