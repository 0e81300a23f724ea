#!/usr/bin/env python
"""Synthetic-problem harness: generate data, train, measure accuracy.

Mirrors the reference closed loop (reference: problem.py:336-400): four toy
tasks prove the full pipeline end to end and print exact-match accuracy.

    python problem.py sort          # non-causal seq2seq digit sort
    python problem.py palindrome    # non-causal seq2seq reversal
    python problem.py q             # count circles in digits (causal)
    python problem.py calculator    # boolean S-expression eval (causal+mask)

Options: --steps, --batch, --seq_length, --out_dir, --seed.
"""

import argparse
import tempfile


def main():
    ap = argparse.ArgumentParser(description="Nano synthetic problems")
    ap.add_argument("task", choices=["sort", "palindrome", "q", "calculator"])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--seq_length", type=int, default=8)
    ap.add_argument("--n_train", type=int, default=50_000)
    ap.add_argument("--n_eval", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--seed", type=int, default=39)
    # model-size overrides (the reference's published calculator numbers
    # use 8-16L/512-1024E, README.md:396-406; ours: 92.6% at 8L/512E)
    ap.add_argument("--n_layer", type=int, default=None)
    ap.add_argument("--n_embd", type=int, default=None)
    ap.add_argument("--n_head", type=int, default=None)
    ap.add_argument("--n_kv_head", type=int, default=None)
    ap.add_argument("--n_hidden", type=int, default=None)
    args = ap.parse_args()

    from nano_tpu.problems import run_problem
    out_dir = args.out_dir or tempfile.mkdtemp(prefix=f"nano_{args.task}_")
    overrides = {k: getattr(args, k) for k in
                 ("n_layer", "n_embd", "n_head", "n_kv_head", "n_hidden")
                 if getattr(args, k) is not None}
    acc = run_problem(args.task, out_dir, seq_length=args.seq_length,
                      max_steps=args.steps, batch_size=args.batch,
                      n_train=args.n_train, n_eval=args.n_eval,
                      learning_rate=args.lr, seed=args.seed, **overrides)
    print(f"{args.task}: exact-match accuracy {acc*100:.1f}% "
          f"(artifacts in {out_dir})")


if __name__ == "__main__":
    main()
