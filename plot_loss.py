#!/usr/bin/env python
"""Loss-curve plotting from training logs.

Mirrors the reference live plotter (reference: plot_loss.py): parses
`Loss:` fields from train_*.log files.  Headless-friendly: default writes
a PNG; `--live` opens the reference-style auto-refreshing window.

    python plot_loss.py train_20260816_120000.log [-o loss.png] [--live]
"""

import argparse
import re
import sys

LOSS_RE = re.compile(r"Loss:\s*([0-9.]+(?:e[+-]?\d+)?)"
                     r"(?:\s*\|\s*ValLoss:\s*([0-9.]+(?:e[+-]?\d+)?))?",
                     re.IGNORECASE)
STEP_RE = re.compile(r"Step:\s*(\d+)", re.IGNORECASE)


def parse_log(path):
    steps, losses = [], []
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            m = LOSS_RE.search(line)
            if not m:
                continue
            s = STEP_RE.search(line)
            steps.append(int(s.group(1)) if s else len(steps))
            losses.append(float(m.group(1)))
    return steps, losses


def main():
    ap = argparse.ArgumentParser(description="plot training loss")
    ap.add_argument("logs", nargs="+")
    ap.add_argument("-o", "--output", default="loss.png")
    ap.add_argument("--live", action="store_true",
                    help="auto-refreshing window (100 ms, like the "
                         "reference plotter)")
    args = ap.parse_args()

    if not args.live:
        import matplotlib
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if args.live:
        fig, axis = plt.subplots()

        def refresh(_frame):
            axis.clear()
            for path in args.logs:
                steps, losses = parse_log(path)
                axis.plot(steps, losses, label=path)
            axis.set_xlabel("step")
            axis.set_ylabel("loss")
            axis.legend()

        from matplotlib.animation import FuncAnimation
        _anim = FuncAnimation(fig, refresh, interval=100)
        plt.show()
        return

    plt.figure(figsize=(8, 5))
    any_points = False
    for path in args.logs:
        steps, losses = parse_log(path)
        if not steps:
            print(f"no Loss: lines in {path}", file=sys.stderr)
            continue
        any_points = True
        plt.plot(steps, losses, label=path)
    if not any_points:
        sys.exit(1)
    plt.xlabel("step")
    plt.ylabel("loss")
    plt.legend()
    plt.tight_layout()
    plt.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
