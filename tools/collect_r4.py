#!/usr/bin/env python
"""Summarize the round-4 runbook logs (/tmp/r4/*.log) into one terse
report: the final bench JSON, the Q4K layout A/B, the train sweep rows,
PPL deltas (ours + the C-reference oracle), spec acceptance, and the
problems-harness accuracies.  Read-only; safe to run any time."""
import json
import os
import re
import sys

R = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4"


def tail_json(path):
    try:
        rows = [ln for ln in open(path).read().splitlines()
                if ln.startswith("{")]
        return json.loads(rows[-1]) if rows else None
    except (OSError, json.JSONDecodeError):
        return None


def grep(path, pat, n=5):
    try:
        return [ln for ln in open(path, errors="replace").read().splitlines()
                if re.search(pat, ln)][-n:]
    except OSError:
        return []


def show(title, lines):
    if lines:
        print(f"--- {title}")
        for ln in lines if isinstance(lines, list) else [lines]:
            print("   ", ln if isinstance(ln, str) else
                  json.dumps(ln, sort_keys=True))


for tag in ("bench1", "bench_final", "bench2"):
    show(tag, tail_json(f"{R}/{tag}.log"))
show("q4k packed", grep(f"{R}/q4k_packed.log", r"tok/s|tok_s"))
show("q4k unpacked", grep(f"{R}/q4k_unpacked.log", r"tok/s|tok_s"))
show("bf16", grep(f"{R}/bf16.log", r"tok/s|tok_s"))
show("56M train", grep(f"{R}/train56m.log", r"step 2[45]00|tokens/s", 3))
show("PPL q80 (ours)", grep(f"{R}/ppl_q80.log", r"PPL|delta"))
show("PPL q4k (ours)", grep(f"{R}/ppl_q4k.log", r"PPL|delta"))
show("PPL cpp q80", grep(f"{R}/ppl_cpp_q80.log", r"PPL"))
show("PPL C-reference oracle", grep(f"{R}/ppl_ref.log", r"==|PPL", 8))
show("spec real-text", grep(f"{R}/spec_realtext.log", r".", 8))
show("train sweep", grep(f"{R}/train_sweep.log", r"^\{", 12))
show("0.6B train", grep(f"{R}/train_06b.log", r"^\{", 6))
for t in ("sort", "palindrome", "q"):
    show(f"problem {t}", grep(f"{R}/problem_{t}.log", r"accuracy"))
done = os.path.exists(f"{R}/RUNBOOK_DONE")
print("--- runbook:", "DONE" if done else "running")

# --- revision-d stages (tools/tpu_runbook_r4d.sh) ---
show("bench_r4d", tail_json(f"{R}/bench_r4d.log"))
show("spec real-text (k=0 park)", grep(f"{R}/spec_realtext_d.log",
                                       r"tok/s|k_hist|agree", 8))
show("train sweep d (full:0 baseline)", grep(f"{R}/train_sweep_d.log",
                                             r"^\{", 8))
show("0.6B train retry", grep(f"{R}/train_06b_d.log", r"^\{|Error", 4))
show("verify drive", grep(f"{R}/verify_d.log", r"PASS|FAIL|ok|backend", 6))
show("C++ spec real-text", grep(f"{R}/spec_cpp_d.log", r"tok/s", 4))
