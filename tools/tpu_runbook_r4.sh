#!/bin/bash
# Round-4 TPU measurement sequence — run SOLO (one TPU job at a time).
# Results land in /tmp/r4/*.log; safe to re-run (each stage overwrites).
#
# Stage ORDER is value-per-minute under a possibly short window (the
# tunnel flaps): the full bench panel runs FIRST so a partial run still
# captures the round's headline numbers, then the open A/Bs (Q4K layout,
# train-sweep at the un-chunked combos the trimmed r3 runbook skipped),
# then the slow PPL / spec-acceptance stages.
set -u
cd /root/repo
mkdir -p /tmp/r4
R=/tmp/r4

stage() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }

stage "0 probe"
timeout 300 python -c "
import jax, numpy as np
x = jax.numpy.ones((256,256))
print('TPU ok', float(np.asarray(x @ x)[0,0]))
" > $R/probe.log 2>&1 || { echo "probe FAILED"; exit 1; }
cat $R/probe.log

stage "1 bench panel (full north-star set)"
timeout 5400 python bench.py > $R/bench1.log 2>&1
tail -1 $R/bench1.log

stage "2 q4k layout A/B (packed tree vs unpacked vs bf16)"
timeout 1800 python tools/bench_q4k_e2e.py q4k > $R/q4k_packed.log 2>&1
tail -1 $R/q4k_packed.log
NANO_TPU_Q4K_LAYOUT=unpacked timeout 1800 python tools/bench_q4k_e2e.py q4k > $R/q4k_unpacked.log 2>&1
tail -1 $R/q4k_unpacked.log
timeout 1800 python tools/bench_q4k_e2e.py bf16 > $R/bf16.log 2>&1
tail -1 $R/bf16.log

stage "3 train sweep (168M batch 64 — the un-chunked combos r3 skipped)"
timeout 10800 python tools/bench_train.py full:0 ffn:0 ffn:0:bf16mu heads:0 dots:0:bf16mu ffn:8192:bf16mu > $R/train_sweep.log 2>&1
cat $R/train_sweep.log

stage "4 Q4K PPL delta at 56M (retry; r3 stage died silently)"
if [ -f /tmp/r3/m56_q4k.bin ]; then
  timeout 3600 python eval.py -m /tmp/r3/m56_q4k.bin -i /tmp/r3/eval_text.txt --compare /tmp/r3/m56_f32.bin > $R/ppl_q4k.log 2>&1
  cat $R/ppl_q4k.log
fi

stage "5 spec real-text acceptance (adaptive k; prefix-agree check)"
if [ -f tools/bench_spec_realtext.py ]; then
  timeout 1800 python tools/bench_spec_realtext.py > $R/spec_realtext.log 2>&1
  cat $R/spec_realtext.log
fi

stage "6 bench panel (final rerun, fresh process)"
timeout 5400 python bench.py > $R/bench_final.log 2>&1
tail -1 $R/bench_final.log

stage "DONE"
