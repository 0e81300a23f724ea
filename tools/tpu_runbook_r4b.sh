#!/bin/bash
# Round-4 runbook EXTENSION — waits for the main runbook
# (tools/tpu_runbook_r4.sh) to finish, then runs the lower-priority
# stages SOLO: the remaining problems-harness accuracies at reference
# scale and the 0.6B training-throughput attempts with the new memory
# levers (ce_chunk + bf16 Adam mu).  Logs to /tmp/r4/*.log; writes
# /tmp/r4/RUNBOOK2_DONE when finished.
set -u
cd /root/repo
R=/tmp/r4
mkdir -p $R

stage() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }

# wait for the main runbook (up to 8 h), then take the solo slot
while [ -f $R/RUNBOOK_RUNNING ] || [ ! -f $R/RUNBOOK_DONE ]; do
  sleep 120
done
echo $$ > $R/RUNBOOK_RUNNING
trap 'rm -f $R/RUNBOOK_RUNNING' EXIT

stage "7 problems harness (sort / palindrome / q at reference scale)"
for task in sort palindrome q; do
  timeout 3600 python problem.py $task > $R/problem_$task.log 2>&1
  tail -1 $R/problem_$task.log
done

stage "8 0.6B train throughput (batch 8 attempts; r3 OOMed by ~200 MB)"
for combo in ffn:8192:bf16mu full:8192:bf16mu; do
  BENCH_TRAIN_MODEL=config/model_0.6b.json BENCH_TRAIN_BATCH=8 \
  BENCH_TRAIN_STEPS=10 \
  timeout 3600 python tools/bench_train.py --one $combo >> $R/train_06b.log 2>&1
done
cat $R/train_06b.log

stage "9 bench panel (post-extension rerun)"
timeout 5400 python bench.py > $R/bench2.log 2>&1
tail -1 $R/bench2.log

stage "DONE"
date -u +%FT%TZ > $R/RUNBOOK2_DONE
