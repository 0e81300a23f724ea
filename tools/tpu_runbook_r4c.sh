#!/bin/bash
# Round-4 measurement runbook, revision c — the /tmp wipe (machine
# restart) lost the round-3 56M exports, so this revision retrains the
# 56M model and re-exports before the PPL stages, and adds the
# reference-C-engine PPL oracle (build/ref_ppl, CPU — runs in the
# background OFF the TPU slot).  Stage ORDER is value-per-minute under
# a possibly short tunnel window.  Run SOLO: holds
# /tmp/r4/RUNBOOK_RUNNING while active; writes /tmp/r4/RUNBOOK_DONE.
set -u
cd /root/repo
R=/tmp/r4
mkdir -p $R
echo $$ > $R/RUNBOOK_RUNNING
trap 'rm -f $R/RUNBOOK_RUNNING' EXIT

stage() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }

stage "0 probe"
timeout 300 python -c "
import jax, numpy as np
x = jax.numpy.ones((256,256))
print('TPU ok', float(np.asarray(x @ x)[0,0]))
" > $R/probe.log 2>&1 || { echo "probe FAILED"; exit 1; }
cat $R/probe.log

stage "1 bench panel (full north-star set)"
timeout 3600 python bench.py > $R/bench1.log 2>&1
tail -1 $R/bench1.log

stage "2 q4k layout A/B (packed tree vs unpacked vs bf16)"
timeout 900 python tools/bench_q4k_e2e.py q4k > $R/q4k_packed.log 2>&1
tail -1 $R/q4k_packed.log
NANO_TPU_Q4K_LAYOUT=unpacked timeout 900 python tools/bench_q4k_e2e.py q4k > $R/q4k_unpacked.log 2>&1
tail -1 $R/q4k_unpacked.log
timeout 900 python tools/bench_q4k_e2e.py bf16 > $R/bf16.log 2>&1
tail -1 $R/bf16.log

stage "3 56M pretrain (shards + 2500 steps + exports)"
python tools/make_pt56m.py > $R/shards.log 2>&1
tail -1 $R/shards.log
timeout 2400 python train.py -m config/model_56m.json -t config/pretrain_56m.json > $R/train56m.log 2>&1
tail -3 $R/train56m.log
CK=$(ls -t ckpt/pretrain56m/*.npz 2>/dev/null | head -1)
echo "checkpoint: $CK"
if [ -n "$CK" ]; then
  timeout 900 python export.py --checkpoint "$CK" $R/m56_f32.bin > $R/export.log 2>&1
  timeout 900 python export.py --quant "$CK" $R/m56_q80.bin >> $R/export.log 2>&1
  timeout 900 python export.py --q4k "$CK" $R/m56_q4k.bin >> $R/export.log 2>&1
  tail -3 $R/export.log
fi
tail -c 40000 /root/reference/dataset/pretrain_psycho.txt > $R/eval_text.txt

stage "4 PPL deltas at 56M (our engine, TPU) + C-reference oracle (CPU, bg)"
if [ -f $R/m56_f32.bin ]; then
  # C-reference oracle runs on CPU — launch it in the background, it
  # does not occupy the TPU slot (~15 min/model on this 1-core host)
  ( for q in f32 q80 q4k; do
      echo "== ref_ppl $q =="
      timeout 5400 ./build/ref_ppl $R/m56_$q.bin < $R/eval_text.txt
    done ) > $R/ppl_ref.log 2>&1 &
  REF_PPL_PID=$!
  timeout 1800 python eval.py -m $R/m56_q80.bin -i $R/eval_text.txt --compare $R/m56_f32.bin > $R/ppl_q80.log 2>&1
  cat $R/ppl_q80.log
  timeout 1800 python eval.py -m $R/m56_q4k.bin -i $R/eval_text.txt --compare $R/m56_f32.bin > $R/ppl_q4k.log 2>&1
  cat $R/ppl_q4k.log
  # same-engine cross-check: C++ host engine PPL on the same files
  timeout 5400 python eval.py -m $R/m56_q80.bin -i $R/eval_text.txt --engine cpp > $R/ppl_cpp_q80.log 2>&1
  tail -1 $R/ppl_cpp_q80.log
fi

stage "5 spec real-text acceptance (adaptive k on trained 56M)"
if [ -f $R/m56_q80.bin ]; then
  SPEC_BENCH_MODEL=$R/m56_q80.bin SPEC_BENCH_TEXT=$R/eval_text.txt \
  timeout 1800 python tools/bench_spec_realtext.py > $R/spec_realtext.log 2>&1
  tail -5 $R/spec_realtext.log
fi

stage "6 train sweep (168M batch 64 — bf16mu/ce-chunk combos, VERDICT item 8)"
timeout 5400 python tools/bench_train.py ffn:0:bf16mu dots:0:bf16mu ffn:8192:bf16mu dots:8192:bf16mu > $R/train_sweep.log 2>&1
cat $R/train_sweep.log

stage "7 0.6B train throughput (batch 8 attempts; r3 OOMed by ~200 MB)"
for combo in ffn:8192:bf16mu full:8192:bf16mu; do
  BENCH_TRAIN_MODEL=config/model_0.6b.json BENCH_TRAIN_BATCH=8 \
  BENCH_TRAIN_STEPS=10 \
  timeout 2400 python tools/bench_train.py --one $combo >> $R/train_06b.log 2>&1
done
cat $R/train_06b.log

stage "8 bench panel (final rerun — picks up the 56M PPL stage)"
timeout 3600 python bench.py > $R/bench_final.log 2>&1
tail -1 $R/bench_final.log

stage "9 problems harness (reference scale; lowest priority)"
for task in sort palindrome q; do
  timeout 2400 python problem.py $task --steps 1000 > $R/problem_$task.log 2>&1
  tail -1 $R/problem_$task.log
done

stage "DONE"
wait
date -u +%FT%TZ > $R/RUNBOOK_DONE
