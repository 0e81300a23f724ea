#!/bin/bash
# Round-4 measurement runbook, revision d — post-runbook-c follow-ups:
#   * the FIXED driver bench (per-stage subprocess orchestration — the
#     revision-c panels died to a _decode_segments infinite loop / host
#     OOM and an off-main-thread backend init);
#   * spec real-text re-measure with the k=0 park (session adaptive must
#     now track plain instead of losing 40%);
#   * like-for-like train sweep incl. the r2 baseline row full:0
#     (revision c only ran ffn/dots+bf16mu, so the 25.5k tok/s reading
#     has no full-remat comparator from the same window);
#   * 0.6B batch-8 train retry with bf16 Adam-mu (r3 OOMed by ~200 MB;
#     revision c hit remote-compile HTTP 500s — log the full error);
#   * verify-skill drive (library surface + C oracle on the real TPU).
# STAGES ARE MARKER-GUARDED (done_d_*): the tunnel flaps, so the watcher
# relaunches this script on re-heal and completed stages are skipped.
# Run SOLO: holds /tmp/r4/RUNBOOK_RUNNING; writes /tmp/r4/RUNBOOK_D_DONE.
set -u
cd /root/repo
R=/tmp/r4
mkdir -p $R
echo $$ > $R/RUNBOOK_RUNNING
trap 'rm -f $R/RUNBOOK_RUNNING' EXIT

stage() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }
skip()  { [ -f $R/done_d_$1 ]; }

stage "0 probe"
timeout 300 python -c "
import jax, numpy as np
x = jax.numpy.ones((256,256))
print('TPU ok', float(np.asarray(x @ x)[0,0]))
" > $R/probe_d.log 2>&1 || { echo "probe FAILED"; exit 1; }
cat $R/probe_d.log

if ! skip 1; then
stage "1 bench panel (fixed orchestrator, full north-star set)"
timeout 5000 python bench.py > $R/bench_r4d.log 2>&1
tail -1 $R/bench_r4d.log
# only mark done if the panel produced a real primary value
if grep -q '"value": 0.0' $R/bench_r4d.log; then
  echo "panel incomplete — will rerun on next launch"
else
  touch $R/done_d_1
fi
fi

if ! skip 2; then
stage "2 spec real-text (k=0 park fix: session adaptive vs plain)"
timeout 1800 python tools/bench_spec_realtext.py > $R/spec_realtext_d.log 2>&1 \
  && touch $R/done_d_2
grep -E "tok/s|k_hist|agree" $R/spec_realtext_d.log
fi

if ! skip 3; then
stage "3 train sweep like-for-like (r2 baseline row + contenders)"
( for c in full:0 full:0:bf16mu ffn:0 dots:0:bf16mu; do
    timeout 900 python tools/bench_train.py --one $c 2>&1 | grep "^{"
  done ) > $R/train_sweep_d.log 2>&1
cat $R/train_sweep_d.log
[ "$(grep -c '^{' $R/train_sweep_d.log)" -ge 4 ] && touch $R/done_d_3
fi

if ! skip 4; then
stage "4 0.6B train retry (batch 8, bf16mu; full error on failure)"
( BENCH_TRAIN_MODEL=config/model_0.6b.json BENCH_TRAIN_BATCH=8 \
  timeout 1200 python tools/bench_train.py --one ffn:8192:bf16mu 2>&1 ) \
  > $R/train_06b_d.log 2>&1 && touch $R/done_d_4
tail -5 $R/train_06b_d.log
fi

if ! skip 5; then
stage "5 verify drive (library surface + C oracle)"
timeout 1800 python tools/verify_drive.py > $R/verify_d.log 2>&1 \
  && touch $R/done_d_5
tail -3 $R/verify_d.log
fi

if ! skip 6; then
stage "6 C++ spec park real-text (adaptive k on trained 56M, CPU)"
if [ -f $R/m56_q80.bin ]; then
  timeout 900 python tools/bench_spec_cpp.py $R/m56_q80.bin \
    > $R/spec_cpp_d.log 2>&1 && touch $R/done_d_6
  tail -4 $R/spec_cpp_d.log
else
  touch $R/done_d_6
fi
fi

stage "END"
# DONE only when every stage actually completed — stage 1 deliberately
# withholds its marker on an empty panel so the watcher relaunches on
# the next sustained heal; an unconditional DONE here would kill the
# watcher with the panel still unmeasured
ok=1
for n in 1 2 3 4 5 6; do
  [ -f $R/done_d_$n ] || { echo "stage $n incomplete"; ok=0; }
done
if [ $ok -eq 1 ]; then
  date -u +%FT%TZ > $R/RUNBOOK_D_DONE
  echo "ALL STAGES DONE"
fi
