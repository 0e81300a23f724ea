#!/bin/bash
# Retry-runner for flappy-tunnel measurement commands:
#   tools/run_when_up.sh <max_attempts> <logfile> <cmd...>
# Probes the TPU (2 consecutive OKs) before each attempt; an attempt
# that exits 0 ends the loop.  Detach with setsid nohup.
set -u
ATTEMPTS=$1; LOG=$2; shift 2
cd /root/repo
for i in $(seq 1 $ATTEMPTS); do
  ok=0
  for j in 1 2; do
    if timeout 75 python -c "
import jax, numpy as np
assert float(np.asarray(jax.numpy.ones((64,64)) @ jax.numpy.ones((64,64)))[0,0]) == 64.0
print('ok')" >/dev/null 2>&1; then ok=$((ok+1)); else break; fi
    [ $j -lt 2 ] && sleep 15
  done
  if [ $ok -eq 2 ]; then
    echo "=== attempt $i $(date -u +%FT%TZ) ===" >> "$LOG"
    if "$@" >> "$LOG" 2>&1; then
      echo "=== SUCCESS attempt $i $(date -u +%FT%TZ) ===" >> "$LOG"
      exit 0
    fi
    echo "=== attempt $i failed ===" >> "$LOG"
  fi
  sleep 180
done
echo "=== gave up after $ATTEMPTS attempts ===" >> "$LOG"
exit 1
