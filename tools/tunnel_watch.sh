#!/bin/bash
# Detached tunnel-heal watcher. Probes the TPU every ~4 min; on the first
# successful dispatch it writes /tmp/r3/TUNNEL_UP (timestamp inside),
# LAUNCHES the queued measurement runbook (tools/tpu_runbook.sh) once —
# marker-guarded, detached, logging to /tmp/r3/runbook.log — and exits.
# Auto-launch (rather than waiting for a session to notice) exists
# because sessions can die mid-round; the runbook's own stage 0 re-probes
# before any real work.  Solo (one-TPU-job) discipline: while
# /tmp/r3/RUNBOOK_RUNNING exists, sessions must not dispatch TPU work.
set -u
cd /root/repo
mkdir -p /tmp/r3
echo "watcher start $(date -u +%FT%TZ) pid $$" >> /tmp/r3/watch.log
while true; do
  if [ -f /tmp/r3/TUNNEL_UP ]; then
    exit 0
  fi
  if timeout 90 python - <<'EOF' >> /tmp/r3/watch.log 2>&1
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(np.asarray(x @ x)[0, 0]) == 128.0
print("probe ok")
EOF
  then
    date -u +%FT%TZ > /tmp/r3/TUNNEL_UP
    echo "TUNNEL UP $(date -u +%FT%TZ)" >> /tmp/r3/watch.log
    if [ ! -f /tmp/r3/RUNBOOK_RUNNING ] && [ ! -f /tmp/r3/RUNBOOK_DONE ]; then
      echo $$ > /tmp/r3/RUNBOOK_RUNNING
      echo "runbook launch $(date -u +%FT%TZ)" >> /tmp/r3/watch.log
      setsid nohup bash -c 'bash tools/tpu_runbook.sh > /tmp/r3/runbook.log 2>&1;
                            date -u +%FT%TZ > /tmp/r3/RUNBOOK_DONE;
                            rm -f /tmp/r3/RUNBOOK_RUNNING' \
        >/dev/null 2>&1 < /dev/null &
    fi
    exit 0
  fi
  echo "probe failed $(date -u +%FT%TZ)" >> /tmp/r3/watch.log
  sleep 240
done
