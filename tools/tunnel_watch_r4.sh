#!/bin/bash
# Detached tunnel-heal watcher (round 4). Probes the TPU every ~4 min;
# on the first successful dispatch it writes /tmp/r4/TUNNEL_UP and
# LAUNCHES the queued measurement runbook (tools/tpu_runbook_r4.sh)
# once — marker-guarded, detached, logging to /tmp/r4/runbook.log — and
# exits.  Solo (one-TPU-job) discipline: while /tmp/r4/RUNBOOK_RUNNING
# exists, sessions must not dispatch TPU work.
set -u
cd /root/repo
mkdir -p /tmp/r4
echo "watcher start $(date -u +%FT%TZ) pid $$" >> /tmp/r4/watch.log
while true; do
  if [ -f /tmp/r4/TUNNEL_UP ]; then
    exit 0
  fi
  if timeout 90 python - <<'EOF' >> /tmp/r4/watch.log 2>&1
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(np.asarray(x @ x)[0, 0]) == 128.0
print("probe ok")
EOF
  then
    date -u +%FT%TZ > /tmp/r4/TUNNEL_UP
    echo "TUNNEL UP $(date -u +%FT%TZ)" >> /tmp/r4/watch.log
    if [ ! -f /tmp/r4/RUNBOOK_RUNNING ] && [ ! -f /tmp/r4/RUNBOOK_DONE ]; then
      echo $$ > /tmp/r4/RUNBOOK_RUNNING
      echo "runbook launch $(date -u +%FT%TZ)" >> /tmp/r4/watch.log
      setsid nohup bash -c 'bash tools/tpu_runbook_r4.sh > /tmp/r4/runbook.log 2>&1;
                            date -u +%FT%TZ > /tmp/r4/RUNBOOK_DONE;
                            rm -f /tmp/r4/RUNBOOK_RUNNING' \
        >/dev/null 2>&1 < /dev/null &
    fi
    exit 0
  fi
  echo "probe failed $(date -u +%FT%TZ)" >> /tmp/r4/watch.log
  sleep 240
done
