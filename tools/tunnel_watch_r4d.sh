#!/bin/bash
# Detached tunnel-heal watcher (round 4, revision d). Probes the TPU
# every ~4 min; on the first successful dispatch it writes
# /tmp/r4/TUNNEL_UP_D and launches tools/tpu_runbook_r4d.sh once —
# marker-guarded, detached, logging to /tmp/r4/runbook_d.log — then
# exits.  Solo discipline: while /tmp/r4/RUNBOOK_RUNNING exists,
# sessions must not dispatch TPU work.
set -u
cd /root/repo
mkdir -p /tmp/r4
echo "watcher-d start $(date -u +%FT%TZ) pid $$" >> /tmp/r4/watch.log
while true; do
  if [ -f /tmp/r4/TUNNEL_UP_D ]; then
    exit 0
  fi
  if timeout 90 python - <<'EOF' >> /tmp/r4/watch.log 2>&1
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(np.asarray(x @ x)[0, 0]) == 128.0
print("probe ok")
EOF
  then
    date -u +%FT%TZ > /tmp/r4/TUNNEL_UP_D
    echo "TUNNEL UP (d) $(date -u +%FT%TZ)" >> /tmp/r4/watch.log
    if [ ! -f /tmp/r4/RUNBOOK_RUNNING ] && [ ! -f /tmp/r4/RUNBOOK_D_DONE ]; then
      echo "runbook-d launch $(date -u +%FT%TZ)" >> /tmp/r4/watch.log
      setsid nohup bash -c 'bash tools/tpu_runbook_r4d.sh > /tmp/r4/runbook_d.log 2>&1' \
        >/dev/null 2>&1 < /dev/null &
    fi
    exit 0
  fi
  echo "probe-d failed $(date -u +%FT%TZ)" >> /tmp/r4/watch.log
  sleep 240
done
