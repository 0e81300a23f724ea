#!/bin/bash
# Detached tunnel-heal watcher. Probes the TPU every ~4 min; on the first
# successful dispatch it writes /tmp/r3/TUNNEL_UP (timestamp inside) and
# exits.  It never starts TPU workloads itself — sessions check the
# marker and launch tools/tpu_runbook.sh under supervision, so the solo
# (one-TPU-job) discipline is kept.
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
    exit 0
  fi
  echo "probe failed $(date -u +%FT%TZ)" >> /tmp/r3/watch.log
  sleep 240
done
