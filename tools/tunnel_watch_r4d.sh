#!/bin/bash
# Detached tunnel-heal watcher (round 4, revision d2). The tunnel FLAPS
# (observed: one probe succeeds, the next dispatch 60 s later hangs), so
# a single successful probe is not "healed": require 3 consecutive OK
# probes ~20 s apart before launching the runbook, and keep watching —
# if the runbook dies without finishing (mid-run wedge), relaunch on the
# next sustained heal.  Stages are marker-guarded (done_d_*), so a
# relaunch skips completed work.  Exits when /tmp/r4/RUNBOOK_D_DONE
# appears.  Solo discipline: /tmp/r4/RUNBOOK_RUNNING gates TPU work.
set -u
cd /root/repo
mkdir -p /tmp/r4
echo "watcher-d2 start $(date -u +%FT%TZ) pid $$" >> /tmp/r4/watch.log

probe_once() {
  timeout 75 python - <<'EOF' >> /tmp/r4/watch.log 2>&1
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(np.asarray(x @ x)[0, 0]) == 128.0
print("probe ok")
EOF
}

while true; do
  if [ -f /tmp/r4/RUNBOOK_D_DONE ]; then
    echo "watcher-d2 exit: runbook done $(date -u +%FT%TZ)" >> /tmp/r4/watch.log
    exit 0
  fi
  if [ -f /tmp/r4/RUNBOOK_RUNNING ]; then
    sleep 120
    continue
  fi
  ok=0
  for i in 1 2 3; do
    if probe_once; then ok=$((ok+1)); else break; fi
    [ $i -lt 3 ] && sleep 20
  done
  if [ $ok -eq 3 ]; then
    n=$(cat /tmp/r4/launches_d 2>/dev/null || echo 0)
    if [ "$n" -ge 3 ]; then
      echo "watcher-d2 exit: launch cap (3) reached $(date -u +%FT%TZ)" >> /tmp/r4/watch.log
      exit 0
    fi
    echo $((n + 1)) > /tmp/r4/launches_d
    echo "TUNNEL SUSTAINED-UP (d2) $(date -u +%FT%TZ); launching runbook ($((n + 1))/3)" >> /tmp/r4/watch.log
    setsid nohup bash -c 'bash tools/tpu_runbook_r4d.sh >> /tmp/r4/runbook_d.log 2>&1' \
      >/dev/null 2>&1 < /dev/null &
    sleep 60
  else
    echo "probe-d2 $ok/3 $(date -u +%FT%TZ)" >> /tmp/r4/watch.log
    sleep 180
  fi
done
