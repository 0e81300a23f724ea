#!/bin/bash
# r5 continuous tunnel-state watcher.  Maintains /tmp/r5/state with one
# word (UP / DOWN) + timestamp so interactive work can gate TPU
# dispatches on it, and appends transitions to /tmp/r5/watch.log.
# If /tmp/r5/runbook.sh exists and is executable, a SUSTAINED heal
# (2 consecutive OK probes) launches it ONCE per heal window under the
# solo-discipline marker /tmp/r5/RUNBOOK_RUNNING (runbook must remove
# the marker when done).  Exits when /tmp/r5/WATCH_STOP appears.
set -u
cd /root/repo
mkdir -p /tmp/r5
echo "watcher-r5 start $(date -u +%FT%TZ) pid $$" >> /tmp/r5/watch.log

probe_once() {
  timeout 75 python - <<'PYEOF' >> /tmp/r5/probe.log 2>&1
import nano_tpu
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(np.asarray(x @ x)[0, 0]) == 128.0
print("probe ok")
PYEOF
}

last=""
while true; do
  [ -f /tmp/r5/WATCH_STOP ] && { echo "watcher-r5 stop $(date -u +%FT%TZ)" >> /tmp/r5/watch.log; exit 0; }
  if [ -f /tmp/r5/RUNBOOK_RUNNING ]; then
    sleep 120
    continue
  fi
  if probe_once; then
    state=UP
    # sustained-heal check for runbook launch
    if [ "$last" != "UP" ] && [ -x /tmp/r5/runbook.sh ] && [ ! -f /tmp/r5/RUNBOOK_DONE ]; then
      sleep 15
      if probe_once; then
        echo "SUSTAINED-UP $(date -u +%FT%TZ); launching runbook" >> /tmp/r5/watch.log
        touch /tmp/r5/RUNBOOK_RUNNING
        setsid nohup bash -c 'bash /tmp/r5/runbook.sh >> /tmp/r5/runbook.log 2>&1; rm -f /tmp/r5/RUNBOOK_RUNNING' \
          >/dev/null 2>&1 < /dev/null &
        sleep 60
      else
        state=DOWN
      fi
    fi
  else
    state=DOWN
  fi
  echo "$state $(date -u +%FT%TZ)" > /tmp/r5/state
  if [ "$state" != "$last" ]; then
    echo "transition -> $state $(date -u +%FT%TZ)" >> /tmp/r5/watch.log
    last=$state
  fi
  if [ "$state" = UP ]; then sleep 180; else sleep 45; fi
done
