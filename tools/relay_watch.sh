#!/bin/bash
# Probe the axon TPU relay; when it answers, run the queued chip
# measurement session (tools/chip_session.sh).  Safe to leave running:
# exits after one successful session or after MAX_PROBES failures.
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/relay_watch.log}
MAX_PROBES=${MAX_PROBES:-200}
: > "$LOG"
for i in $(seq 1 "$MAX_PROBES"); do
  echo "[$(date +%H:%M:%S)] probe $i" >> "$LOG"
  if timeout 180 python - >> "$LOG" 2>&1 <<'EOF'
import jax
print("devices:", jax.devices())
EOF
  then
    echo "[$(date +%H:%M:%S)] RELAY UP — starting chip_session" >> "$LOG"
    bash tools/chip_session.sh /tmp/chip_session.log >> "$LOG" 2>&1
    echo "[$(date +%H:%M:%S)] chip_session done" >> "$LOG"
    exit 0
  fi
  sleep 180
done
echo "relay never came up after $MAX_PROBES probes" >> "$LOG"
exit 1
