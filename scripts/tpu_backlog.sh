#!/bin/bash
# Probe the TPU tunnel; when it answers, run the round-5 measurement
# backlog sequentially (one TPU process at a time — concurrent processes
# fight over the tunnel). Appends everything to /tmp/tpu_backlog.log.
set -u
LOG=/tmp/tpu_backlog.log
cd /root/repo
echo "==== backlog runner start $(date) ====" >> "$LOG"
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "==== tunnel up $(date) ====" >> "$LOG"
    break
  fi
  echo "tunnel down $(date)" >> "$LOG"
  sleep 120
done
run() {
  echo "---- $* $(date) ----" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "---- rc=$? $(date) ----" >> "$LOG"
}
run python scripts/probe_int8_mxu.py
run python scripts/profile_step.py --what tracker
run python bench.py
echo "==== backlog done $(date) ====" >> "$LOG"
