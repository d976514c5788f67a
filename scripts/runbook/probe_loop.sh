#!/bin/bash
# Unbounded patient probe loop: ONE client at a time, fresh process per
# attempt. Creates $MARKER on success and exits, so queues can gate on it.
# Usage: probe_loop.sh [marker_path] [log_path]
MARKER=${1:-/tmp/tpu_ok.marker}
LOG=${2:-/tmp/probe_loop.log}
P=${PYTHON:-/opt/venv/bin/python}
DIR=$(dirname "$0")
while true; do
  if [ -f "$MARKER" ]; then exit 0; fi
  echo "=== probe attempt $(date -u +%H:%M:%S) ===" >> "$LOG"
  "$P" "$DIR/tpu_probe.py" >> "$LOG" 2>&1
  if [ $? -eq 0 ]; then
    touch "$MARKER"
    echo "TUNNEL OK at $(date -u)" >> "$LOG"
    exit 0
  fi
  sleep 45
done
