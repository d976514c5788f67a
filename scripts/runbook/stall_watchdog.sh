#!/bin/bash
# Kill-and-resume watchdog for the round-5 flagship run. The axon tunnel
# can stall a single client mid-RPC while staying healthy for fresh
# connections (observed 15:10 UTC: training hung 25 min at step 83k,
# probe from a new process returned in 0.1 s). The recovery protocol is
# kill + --resume from the last checkpoint; this script automates it.
#
# Usage: stall_watchdog.sh <metrics.jsonl> <pidfile> <resume-cmd...>
# Stalls are detected as "metrics file unchanged for 8 minutes while the
# process is alive". Each recovery loses at most ckpt-every steps.
MET=$1; shift
PIDF=$1; shift
Q=/tmp/stall_watchdog.log
echo "watchdog start $(date -u) on $MET" >> "$Q"
LAST_SIZE=-1
LAST_CHANGE=$(date +%s)
while :; do
  sleep 60
  PID=$(cat "$PIDF" 2>/dev/null)
  [ -n "$PID" ] || continue
  if ! kill -0 "$PID" 2>/dev/null; then
    echo "process gone $(date -u); watchdog exits" >> "$Q"
    exit 0
  fi
  SIZE=$(stat -c %s "$MET" 2>/dev/null || echo 0)
  NOW=$(date +%s)
  if [ "$SIZE" != "$LAST_SIZE" ]; then
    LAST_SIZE=$SIZE
    LAST_CHANGE=$NOW
    continue
  fi
  if [ $((NOW - LAST_CHANGE)) -gt 480 ]; then
    echo "STALL at $(date -u): metrics frozen $((NOW - LAST_CHANGE))s; kill+resume" >> "$Q"
    kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null; sleep 3
    nohup "$@" >> runs/stage2_istft_long.log 2>&1 &
    echo $! > "$PIDF"
    echo "resumed as pid $(cat $PIDF) $(date -u)" >> "$Q"
    LAST_CHANGE=$(date +%s)
  fi
done
