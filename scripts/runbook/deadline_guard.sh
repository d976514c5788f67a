#!/bin/bash
# Dead-man's switch: at HH:MM UTC today, tree-kill the RECORDED TPU-work
# PIDs (queue + probe loops) so the driver's end-of-round bench finds a
# free tunnel. Round 3 lost its judged perf number to exactly this failure
# mode (a leftover client held the tunnel at driver-bench time).
#
# Kills ONLY the PIDs listed in the pid file and their descendants — NEVER
# name patterns (a pattern can match this session's own command line).
#
# Usage: deadline_guard.sh 14:40 [pid_file]
# Arm ~35 min before round end; record queue/probe/switcher PIDs in the
# pid file (whitespace-separated) as you start them.
AT=${1:?usage: deadline_guard.sh HH:MM [pid_file]}
PIDFILE=${2:-/tmp/deadline_pids}
TARGET=$(date -u -d "today $AT" +%s)
NOW=$(date -u +%s)
[ "$NOW" -ge "$TARGET" ] && exit 0
sleep $((TARGET - NOW))
killtree() {
  local p=$1
  for c in $(ps -o pid= --ppid "$p" 2>/dev/null); do killtree "$c"; done
  kill -9 "$p" 2>/dev/null
}
for pid in $(cat "$PIDFILE" 2>/dev/null); do
  killtree "$pid"
done
echo "deadline guard fired $(date -u)" >> /tmp/queue_r4.log
touch /tmp/tpu_deadline_hit
