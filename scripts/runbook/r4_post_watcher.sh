#!/bin/bash
# Round-4 post-queue watcher.
#  - When the serialized TPU queue completes, re-run verify_tpu (with the
#    recalibrated griffin-lim bound) to land a green compiled-evidence
#    artifact, then leave the tunnel idle for the driver's bench.
#  - Dead-man deadline: at epoch 1787117165 (~1h before round end) stop the
#    queue chain by EXPLICIT PIDs (never by pattern) so the driver's
#    end-of-round bench gets a free tunnel.
cd /root/repo || exit 1
P=/opt/venv/bin/python
L=/tmp/r4_post.log
DEADLINE=1787117165
QPID=$(cat /tmp/queue_r4.pid)
echo "watcher start $(date -u) qpid=$QPID" >> "$L"
while true; do
  if [ -e /tmp/queue_r4.done ]; then
    echo "queue done $(date -u); re-running verify_tpu" >> "$L"
    timeout 1800 "$P" scripts/verify_tpu.py > runs/verify_tpu_r04.txt 2>&1
    echo "verify rerun rc=$? $(date -u)" >> "$L"
    exit 0
  fi
  if [ "$(date -u +%s)" -ge "$DEADLINE" ]; then
    echo "DEADLINE $(date -u): stopping queue chain" >> "$L"
    for c in $(ps -o pid= --ppid "$QPID"); do
      for g in $(ps -o pid= --ppid "$c"); do
        for gg in $(ps -o pid= --ppid "$g"); do kill "$gg" 2>/dev/null; done
        kill "$g" 2>/dev/null
      done
      kill "$c" 2>/dev/null
    done
    kill "$QPID" 2>/dev/null
    echo "queue stopped $(date -u)" >> "$L"
    exit 2
  fi
  sleep 60
done
