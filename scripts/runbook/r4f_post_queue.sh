#!/bin/bash
# Session-F post-queue: the queue's verify_tpu ran FIRST and hit the
# 10:37-10:57 tunnel stall (rc=124, artifact is a two-line stub). Once the
# queue drains, rerun it on the now-healthy tunnel and commit the real
# compiled-parity + kernel-timing evidence, then leave the tunnel FREE for
# the driver's end-of-round bench.
cd "$(dirname "$0")/../.." || exit 1
P=${PYTHON:-/opt/venv/bin/python}
Q=/tmp/queue_r4f.log

while [ ! -f /tmp/queue_r4f.done ]; do sleep 60; done
# Stop before the deadline window: a verify launched too late would hold
# the tunnel when the guard fires.
NOW=$(date -u +%s); LIMIT=$(date -u -d "today 13:30" +%s)
if [ "$NOW" -ge "$LIMIT" ]; then
  echo "post-queue: past 13:30, leaving tunnel free" >> "$Q"
  exit 0
fi
timeout 1200 $P scripts/verify_tpu.py > runs/verify_tpu_r04b.txt 2>&1
echo "post-queue verify rc=$? $(date -u)" >> "$Q"
git add runs/verify_tpu_r04b.txt
git diff --cached --quiet || git commit -m \
  "Compiled-Pallas parity artifact after the batch-fused relayout" >> "$Q" 2>&1
touch /tmp/r4f_post_verify.done
