#!/bin/bash
# RETIRED (round 5): this watcher could commit half-written artifacts from
# tree-killed jobs with no truncation marker (advisor r4). The round-5
# queues gate commits on artifact parsing / ALL PASS instead
# (queue_r5.sh, queue_r5b.sh); kept only as a historical record.
# Session-F final watcher: after the deadline guard fires (13:50 UTC —
# tree-kills the queue so the driver's end-of-round bench gets a free
# tunnel), commit whatever run artifacts the killed jobs left behind.
# Checkpoints are gitignored; metrics/evals/logs are the evidence.
cd "$(dirname "$0")/../.." || exit 1
AT=${1:-13:52}
TARGET=$(date -u -d "today $AT" +%s)
NOW=$(date -u +%s)
[ "$NOW" -lt "$TARGET" ] && sleep $((TARGET - NOW))
git add runs/stage2_istft_mrdc_50k runs/verify_tpu_r04b.txt \
  BENCH_FULL.json bench_stderr.log 2>/dev/null
git diff --cached --quiet || \
  git commit -m "Session-F artifacts at deadline: queue outputs before driver bench" \
  >> /tmp/queue_r4f.log 2>&1
touch /tmp/r4f_final_commit.done
