#!/bin/bash
# Round-4 session-F TPU queue (2026-08-20, post-reboot). The VM rebooted
# again after session E: /tmp queues and all untracked checkpoints are gone,
# and the tunnel stalled ~10:20 UTC mid-verify (trivial matmul hangs in a
# fresh process, so the stall is the relay, not the relayouted kernel —
# though verify_tpu re-run is the discriminating test once the tunnel is
# back). Judged-artifacts-first ordering; ONE client at a time; gate on the
# probe marker; every job bounded by timeout.
#
# Record my PID in /tmp/deadline_pids and arm deadline_guard.sh well before
# round end (round 3 lost its judged bench to a leftover client).
cd "$(dirname "$0")/../.." || exit 1
P=${PYTHON:-/opt/venv/bin/python}
Q=${QLOG:-/tmp/queue_r4f.log}
MARKER=${MARKER:-/tmp/tpu_ok.marker}
PROBE="scripts/runbook/tpu_probe.py"
# Last moment a ~70-min training+eval job may still START (UTC HH:MM).
TRAIN_CUTOFF=${TRAIN_CUTOFF:-12:40}
echo "queue r4f start $(date -u)" >> "$Q"

wait_tpu() {
  while true; do
    "$P" "$PROBE" >> "$Q" 2>&1 && return 0
    sleep 45
  done
}

job() { # job <name> <timeout_s> <logfile> <cmd...>
  local name=$1; shift
  local tmo=$1; shift
  local logf=$1; shift
  wait_tpu
  timeout "$tmo" "$@" > "$logf" 2>&1
  echo "$name rc=$? $(date -u)" >> "$Q"
}

while [ ! -f "$MARKER" ]; do sleep 30; done
echo "tunnel confirmed $(date -u)" >> "$Q"

# 1. Compiled-Pallas evidence post-relayout (1a2c8ae). If THIS hangs while
#    the tunnel is otherwise healthy, the kernel relayout is guilty — the
#    1200 s timeout converts that into rc=124 evidence instead of a held
#    tunnel.
job verify_tpu 1200 runs/verify_tpu_r04b.txt $P scripts/verify_tpu.py
git add runs/verify_tpu_r04b.txt
git commit -m "Compiled-Pallas parity artifact after the batch-fused relayout" >> "$Q" 2>&1

# 2. Bench refresh: all five BASELINE scenarios + the Pallas A/B at the
#    new layout + logical/executed TFLOP/s split.
job bench_r4f 2700 /tmp/bench_r4f.json $P bench.py
if [ -s BENCH_FULL.json ]; then
  git add BENCH_FULL.json bench_stderr.log 2>/dev/null
  git commit -m "Bench refresh on hardware: Pallas A/B at the batch-fused layout" >> "$Q" 2>&1
fi
touch /tmp/r4f_bench.done

# 3. Complex-MRD probe (the phase-jitter frontier lever; queue_r4d/e item
#    that never got tunnel time). Start only if the corpus exists and
#    there is wall-clock room; --guard stops a collapsing run early.
NOW=$(date -u +%s); LIMIT=$(date -u -d "today $TRAIN_CUTOFF" +%s)
if [ -d runs/corpus_rich ] && [ "$NOW" -lt "$LIMIT" ]; then
  job istft_mrdc 4500 runs/stage2_istft_mrdc_50k.log \
    $P scripts/train_stage2.py --guard \
    --corpus runs/corpus_rich \
    --steps 50000 --batch 16 --segment 8192 \
    --head istft --g-warmup 5000 --r1-gamma 1.0 \
    --d-noise 0.1 --noise-decay-steps 20000 \
    --init-scheme he --bf16-gen --bf16-disc \
    --reuse-real-feats --concat-disc --dense-groups 16 --f-fold 4 \
    --mrd-complex \
    --ema 0.999 \
    --auto-mel-stats --pallas-frontend \
    --ckpt-every 1000 --log-every 200 --audio-every 25000 \
    --outdir runs/stage2_istft_mrdc_50k
  job eval_mrdc 1800 runs/stage2_istft_mrdc_50k/eval.log \
    $P scripts/eval_checkpoint.py --run runs/stage2_istft_mrdc_50k \
    --corpus runs/corpus_rich --head istft --ema 0.999
  git add runs/stage2_istft_mrdc_50k 2>/dev/null
  git commit -m "Complex-MRD probe run: metrics and held-out eval" >> "$Q" 2>&1
else
  echo "skipping mrdc probe (corpus missing or past $TRAIN_CUTOFF)" >> "$Q"
fi

echo "QUEUE COMPLETE $(date -u)" >> "$Q"
touch /tmp/queue_r4f.done
