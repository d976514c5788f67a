#!/bin/bash
# Round-5 TPU queue (rewritten end of round 4; the original predated the
# flagship's clean training and queued now-completed science). Serialized:
# ONE TPU client at a time; wait_tpu between jobs; --guard on every
# training job; judged artifacts first so a short tunnel window still
# lands them.
#
# Round-5 frontier (ROADMAP):
#   1. bench + compiled-Pallas evidence (the judged artifacts);
#   2. flagship LONG run — scaling did not flatten at 200k (DESIGN §20);
#      checkpoints do NOT survive VM reboots, so train fresh with
#      ckpt-every 1000 and eval whatever step the session reaches;
#   3. complex-MRD probe (phase-jitter frontier) if session F didn't land it;
#   4. final bench with whatever trained.
#
# Start me any time — I gate on the probe marker. Record my PID in
# /tmp/deadline_pids and arm deadline_guard.sh ~35 min before round end
# (round 3 lost its judged bench to a leftover client at bench time).
cd "$(dirname "$0")/../.." || exit 1
P=${PYTHON:-/opt/venv/bin/python}
Q=${QLOG:-/tmp/queue_r5.log}
MARKER=${MARKER:-/tmp/tpu_ok.marker}
PROBE="scripts/runbook/tpu_probe.py"
FLAGSHIP_STEPS=${FLAGSHIP_STEPS:-400000}   # ~95 min / 100k steps
FLAGSHIP_TMO=${FLAGSHIP_TMO:-25200}
echo "queue r5 start $(date -u)" >> "$Q"

wait_tpu() {
  while true; do
    "$P" "$PROBE" >> "$Q" 2>&1 && return 0
    sleep 45
  done
}

train() { # train <name> <timeout_s> <logfile> <cmd...>
  local name=$1; shift
  local tmo=$1; shift
  local logf=$1; shift
  wait_tpu
  timeout "$tmo" "$@" >> "$logf" 2>&1
  local rc=$?
  echo "$name rc=$rc $(date -u)" >> "$Q"
  if [ $rc -ne 0 ]; then
    echo "$name retrying with --resume $(date -u)" >> "$Q"
    wait_tpu
    timeout "$tmo" "$@" --resume >> "$logf" 2>&1
    echo "$name retry rc=$? $(date -u)" >> "$Q"
  fi
}

job() { # job <name> <timeout_s> <logfile> <cmd...>
  local name=$1; shift
  local tmo=$1; shift
  local logf=$1; shift
  wait_tpu
  timeout "$tmo" "$@" > "$logf" 2>&1
  echo "$name rc=$? $(date -u)" >> "$Q"
}

# 0. Corpus regen (CPU-only; reboots wipe untracked artifacts — ~2 min).
if [ ! -d runs/corpus_rich ]; then
  $P scripts/make_corpus.py --out runs/corpus_rich > /tmp/corpus_r5.log 2>&1
  echo "corpus regen rc=$? $(date -u)" >> "$Q"
fi

while [ ! -f "$MARKER" ]; do sleep 30; done
echo "tunnel confirmed $(date -u)" >> "$Q"

# 1. Judged artifacts first.
job bench_early 2700 /tmp/bench_r5_early.json $P bench.py
if [ -s BENCH_FULL.json ]; then
  git add BENCH_FULL.json bench_stderr.log 2>/dev/null
  git commit -m "Round-5 early bench refresh on hardware" >> "$Q" 2>&1
fi
touch /tmp/r5_bench_early.done
job verify_tpu 1800 runs/verify_tpu_r05.txt $P scripts/verify_tpu.py
# Advisor r4 (medium): never present a stalled/partial verify as parity
# evidence — commit green runs as such, and partial runs with an honest
# message recording how far they got.
git add runs/verify_tpu_r05.txt
if grep -q "ALL PASS" runs/verify_tpu_r05.txt; then
  git commit -m "Round-5 compiled-Pallas parity artifact (ALL PASS)" \
    >> "$Q" 2>&1
else
  n_checks=$(grep -c "^\[" runs/verify_tpu_r05.txt)
  git commit -m "Round-5 verify_tpu PARTIAL artifact: run stalled/killed after ${n_checks} checks (not parity evidence)" \
    >> "$Q" 2>&1
fi
touch /tmp/r5_verify.done

# 2. Flagship long run: the cheapest fidelity lever (DESIGN §16/§20 —
#    held-out dist improves monotonically 50k->200k with no flattening).
#    Fresh start (no checkpoints survive reboots); eval mid-session uses
#    the latest checkpoint if the timeout, guard, or session end cut it.
train flagship_long "$FLAGSHIP_TMO" runs/stage2_istft_long.log \
  $P scripts/train_stage2.py --guard \
  --corpus runs/corpus_rich \
  --steps "$FLAGSHIP_STEPS" --batch 16 --segment 8192 \
  --head istft --g-warmup 5000 --r1-gamma 1.0 \
  --d-noise 0.1 --noise-decay-steps 20000 \
  --init-scheme he --bf16-gen --bf16-disc \
  --reuse-real-feats --concat-disc --dense-groups 16 --f-fold 4 \
  --ema 0.999 \
  --auto-mel-stats --pallas-frontend \
  --ckpt-every 1000 --log-every 200 --audio-every 50000 \
  --outdir runs/stage2_istft_long
job eval_long 3600 runs/stage2_istft_long/eval.log \
  $P scripts/eval_checkpoint.py --run runs/stage2_istft_long \
  --corpus runs/corpus_rich --head istft --ema 0.999 --gl-anchor
git add runs/stage2_istft_long 2>/dev/null
git commit -m "Flagship long-run metrics and held-out eval" >> "$Q" 2>&1
touch /tmp/r5_flagship.done

# 3. Complex-MRD probe — SKIP if round-4 session F already landed it
#    (runs/stage2_istft_mrdc_50k committed with an eval).
if [ ! -f runs/stage2_istft_mrdc_50k/eval/eval.json ]; then
  train istft_mrdc 4500 runs/stage2_istft_mrdc_50k.log \
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
fi
touch /tmp/r5_mrdc.done

# 4. Final bench with whatever trained this round.
job bench_final 2700 /tmp/bench_r5.json $P bench.py
if [ -s BENCH_FULL.json ]; then
  git add BENCH_FULL.json bench_stderr.log 2>/dev/null
  git commit -m "Round-5 final bench refresh" >> "$Q" 2>&1
fi
touch /tmp/r5_bench.done
echo "QUEUE COMPLETE $(date -u)" >> "$Q"
touch /tmp/queue_r5.done
