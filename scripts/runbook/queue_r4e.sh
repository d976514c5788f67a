#!/bin/bash
# Round-4 session-E TPU queue (2026-08-20). Continuation of queue_r4d.sh:
# session D ended mid-run, killing the 400k flagship job at step 83,300
# (checkpoint at 83,000 survives; --resume is exact per test_checkpoint).
# This queue resumes it, then runs the complex-MRD probe, then the final
# bench. Same discipline: ONE client, wait_tpu between jobs, --guard on
# every training job.
cd "$(dirname "$0")/../.." || exit 1
P=${PYTHON:-/opt/venv/bin/python}
Q=${QLOG:-/tmp/queue_r4e.log}
PROBE="scripts/runbook/tpu_probe.py"
echo "queue r4e start $(date -u)" >> "$Q"

wait_tpu() {
  while true; do
    "$P" "$PROBE" >> "$Q" 2>&1 && return 0
    sleep 45
  done
}

train() { # train <name> <timeout_s> <logfile> <cmd...>
  # Retry appends --resume; argparse store_true tolerates the duplicate
  # when the first attempt already carried it (the 400k job).
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

# 1. Resume the 400k flagship scaling point (316,700 steps remain,
#    ~50 ms/step -> ~4.5 h + startup). --resume from the start: the run
#    dir already holds ckpt/83000.
train istft_400k_resume 23400 runs/stage2_istft_400k.log \
  $P scripts/train_stage2.py --guard --resume \
  --corpus runs/corpus_rich \
  --steps 400000 --batch 16 --segment 8192 \
  --head istft --g-warmup 5000 --r1-gamma 1.0 \
  --d-noise 0.1 --noise-decay-steps 20000 \
  --init-scheme he --bf16-gen --bf16-disc \
  --reuse-real-feats --concat-disc --dense-groups 16 --f-fold 4 \
  --ema 0.999 \
  --auto-mel-stats --pallas-frontend \
  --ckpt-every 1000 --log-every 100 --audio-every 50000 \
  --outdir runs/stage2_istft_400k
job eval_400k 3600 runs/stage2_istft_400k/eval.log \
  $P scripts/eval_checkpoint.py --run runs/stage2_istft_400k \
  --corpus runs/corpus_rich --head istft --ema 0.999 --gl-anchor
touch /tmp/r4e_400k.done

# 2. Complex-MRD probe (unchanged from queue_r4d.sh item 2).
train istft_mrdc 7200 runs/stage2_istft_mrdc_50k.log \
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
  --ckpt-every 1000 --log-every 100 --audio-every 25000 \
  --outdir runs/stage2_istft_mrdc_50k
job eval_mrdc 3600 runs/stage2_istft_mrdc_50k/eval.log \
  $P scripts/eval_checkpoint.py --run runs/stage2_istft_mrdc_50k \
  --corpus runs/corpus_rich --head istft --ema 0.999
touch /tmp/r4e_mrdc.done

# 3. Final bench refresh.
job bench_final 7200 /tmp/bench_r4e.json $P bench.py
touch /tmp/r4e_bench.done
echo "QUEUE COMPLETE $(date -u)" >> "$Q"
touch /tmp/queue_r4e.done
