#!/bin/bash
# Round-4 session-D TPU queue (2026-08-20). Serialized, one client at a
# time, same discipline as queue_r5.sh. State at session start: flagship
# = iSTFT head @200k (dist 1.580, crossed the GL anchor); DESIGN §20
# queues (1) the 400k scaling point and (2) the complex-MRD phase probe.
# Ordering: the 400k run is the headline lever and the longest job — it
# goes first so a late tunnel stall costs the science probe, not the
# flagship. Corpus regenerated this session (make_corpus.py, seed=0).
cd "$(dirname "$0")/../.." || exit 1
P=${PYTHON:-/opt/venv/bin/python}
Q=${QLOG:-/tmp/queue_r4d.log}
PROBE="scripts/runbook/tpu_probe.py"
echo "queue r4d start $(date -u)" >> "$Q"

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
    echo "$name resume rc=$? $(date -u)" >> "$Q"
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

# 1. Flagship 400k scaling point (DESIGN §20 finding 1: scaling not
#    flattening at 200k; ~95 min/100k steps → ~6.5 h). Exact 200k recipe,
#    only --steps changes.
train istft_400k 28800 runs/stage2_istft_400k.log \
  $P scripts/train_stage2.py --guard \
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
touch /tmp/r4d_400k.done

# 2. Complex-MRD probe (DESIGN §20 finding 4 open question: can a
#    phase-aware D buy jitter without the §18 distance cost?). Flagship
#    recipe + --mrd-complex, 50k steps.
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
touch /tmp/r4d_mrdc.done

# 3. Final bench refresh (headline measures the architecture; refresh so
#    BENCH_FULL carries this session's environment).
job bench_final 7200 /tmp/bench_r4d.json $P bench.py
touch /tmp/r4d_bench.done
echo "QUEUE COMPLETE $(date -u)" >> "$Q"
touch /tmp/queue_r4d.done
