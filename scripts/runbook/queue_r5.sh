#!/bin/bash
# Round-5 TPU queue. Serialized: ONE TPU client at a time; wait_tpu between
# jobs so a mid-queue tunnel stall pauses the queue instead of burning every
# remaining job's timeout. Training jobs retry once with --resume
# (checkpoints every 1000 steps) and run under the --guard collapse
# detector, so a doomed run stops at detection, not at --steps.
#
# Ordering rationale (round-5 = last round): cheap judged artifacts first
# (bench refresh ~15 min, compiled-Pallas evidence ~5-20 min), then the
# headline lever (stabilized iSTFT), then the science runs. If the tunnel
# is up for only an hour, the first two jobs still land.
#
# Start me AFTER probe_loop.sh creates the marker, or just run me — I gate
# on the marker myself. Record my PID in /tmp/deadline_pids and arm
# deadline_guard.sh ~35 min before round end.
cd "$(dirname "$0")/../.." || exit 1
P=${PYTHON:-/opt/venv/bin/python}
Q=${QLOG:-/tmp/queue_r5.log}
MARKER=${MARKER:-/tmp/tpu_ok.marker}
PROBE="scripts/runbook/tpu_probe.py"
echo "queue r5 start $(date -u)" >> "$Q"

wait_tpu() {
  # Block until a fresh probe succeeds. Probe only BETWEEN jobs (the probe
  # is itself a TPU client).
  while true; do
    "$P" "$PROBE" >> "$Q" 2>&1 && return 0
    sleep 45
  done
}

train() { # train <name> <logfile> <cmd...>
  local name=$1; shift
  local logf=$1; shift
  wait_tpu
  timeout 10800 "$@" >> "$logf" 2>&1
  local rc=$?
  echo "$name rc=$rc $(date -u)" >> "$Q"
  if [ $rc -ne 0 ]; then
    echo "$name retrying with --resume $(date -u)" >> "$Q"
    wait_tpu
    timeout 10800 "$@" --resume >> "$logf" 2>&1
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

while [ ! -f "$MARKER" ]; do sleep 30; done
echo "tunnel confirmed $(date -u)" >> "$Q"

# 1. Fresh bench: BENCH_FULL.json incl. logical TFLOP/s split, all five
#    BASELINE scenarios, Pallas-vs-oracle A/B; donation check via stderr.
job bench_early 2700 /tmp/bench_r5_early.json $P bench.py
touch /tmp/r5_bench_early.done

# 2. Compiled-Pallas evidence artifact (commit runs/verify_tpu_r05.txt).
job verify_tpu 1800 runs/verify_tpu_r05.txt $P scripts/verify_tpu.py
touch /tmp/r5_verify.done

# 3. Stabilized iSTFT-head 50k (headline lever: ~16,600x RTF if it trains
#    clean; resume from runs/stage2_istft_stab_50k if round 4 got partway).
train istft_stab runs/stage2_istft_stab_50k.log \
  $P scripts/train_stage2.py --guard \
  --corpus runs/corpus_rich \
  --steps 50000 --batch 16 --segment 8192 \
  --head istft --g-warmup 5000 --r1-gamma 1.0 \
  --d-noise 0.1 --noise-decay-steps 20000 \
  --init-scheme he --bf16-gen --bf16-disc \
  --reuse-real-feats --concat-disc --dense-groups 64 --f-fold 4 \
  --ema 0.999 --lambda-stft 10 \
  --auto-mel-stats --pallas-frontend \
  --ckpt-every 1000 --log-every 200 --audio-every 25000 \
  --outdir runs/stage2_istft_stab_50k
job eval_istft 3600 runs/stage2_istft_stab_50k/eval.log \
  $P scripts/eval_checkpoint.py --run runs/stage2_istft_stab_50k \
  --corpus runs/corpus_rich --head istft --ema 0.999 --gl-anchor
touch /tmp/r5_istft.done

# 4. Resume + finish the flux composer run (stalled at 6.2k/40k in r3).
train flux_resume runs/stage1_flux_40k.log \
  $P scripts/train_stage1.py --guard \
  --corpus runs/corpus_rich --steps 40000 --batch 16 \
  --init-scheme he --res-init-gain 0.1 --out-init-gain 0.1 \
  --r1-gamma 1.0 --d-noise 0.2 --noise-decay-steps 10000 \
  --ema 0.999 --lambda-flux 10 \
  --auto-mel-stats --resume \
  --ckpt-every 1000 --log-every 200 \
  --outdir runs/stage1_flux_40k
job eval_flux 3600 runs/stage1_flux_40k/eval.log \
  $P scripts/eval_stage1.py --run runs/stage1_flux_40k \
  --corpus runs/corpus_rich
touch /tmp/r5_flux.done

# 5. Corpus-scale hypothesis: 16 h corpus, 50k steps (held-out dist < 2.0?).
train rich16h runs/stage2_rich16h_50k.log \
  $P scripts/train_stage2.py --guard \
  --corpus runs/corpus_rich16h \
  --steps 50000 --batch 16 --segment 8192 \
  --init-scheme he --bf16-gen --bf16-disc \
  --reuse-real-feats --concat-disc --dense-groups 64 --f-fold 4 \
  --ema 0.999 --lambda-stft 10 \
  --auto-mel-stats --pallas-frontend \
  --ckpt-every 1000 --log-every 200 --audio-every 25000 \
  --outdir runs/stage2_rich16h_50k
job eval_rich16h 3600 runs/stage2_rich16h_50k/eval.log \
  $P scripts/eval_checkpoint.py --run runs/stage2_rich16h_50k \
  --corpus runs/corpus_rich16h --ema 0.999
touch /tmp/r5_rich16h.done

# 6. lambda_energy=50 probe (amplitude story).
train energy50 runs/stage2_energy50_50k.log \
  $P scripts/train_stage2.py --guard \
  --corpus runs/corpus_rich \
  --steps 50000 --batch 16 --segment 8192 \
  --lambda-energy 50 \
  --init-scheme he --bf16-gen --bf16-disc \
  --reuse-real-feats --concat-disc --dense-groups 64 --f-fold 4 \
  --ema 0.999 --lambda-stft 10 \
  --auto-mel-stats --pallas-frontend \
  --ckpt-every 1000 --log-every 200 --audio-every 25000 \
  --outdir runs/stage2_energy50_50k
job eval_energy50 3600 runs/stage2_energy50_50k/eval.log \
  $P scripts/eval_checkpoint.py --run runs/stage2_energy50_50k \
  --corpus runs/corpus_rich --ema 0.999
touch /tmp/r5_energy.done

# 7. Fresh trace + MSD dense-groups variant sweep (step-time attribution).
job trace 3600 /tmp/trace_r5.log \
  $P scripts/profile_step.py \
  --outdir runs/trace_stage2_r5 \
  --bf16-disc --bf16-gen --reuse-real-feats --pallas-frontend \
  --dense-groups 64 --concat-disc --f-fold 4
job variants 5400 /tmp/variants_r5.log \
  $P scripts/bench_step_variants.py \
  --variants 64,256 --concat on --f-fold 4
touch /tmp/r5_perf.done

# 8. Final bench with whatever trained this round.
job bench_final 7200 /tmp/bench_r5.json $P bench.py
touch /tmp/r5_bench.done
echo "QUEUE COMPLETE $(date -u)" >> "$Q"
touch /tmp/queue_r5.done
