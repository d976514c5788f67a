#!/bin/bash
# Round-4 TPU queue (adapted from scripts/runbook/queue_r5.sh).
# Serialized: ONE TPU client at a time; wait_tpu between jobs.
# Training jobs retry once with --resume and run under --guard.
cd /root/repo || exit 1
P=/opt/venv/bin/python
Q=/tmp/queue_r4.log
PROBE="scripts/runbook/tpu_probe.py"
echo "queue r4 start $(date -u)" >> "$Q"

wait_tpu() {
  while true; do
    "$P" "$PROBE" >> "$Q" 2>&1 && return 0
    sleep 45
  done
}

wait_file() { # wait_file <path> — block until a marker/dir appears
  while [ ! -e "$1" ]; do sleep 20; done
}

job() { # job <name> <timeout_s> <logfile> <cmd...>
  local name=$1; shift
  local tmo=$1; shift
  local logf=$1; shift
  wait_tpu
  timeout "$tmo" "$@" > "$logf" 2>&1
  echo "$name rc=$? $(date -u)" >> "$Q"
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

# 1. Compiled-Pallas evidence artifact (timing-insensitive; OK while the
#    host is also generating corpora).
job verify_tpu 1800 runs/verify_tpu_r04.txt $P scripts/verify_tpu.py
touch /tmp/r4_verify.done

# 2. Fresh bench incl. logical TFLOP/s split + all five BASELINE scenarios.
#    Wait for BOTH corpora first so the host is quiet during timing.
wait_file /tmp/corpus16h.done
job bench_early 2700 /tmp/bench_r4_early.json $P bench.py
touch /tmp/r4_bench_early.done

# 3. Stabilized iSTFT-head 50k (headline lever).
# INCIDENT (round 4): this gate originally waited on clip_0255.wav but the
# corpus generator names files rich_%04d.wav — the queue idled 13 min until
# a marker was dropped. Rule: wait_file targets must be REAL artifact paths;
# prefer the generator's own .done marker. (The live unblock: a <min_length
# WAV at the waited path, which AudioDataset skips.)
wait_file runs/corpus_rich/clip_0255.wav
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
touch /tmp/r4_istft.done

# 4. Flux composer 40k (checkpoints lost with the container; fresh start).
train flux runs/stage1_flux_40k.log \
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
touch /tmp/r4_flux.done

# 5. Corpus-scale hypothesis: 16 h corpus, 50k steps.
wait_file /tmp/corpus16h.done
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
touch /tmp/r4_rich16h.done

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
touch /tmp/r4_energy.done

# 7. Fresh trace + MSD dense-groups variant sweep.
job trace 3600 /tmp/trace_r4.log \
  $P scripts/profile_step.py \
  --outdir runs/trace_stage2_r4 \
  --bf16-disc --bf16-gen --reuse-real-feats --pallas-frontend \
  --dense-groups 64 --concat-disc --f-fold 4
job variants 5400 /tmp/variants_r4.log \
  $P scripts/bench_step_variants.py \
  --variants 64,256 --concat on --f-fold 4
touch /tmp/r4_perf.done

# 8. Final bench with whatever trained this round.
job bench_final 7200 /tmp/bench_r4.json $P bench.py
touch /tmp/r4_bench.done
echo "QUEUE COMPLETE $(date -u)" >> "$Q"
touch /tmp/queue_r4.done
