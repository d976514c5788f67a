#!/bin/bash
# Round-5 post-training queue (written mid-round while the 400k flagship
# runs). Waits for the training process to exit, then serially:
#   1. held-out eval of the 400k checkpoint (+GL anchor);
#   2. commit the run dir (metrics + eval);
#   3. short phase fine-tune: +20k steps with --lambda-phase 15 from the
#      400k checkpoint (DESIGN.md §21: the measured cheap follow-up on
#      the jitter frontier — anneal the proxy in at the end instead of
#      paying its distance tax for the whole run). OUTCOME (ran 19:08
#      UTC): REFUTED — dist 1.462 -> 1.552, jitter 1.635 -> 1.648
#      (DESIGN.md §22);
#   4. eval the fine-tune; commit;
#   5. export the better checkpoint to the zoo (decided by the driver of
#      this script — export is NOT automatic).
# Commits are gated on artifacts parsing (advisor r4: never commit a
# half-written eval as evidence).
cd "$(dirname "$0")/../.." || exit 1
P=${PYTHON:-/opt/venv/bin/python}
Q=/tmp/queue_r5b.log
echo "queue r5b start $(date -u)" >> "$Q"

# 1. Wait for the training run to finish. The stall watchdog may kill
#    and restart the training pid, so "dead" only counts after 3 minutes
#    of continuous death — otherwise this queue would race a restart and
#    run the eval against a fresh TPU client mid-recovery.
DEAD=0
while [ "$DEAD" -lt 6 ]; do
  if kill -0 "$(cat /tmp/train.pid 2>/dev/null)" 2>/dev/null; then
    DEAD=0
  else
    DEAD=$((DEAD + 1))
  fi
  sleep 30
done
echo "training done $(date -u)" >> "$Q"

evaljob() { # evaljob <rundir>
  local run=$1
  timeout 3000 $P scripts/eval_checkpoint.py --run "$run" \
    --corpus runs/corpus_rich --head istft --ema 0.999 --gl-anchor \
    > "$run/eval.log" 2>&1
  local rc=$?
  echo "eval $run rc=$rc $(date -u)" >> "$Q"
  # Gate: eval.json must parse before anything is committed as evidence.
  $P - "$run" <<'EOF'
import json, sys
json.load(open(f"{sys.argv[1]}/eval/eval.json"))
EOF
}

# 2. Eval + commit the 400k (or wherever the timeout cut it) flagship.
if evaljob runs/stage2_istft_long; then
  git add runs/stage2_istft_long
  git commit -m "Flagship long-run: metrics and held-out eval" >> "$Q" 2>&1
else
  echo "eval of stage2_istft_long failed; NOT committing eval" >> "$Q"
  git add runs/stage2_istft_long/metrics.jsonl \
          runs/stage2_istft_long/config.json 2>/dev/null
  git commit -m "Flagship long-run: training metrics (eval failed, see queue log)" >> "$Q" 2>&1
fi
touch /tmp/r5b_flagship_eval.done

# 3. Phase fine-tune from the final checkpoint (+20k steps, lambda=15).
FT=runs/stage2_istft_long_phaseft
LAST=$(ls runs/stage2_istft_long/ckpt | sort -n | tail -1)
if [ -n "$LAST" ] && [ ! -d "$FT" ]; then
  mkdir -p "$FT/ckpt"
  cp -r "runs/stage2_istft_long/ckpt/$LAST" "$FT/ckpt/"
  cp runs/stage2_istft_long/mel_stats.json "$FT/" 2>/dev/null
  STEPS=$(( (LAST / 8) * 8 + 20000 ))
  timeout 3600 $P scripts/train_stage2.py --guard \
    --corpus runs/corpus_rich --steps "$STEPS" --batch 16 --segment 8192 \
    --head istft --g-warmup 5000 --r1-gamma 1.0 \
    --d-noise 0.1 --noise-decay-steps 20000 \
    --init-scheme he --bf16-gen --bf16-disc \
    --reuse-real-feats --concat-disc --dense-groups 16 --f-fold 4 \
    --lambda-phase 15 \
    --ema 0.999 --auto-mel-stats --pallas-frontend \
    --ckpt-every 5000 --log-every 200 --audio-every 200000 \
    --steps-per-dispatch 8 --resume \
    --outdir "$FT" > "$FT.log" 2>&1
  echo "phaseft rc=$? $(date -u)" >> "$Q"
  if evaljob "$FT"; then
    git add "$FT"
    git commit -m "Phase fine-tune (+20k steps, lambda_phase=15) from the long-run checkpoint: metrics and eval" >> "$Q" 2>&1
  else
    echo "phaseft eval failed; NOT committing" >> "$Q"
  fi
fi
touch /tmp/r5b_done.done
echo "queue r5b done $(date -u)" >> "$Q"
