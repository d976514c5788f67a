#!/bin/bash
# Session-E follow-up watcher: when queue_r4e.sh completes, decide whether
# to extend the flagship run 400k -> 600k (DESIGN §20 finding 1: scaling
# not flattening; this is the cheapest fidelity lever). Gates:
#   1. queue_r4e finished (so the tunnel is free and bench already landed);
#   2. the 400k eval improved on the 200k flagship (dist < 1.580);
#   3. enough wall-clock remains (start before CUTOFF UTC; the extension is
#      ~2.6 h + startup, and the deadline guard fires at GUARD_AT).
# Record my PID in /tmp/deadline_pids.
cd "$(dirname "$0")/../.." || exit 1
P=${PYTHON:-/opt/venv/bin/python}
Q=/tmp/queue_r4e.log
CUTOFF=${CUTOFF:-14:30}
EVAL=runs/stage2_istft_400k/eval/eval.json

while [ ! -f /tmp/queue_r4e.done ]; do sleep 60; done
echo "extend-watcher: queue done $(date -u)" >> "$Q"

wait_tpu_pre() {
  while true; do
    $P scripts/runbook/tpu_probe.py >> "$Q" 2>&1 && return 0
    sleep 45
  done
}
# Compiled-Pallas parity evidence for the round (the kernel was relayouted
# this session; interpret-mode CI can't catch Mosaic lowering drift).
wait_tpu_pre
timeout 1800 $P scripts/verify_tpu.py > runs/verify_tpu_r04b.txt 2>&1
echo "extend-watcher: verify_tpu rc=$? $(date -u)" >> "$Q"

NOW=$(date -u +%s); LIMIT=$(date -u -d "today $CUTOFF" +%s)
if [ "$NOW" -ge "$LIMIT" ]; then
  echo "extend-watcher: past cutoff $CUTOFF, not extending" >> "$Q"
  exit 0
fi
DIST=$($P -c "import json;print(json.load(open('$EVAL'))['copy_synthesis_multires_stft_distance_mean'])" 2>/dev/null)
OK=$($P -c "print(1 if float('${DIST:-99}') < 1.580 else 0)")
if [ "$OK" != "1" ]; then
  echo "extend-watcher: 400k dist=$DIST did not beat 1.580, not extending" >> "$Q"
  exit 0
fi
echo "extend-watcher: 400k dist=$DIST < 1.580 -> extending to 600k $(date -u)" >> "$Q"

wait_tpu() {
  while true; do
    $P scripts/runbook/tpu_probe.py >> "$Q" 2>&1 && return 0
    sleep 45
  done
}
wait_tpu
timeout 12600 $P scripts/train_stage2.py --guard --resume \
  --corpus runs/corpus_rich \
  --steps 600000 --batch 16 --segment 8192 \
  --head istft --g-warmup 5000 --r1-gamma 1.0 \
  --d-noise 0.1 --noise-decay-steps 20000 \
  --init-scheme he --bf16-gen --bf16-disc \
  --reuse-real-feats --concat-disc --dense-groups 16 --f-fold 4 \
  --ema 0.999 \
  --auto-mel-stats --pallas-frontend \
  --ckpt-every 1000 --log-every 100 --audio-every 50000 \
  --outdir runs/stage2_istft_400k >> runs/stage2_istft_400k.log 2>&1
echo "extend-watcher: 600k train rc=$? $(date -u)" >> "$Q"
wait_tpu
timeout 3600 $P scripts/eval_checkpoint.py --run runs/stage2_istft_400k \
  --corpus runs/corpus_rich --head istft --ema 0.999 --gl-anchor \
  --out runs/stage2_istft_400k/eval600 \
  > runs/stage2_istft_400k/eval600.log 2>&1
echo "extend-watcher: 600k eval rc=$? $(date -u)" >> "$Q"
touch /tmp/r4e_600k.done
