#!/usr/bin/env python
"""Checkpoint averaging (SWA) for the stage-2 generator.

  python scripts/average_ckpts.py --run runs/stage2_energy_50k \
      --steps 46000,47000,48000,49000,50000 --out runs/stage2_energy_avg

Averages the serving weights (g_ema when trained with EMA, else
g_params) across the listed checkpoints and writes a synthetic run dir
(config.json + mel_stats.json + one checkpoint) that eval_checkpoint.py
and export_zoo.py consume unchanged. GAN training noise makes late
checkpoints oscillate around the equilibrium; averaging cancels the
oscillation without any retraining — a zero-hardware fidelity lever.
"""

import argparse
import dataclasses
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--steps", required=True,
                    help="comma-separated checkpoint steps to average")
    ap.add_argument("--out", required=True, help="synthetic run dir to write")
    args = ap.parse_args()

    from music_synthesis_tpu.utils.env import maybe_force_cpu

    maybe_force_cpu()

    import jax
    import numpy as np

    from music_synthesis_tpu.config import config_from_dict
    from music_synthesis_tpu.train.checkpoint import (
        CheckpointManager, abstract_state)

    run = Path(args.run)
    steps = [int(s) for s in args.steps.split(",")]
    cfg = config_from_dict(json.loads((run / "config.json").read_text()))

    mgr = CheckpointManager(run / "ckpt")
    template = abstract_state(cfg, stage=2)
    acc_ema = None
    acc_g = None
    last = None
    for s in steps:
        st = mgr.restore(template, step=s)
        g = jax.tree.map(lambda x: np.asarray(x, np.float64), st.g_params)
        acc_g = g if acc_g is None else jax.tree.map(np.add, acc_g, g)
        if st.g_ema is not None:
            e = jax.tree.map(lambda x: np.asarray(x, np.float64), st.g_ema)
            acc_ema = e if acc_ema is None else jax.tree.map(
                np.add, acc_ema, e)
        last = st
        print(f"loaded step {s}")
    mgr.close()

    k = float(len(steps))
    avg_g = jax.tree.map(lambda x: (x / k).astype(np.float32), acc_g)
    state = dataclasses.replace(last, g_params=avg_g)
    if acc_ema is not None:
        state = dataclasses.replace(state, g_ema=jax.tree.map(
            lambda x: (x / k).astype(np.float32), acc_ema))

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    shutil.copy(run / "config.json", out / "config.json")
    if (run / "mel_stats.json").exists():
        shutil.copy(run / "mel_stats.json", out / "mel_stats.json")
    omgr = CheckpointManager(out / "ckpt")
    omgr.save(max(steps), state, wait=True)
    omgr.close()
    (out / "STATUS").write_text(
        f"SWA average of {run} checkpoints {steps} "
        "(generator weights only; D/opt state from the last step)\n")
    print(f"wrote averaged run -> {out}")


if __name__ == "__main__":
    main()
