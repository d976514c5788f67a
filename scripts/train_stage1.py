#!/usr/bin/env python
"""Stage-1 spectrogram GAN training (judged scenario 2, BASELINE.json:8).

Trains the "composer" on real log-mel patches extracted from the corpus:
  python scripts/train_stage1.py --corpus DIR --steps 1000 [--mesh 8]
Without --corpus, a deterministic synthetic corpus is generated.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--mesh", type=int, default=1)
    ap.add_argument("--outdir", default="runs/stage1")
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--preset", choices=["default", "tiny"], default="default",
                    help="'tiny' = small models for smoke runs / CPU")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import dataclasses

    from music_synthesis_tpu.config import TINY, PipelineConfig, TrainConfig
    from music_synthesis_tpu.data.dataset import AudioDataset, make_synthetic_corpus
    from music_synthesis_tpu.ops.frontend import log_mel_for_vocoder
    from music_synthesis_tpu.parallel.dp import make_dp_stage1_step
    from music_synthesis_tpu.parallel.mesh import (
        make_mesh, replicate_state, shard_batch,
    )
    from music_synthesis_tpu.train import stage1
    from music_synthesis_tpu.train.checkpoint import CheckpointManager
    from music_synthesis_tpu.train.metrics import MetricsLogger

    base = TINY if args.preset == "tiny" else PipelineConfig()
    cfg = dataclasses.replace(
        base,
        train=TrainConfig(batch_size=args.batch, mesh_shape=(args.mesh,)),
    )
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    corpus = args.corpus
    if corpus is None:
        corpus = outdir / "synthetic_corpus"
        make_synthetic_corpus(corpus, n_clips=8, seconds=4.0)
        print(f"no --corpus; wrote synthetic corpus to {corpus}")
    # Mel patches need n_frames * hop samples of audio each.
    seg = cfg.specgan.n_frames * cfg.frontend.hop_length
    ds = AudioDataset(
        corpus,
        sample_rate=cfg.frontend.sample_rate,
        segment_length=seg,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    # Real patches: front-end + normalization, jitted once.
    @jax.jit
    def patches(wav):
        mel = log_mel_for_vocoder(wav, cfg.frontend)
        return (mel - cfg.mel_scaler.shift) / cfg.mel_scaler.scale

    state = stage1.make_train_state(cfg, jax.random.PRNGKey(cfg.train.seed))
    ckpt = CheckpointManager(outdir / "ckpt")
    start_step = 0
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_step = int(state.step)
        print(f"resumed from step {start_step}")

    if args.mesh > 1:
        mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
        state = replicate_state(state, mesh)
        step_fn = make_dp_stage1_step(cfg, mesh)
        prep = lambda x: shard_batch(x, mesh)
    else:
        step_fn = lambda s, m: stage1.train_step(cfg, s, m)
        prep = lambda x: x

    logger = MetricsLogger(str(outdir / "metrics.jsonl"))
    for step in range(start_step, args.steps):
        wav = jnp.asarray(
            ds.sample_batch(step, cfg.train.batch_size, cfg.train.seed)
        )
        state, metrics = step_fn(state, prep(patches(wav)))
        if (step + 1) % args.log_every == 0 or step == start_step:
            logger.log(step + 1, metrics)
        if (step + 1) % args.ckpt_every == 0:
            ckpt.save(step + 1, state)
    ckpt.save(args.steps, state, wait=True)
    ckpt.close()
    logger.close()
    print(f"done: {args.steps} steps -> {outdir}")


if __name__ == "__main__":
    main()
