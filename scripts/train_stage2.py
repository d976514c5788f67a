#!/usr/bin/env python
"""Stage-2 vocoder GAN training (judged scenarios 3 and 5, BASELINE.json:9,11).

Single device:
  python scripts/train_stage2.py --corpus DIR --steps 1000
Data-parallel over all visible devices (config 5 on a v5e-8):
  python scripts/train_stage2.py --corpus DIR --steps 1000 --mesh 8

Without --corpus, a deterministic synthetic corpus is generated. Periodic
outputs: orbax checkpoints, JSONL metrics, and vocoded-audio WAV dumps (the
genre's observability channel, SURVEY.md §5.5).
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
    ap.add_argument("--segment", type=int, default=8192)
    ap.add_argument("--mesh", type=int, default=1, help="data-parallel width")
    ap.add_argument("--outdir", default="runs/stage2")
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--audio-every", type=int, default=500)
    ap.add_argument("--pallas-frontend", action="store_true",
                    help="use the fused Pallas front-end kernel in the step")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--preset", choices=["default", "tiny"], default="default",
                    help="'tiny' = small models for smoke runs / CPU")
    ap.add_argument("--head", choices=["waveform", "istft"], default="waveform",
                    help="vocoder output head (istft = fast TPU variant)")
    ap.add_argument("--grad-clip", type=float, default=0.0,
                    help="global-norm gradient clip (0 = off)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import dataclasses

    from music_synthesis_tpu.config import TINY, PipelineConfig, TrainConfig
    from music_synthesis_tpu.data.dataset import AudioDataset, make_synthetic_corpus
    from music_synthesis_tpu.parallel.dp import make_dp_stage2_step
    from music_synthesis_tpu.parallel.mesh import (
        make_mesh, replicate_state, shard_batch,
    )
    from music_synthesis_tpu.train import stage2
    from music_synthesis_tpu.train.checkpoint import CheckpointManager
    from music_synthesis_tpu.train.metrics import MetricsLogger
    from music_synthesis_tpu.utils.wav import write_wav

    base = TINY if args.preset == "tiny" else PipelineConfig()
    vocoder = base.vocoder
    if args.head == "istft":
        vocoder = dataclasses.replace(
            vocoder, head="istft", upsample_factors=(8, 8),
            istft_n_fft=16, istft_hop=4,
        )
    cfg = dataclasses.replace(
        base,
        vocoder=vocoder,
        train=TrainConfig(
            batch_size=args.batch,
            segment_length=args.segment,
            mesh_shape=(args.mesh,),
            use_pallas_frontend=args.pallas_frontend,
            grad_clip_norm=args.grad_clip,
        ),
    )
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    corpus = args.corpus
    if corpus is None:
        corpus = outdir / "synthetic_corpus"
        make_synthetic_corpus(corpus, n_clips=8, seconds=4.0)
        print(f"no --corpus; wrote synthetic corpus to {corpus}")
    ds = AudioDataset(
        corpus,
        sample_rate=cfg.frontend.sample_rate,
        segment_length=cfg.train.segment_length,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    print(f"corpus: {len(ds.clips)} clips on {jax.device_count()} device(s)")

    state = stage2.make_train_state(cfg, jax.random.PRNGKey(cfg.train.seed))
    ckpt = CheckpointManager(outdir / "ckpt")
    start_step = 0
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_step = int(state.step)
        print(f"resumed from step {start_step}")

    if args.mesh > 1:
        mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
        state = replicate_state(state, mesh)
        step_fn = make_dp_stage2_step(cfg, mesh)
        prep = lambda x: shard_batch(jnp.asarray(x), mesh)
    else:
        step_fn = lambda s, w: stage2.train_step(cfg, s, w)
        prep = jnp.asarray

    logger = MetricsLogger(str(outdir / "metrics.jsonl"))
    for step in range(start_step, args.steps):
        wav = ds.sample_batch(step, cfg.train.batch_size, cfg.train.seed)
        state, metrics = step_fn(state, prep(wav))
        if (step + 1) % args.log_every == 0 or step == start_step:
            logger.log(step + 1, metrics)
        if (step + 1) % args.ckpt_every == 0:
            ckpt.save(step + 1, state)
        if (step + 1) % args.audio_every == 0:
            gen, _ = stage2.make_models(cfg)
            mel = stage2.conditioning_mel(prep(wav[:1]), cfg)
            fake = gen.apply({"params": state.g_params}, mel)
            write_wav(outdir / f"vocoded_{step + 1:07d}.wav",
                      cfg.frontend.sample_rate, np.asarray(fake[0]))
    ckpt.save(args.steps, state, wait=True)
    ckpt.close()
    logger.close()
    print(f"done: {args.steps} steps -> {outdir}")


if __name__ == "__main__":
    main()
