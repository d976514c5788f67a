#!/usr/bin/env python
"""Capture an XProf/Perfetto trace of the stage-2 GAN training step
(SURVEY.md §5.1; VERDICT r1 next-round #7).

  python scripts/profile_step.py --outdir runs/trace_stage2 [--bf16-disc ...]

The jitted step is annotated with jax.named_scope regions (frontend /
generator_fwd / d_step / g_step / losses — see train/stage2.py), which show
up as named spans in the trace. The artifact is a directory consumable by
XProf / tensorboard-plugin-profile / Perfetto.
"""

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="runs/trace_stage2")
    ap.add_argument("--steps", type=int, default=5, help="traced steps")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--segment", type=int, default=8192)
    ap.add_argument("--preset", choices=["default", "tiny"], default="default")
    ap.add_argument("--bf16-disc", action="store_true")
    ap.add_argument("--bf16-gen", action="store_true")
    ap.add_argument("--reuse-real-feats", action="store_true")
    ap.add_argument("--pallas-frontend", action="store_true")
    ap.add_argument("--dense-groups", type=int, default=0)
    ap.add_argument("--concat-disc", action="store_true")
    ap.add_argument("--f-fold", type=int, default=0)
    args = ap.parse_args()

    from music_synthesis_tpu.utils.env import maybe_force_cpu

    maybe_force_cpu()

    import jax
    import jax.numpy as jnp

    from music_synthesis_tpu.config import TINY, PipelineConfig, TrainConfig
    from music_synthesis_tpu.train import stage2
    from music_synthesis_tpu.utils.profiling import trace

    base = TINY if args.preset == "tiny" else PipelineConfig()
    vocoder, msd, mrd = base.vocoder, base.msd, base.mrd
    if args.bf16_gen:
        vocoder = dataclasses.replace(vocoder, compute_dtype="bfloat16")
    if args.bf16_disc:
        msd = dataclasses.replace(msd, compute_dtype="bfloat16")
        mrd = dataclasses.replace(mrd, compute_dtype="bfloat16")
    if args.dense_groups:
        msd = dataclasses.replace(msd, dense_groups_max_g=args.dense_groups)
    if args.f_fold:
        mrd = dataclasses.replace(mrd, f_fold=args.f_fold)
    cfg = dataclasses.replace(
        base, vocoder=vocoder, msd=msd, mrd=mrd,
        train=TrainConfig(
            batch_size=args.batch, segment_length=args.segment,
            use_pallas_frontend=args.pallas_frontend,
            reuse_real_features=args.reuse_real_feats,
            concat_disc_batch=args.concat_disc,
        ),
    )
    state = stage2.make_train_state(cfg, jax.random.PRNGKey(0))
    wav = 0.5 * jnp.tanh(jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, args.segment)))

    # Warm up (compile) outside the trace so the artifact is all execution.
    state, m = stage2.train_step(cfg, state, wav)
    jax.block_until_ready(m)

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    with trace(str(outdir)):
        for _ in range(args.steps):
            state, m = stage2.train_step(cfg, state, wav)
        jax.block_until_ready(m)
    print(f"trace written to {outdir} "
          f"(d_loss={float(m['d_loss']):.4f} over {args.steps} steps)")


if __name__ == "__main__":
    main()
