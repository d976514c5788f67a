#!/usr/bin/env python
"""Stage-1 spectrogram GAN training (judged scenario 2, BASELINE.json:8).

Trains the "composer" on real log-mel patches extracted from the corpus:
  python scripts/train_stage1.py --corpus DIR --steps 1000 [--mesh 8]
Without --corpus, a deterministic synthetic corpus is generated.

When --mesh > 1 the step runs under shard_map with explicit pmean and a
per-device decorrelated latent draw (--dp jit selects jit+NamedSharding,
which replays the single-device latent scheme on the global batch).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--mesh", type=int, default=1)
    ap.add_argument("--dp", choices=["shard_map", "jit"], default="shard_map")
    ap.add_argument("--outdir", default="runs/stage1")
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--preset", choices=["default", "tiny"], default="default",
                    help="'tiny' = small models for smoke runs / CPU")
    ap.add_argument("--grad-clip", type=float, default=0.0)
    ap.add_argument("--gan-loss", choices=["hinge", "nonsat"], default="hinge",
                    help="nonsat = logistic loss without flat regions "
                         "(hinge froze stage-1 completely; see "
                         "losses/gan.py nonsat_d_loss)")
    ap.add_argument("--g-lr", type=float, default=None)
    ap.add_argument("--d-lr", type=float, default=None)
    ap.add_argument("--d-noise", type=float, default=0.0,
                    help="instance-noise stddev on D inputs (stabilizer)")
    ap.add_argument("--out-temperature", type=float, default=1.0,
                    help="G output = tanh(T*x); T<1 widens the linear "
                         "region (anti-saturation, docs/DESIGN.md §10)")
    ap.add_argument("--out-init-gain", type=float, default=1.0,
                    help="init-std multiplier on G's output conv")
    ap.add_argument("--init-scheme", choices=["dcgan", "he"], default="dcgan",
                    help="weight init for ALL SpecGAN layers; 'he' starts G "
                         "at real-mel amplitude (the saturation-freeze cure, "
                         "docs/DESIGN.md §10)")
    ap.add_argument("--res-init-gain", type=float, default=1.0,
                    help="init-std multiplier on residual branch outputs "
                         "(0.1 with --init-scheme he: near-identity blocks)")
    ap.add_argument("--r1-gamma", type=float, default=0.0,
                    help="R1 gradient penalty weight on D(real) (0 = off)")
    ap.add_argument("--noise-decay-steps", type=int, default=0,
                    help="linear decay horizon for --d-noise (0 = constant)")
    ap.add_argument("--lr-decay", type=float, default=1.0,
                    help="exponential lr decay rate per --lr-decay-every")
    ap.add_argument("--lr-decay-every", type=int, default=1000)
    ap.add_argument("--ema", type=float, default=0.0,
                    help="generator EMA decay (0 = off)")
    ap.add_argument("--lambda-flux", type=float, default=0.0,
                    help="temporal-flux profile matching weight (0 = off; "
                         "targets the measured flicker, DESIGN.md §12)")
    ap.add_argument("--reuse-real-feats", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute in G and D")
    ap.add_argument("--auto-mel-stats", action="store_true")
    ap.add_argument("--debug-nans", action="store_true",
                    help="jax_debug_nans: fail loudly at the op that "
                         "first produces a NaN (numeric sanitizer; "
                         "disables async dispatch, debug runs only)")
    ap.add_argument("--augment", action="store_true",
                    help="random gain + polarity per segment "
                         "(data/dataset.py; corpus multiplier)")
    ap.add_argument("--guard", action="store_true",
                    help="online collapse detection (train/guard.py): stop "
                         "early, stamp STATUS, keep checkpoints, exit 0")
    ap.add_argument("--prefetch", type=int, default=2,
                    help="host-side batch prefetch depth (0 = synchronous)")
    ap.add_argument("--ram-budget-mb", type=int, default=0)
    args = ap.parse_args()

    from music_synthesis_tpu.utils.env import (
        enable_persistent_compile_cache, maybe_force_cpu)

    maybe_force_cpu()
    enable_persistent_compile_cache()

    import jax
    import jax.numpy as jnp

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    import dataclasses

    from music_synthesis_tpu.config import TINY, PipelineConfig, TrainConfig
    from music_synthesis_tpu.data.dataset import AudioDataset, make_synthetic_corpus
    from music_synthesis_tpu.data.prefetch import Prefetcher
    from music_synthesis_tpu.data.stats import compute_mel_stats
    from music_synthesis_tpu.ops.frontend import log_mel_for_vocoder
    from music_synthesis_tpu.parallel.dp import make_dp_stage1_step
    from music_synthesis_tpu.parallel.mesh import (
        make_mesh, replicate_state, shard_batch,
    )
    from music_synthesis_tpu.parallel.shard_map_dp import make_shardmap_stage1_step
    from music_synthesis_tpu.train import stage1
    from music_synthesis_tpu.train.checkpoint import CheckpointManager
    from music_synthesis_tpu.train.metrics import MetricsLogger

    base = TINY if args.preset == "tiny" else PipelineConfig()
    specgan = base.specgan
    if args.bf16:
        specgan = dataclasses.replace(specgan, compute_dtype="bfloat16")
    if args.out_temperature != 1.0 or args.out_init_gain != 1.0:
        specgan = dataclasses.replace(
            specgan, out_temperature=args.out_temperature,
            out_init_gain=args.out_init_gain,
        )
    if args.init_scheme != "dcgan" or args.res_init_gain != 1.0:
        specgan = dataclasses.replace(
            specgan, init_scheme=args.init_scheme,
            res_init_gain=args.res_init_gain,
        )
    cfg = dataclasses.replace(
        base,
        specgan=specgan,
        train=TrainConfig(
            batch_size=args.batch,
            augment=args.augment,
            mesh_shape=(args.mesh,),
            grad_clip_norm=args.grad_clip,
            ema_decay=args.ema,
            reuse_real_features=args.reuse_real_feats,
            gan_loss=args.gan_loss,
            d_input_noise=args.d_noise,
            d_noise_decay_steps=args.noise_decay_steps,
            r1_gamma=args.r1_gamma,
            lambda_flux=args.lambda_flux,
            lr_decay_rate=args.lr_decay,
            lr_decay_every=args.lr_decay_every,
            **({"g_lr": args.g_lr} if args.g_lr else {}),
            **({"d_lr": args.d_lr} if args.d_lr else {}),
        ),
    )
    assert args.batch % max(args.mesh, 1) == 0, (
        f"--batch {args.batch} must be divisible by --mesh {args.mesh}"
    )
    assert cfg.specgan.n_mels == cfg.frontend.n_mels, (
        f"specgan.n_mels ({cfg.specgan.n_mels}) != frontend.n_mels "
        f"({cfg.frontend.n_mels}); real patches would not type-check"
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
        ram_budget_mb=args.ram_budget_mb or None,
        augment=cfg.train.augment,
    )
    print(f"corpus: {len(ds)} clips on {jax.device_count()} device(s)")

    if args.auto_mel_stats:
        scaler = compute_mel_stats(ds, cfg, seed=cfg.train.seed)
        cfg = dataclasses.replace(cfg, mel_scaler=scaler)
        (outdir / "mel_stats.json").write_text(json.dumps(
            {"shift": scaler.shift, "scale": scaler.scale}))
        print(f"mel stats from corpus: shift={scaler.shift:.3f} "
              f"scale={scaler.scale:.3f}")

    # Exact provenance: the FULL resolved config (incl. optimizer-shaping
    # fields), so export/eval tools rebuild the identical state pytree.
    from music_synthesis_tpu.config import config_to_dict

    (outdir / "config.json").write_text(
        json.dumps(config_to_dict(cfg), indent=1))

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
        if args.dp == "shard_map":
            step_fn = make_shardmap_stage1_step(cfg, mesh)
        else:
            step_fn = make_dp_stage1_step(cfg, mesh)
        prep = lambda x: shard_batch(x, mesh)
    else:
        step_fn = lambda s, m: stage1.train_step(cfg, s, m)
        prep = lambda x: x

    logger = MetricsLogger(str(outdir / "metrics.jsonl"))
    guard = None
    if args.guard:
        from music_synthesis_tpu.train.guard import CollapseGuard
        guard = CollapseGuard()
    guard_reason = None
    make_batch = lambda step: prep(patches(jnp.asarray(
        ds.sample_batch(step, cfg.train.batch_size, cfg.train.seed))))
    if args.prefetch > 0:
        batches = Prefetcher(make_batch, start_step, args.steps,
                             depth=args.prefetch)
    else:
        batches = ((s, make_batch(s)) for s in range(start_step, args.steps))
    t_start = time.perf_counter()
    for step, mel in batches:
        state, metrics = step_fn(state, mel)
        if (step + 1) % args.log_every == 0 or step == start_step:
            logger.log(step + 1, metrics)
            if guard is not None:
                guard_reason = guard.update(
                    step + 1, {k: float(metrics[k])
                               for k in ("d_loss", "g_adv")})
                if guard_reason:
                    print(f"GUARD: {guard_reason}; stopping early",
                          flush=True)
                    (outdir / "STATUS").write_text(
                        f"guard-stopped at step {step + 1}: "
                        f"{guard_reason}\n")
                    break
        if (step + 1) % args.ckpt_every == 0:
            ckpt.save(step + 1, state)
    jax.block_until_ready(state.g_params)
    dt = time.perf_counter() - t_start
    end_step = (step + 1) if guard_reason else args.steps
    n_done = end_step - start_step
    if n_done > 0:
        print(f"loop: {n_done} steps in {dt:.1f}s "
              f"({1e3 * dt / n_done:.1f} ms/step incl. host pipeline)")
    ckpt.save(end_step, state, wait=True)
    ckpt.close()
    logger.close()
    print(f"done: {end_step} steps -> {outdir}")


if __name__ == "__main__":
    main()
