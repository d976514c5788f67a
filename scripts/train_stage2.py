#!/usr/bin/env python
"""Stage-2 vocoder GAN training (judged scenarios 3 and 5, BASELINE.json:9,11).

Single device:
  python scripts/train_stage2.py --corpus DIR --steps 1000
Data-parallel over all visible devices (config 5 on a v5e-8):
  python scripts/train_stage2.py --corpus DIR --steps 1000 --mesh 8

The distributed step uses shard_map + explicit pmean by default (the fused
Pallas front-end runs per-device there, so --pallas-frontend composes with
--mesh); --dp jit selects the jit+NamedSharding path instead, which does NOT
support the Pallas kernel (no SPMD partitioning rule for the custom call).

Without --corpus, a deterministic synthetic corpus is generated. Periodic
outputs: orbax checkpoints, JSONL metrics, and vocoded-audio WAV dumps (the
genre's observability channel, SURVEY.md §5.5). Host-side batch sampling is
overlapped with the device step by a background prefetcher (--prefetch).
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
    ap.add_argument("--segment", type=int, default=8192)
    ap.add_argument("--mesh", type=int, default=1, help="data-parallel width")
    ap.add_argument("--dp", choices=["shard_map", "jit"], default="shard_map",
                    help="distributed-step implementation when --mesh > 1")
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
    ap.add_argument("--ema", type=float, default=0.0,
                    help="generator EMA decay (0 = off); audio dumps use EMA")
    ap.add_argument("--gan-loss", choices=["hinge", "nonsat"], default="hinge",
                    help="adversarial objective (nonsat = logistic, no flat "
                         "regions)")
    ap.add_argument("--lr-decay", type=float, default=1.0,
                    help="exponential lr decay rate per --lr-decay-every "
                         "steps (1.0 = constant)")
    ap.add_argument("--lr-decay-every", type=int, default=1000)
    ap.add_argument("--r1-gamma", type=float, default=0.0,
                    help="R1 gradient penalty on D(real) (0 = off); the "
                         "anti-collapse lever for the iSTFT head")
    ap.add_argument("--d-noise", type=float, default=0.0,
                    help="instance-noise sigma on D's waveform inputs")
    ap.add_argument("--noise-decay-steps", type=int, default=0,
                    help="linear decay horizon for --d-noise (0 = constant)")
    ap.add_argument("--lambda-energy", type=float, default=0.0,
                    help="frame-energy L1 weight (counteracts the measured "
                         "amplitude sag; 0 = reference-faithful off)")
    ap.add_argument("--lambda-phase", type=float, default=0.0,
                    help="anti-wrapping IF+GD phase-coherence loss weight "
                         "(targets the measured ~1.8x phase-jitter gap the "
                         "magnitude metric is blind to; 0 = off)")
    ap.add_argument("--lambda-stft", type=float, default=None,
                    help="override TrainConfig.lambda_stft (default 2.5; "
                         "HiFi-GAN-class recipes weight reconstruction "
                         "much higher than adversarial)")
    ap.add_argument("--init-scheme", choices=["dcgan", "he"], default="dcgan",
                    help="generator weight init: dcgan = N(0,0.02) "
                         "(MelGAN-faithful, near-silent start), he = "
                         "fan-in-scaled (healthy amplitude from step 0)")
    ap.add_argument("--g-warmup", type=int, default=0,
                    help="train G on STFT loss alone (D frozen) for the "
                         "first N steps before starting the adversarial game")
    ap.add_argument("--reuse-real-feats", action="store_true",
                    help="reuse D(real) taps from the D step for the G step's "
                         "feature-matching target (saves one D forward)")
    ap.add_argument("--concat-disc", action="store_true",
                    help="one D forward on [real; fake] in the D step "
                         "(identical math, bigger GEMMs)")
    ap.add_argument("--dense-groups", type=int, default=0,
                    help="run MSD grouped convs with groups <= N as dense "
                         "block-diagonal convs (identical math, MXU-dense)")
    ap.add_argument("--f-fold", type=int, default=0,
                    help="MRD F-axis space-to-depth factor (4 = 128-lane "
                         "convs; identical math, checkpoints interchange)")
    ap.add_argument("--mrd-complex", action="store_true",
                    help="phase-aware MRD: feed the compressed complex STFT "
                         "([Re, Im] of |S|^0.3 e^{i phi}) instead of "
                         "log|STFT|, so the adversarial gradient penalizes "
                         "incoherent phase (targets the ~1.8x phase-jitter "
                         "gap; MRDConfig.input_mode docs)")
    ap.add_argument("--bf16-disc", action="store_true",
                    help="bfloat16 compute in both discriminators (MXU-native)")
    ap.add_argument("--bf16-gen", action="store_true",
                    help="bfloat16 compute in the generator")
    ap.add_argument("--auto-mel-stats", action="store_true",
                    help="derive MelScaler (shift, scale) from the corpus")
    ap.add_argument("--debug-nans", action="store_true",
                    help="jax_debug_nans: fail loudly at the op that "
                         "first produces a NaN (numeric sanitizer; "
                         "disables async dispatch, debug runs only)")
    ap.add_argument("--augment", action="store_true",
                    help="random gain + polarity per segment "
                         "(data/dataset.py; corpus multiplier)")
    ap.add_argument("--guard", action="store_true",
                    help="online collapse detection (train/guard.py): stop "
                         "early, stamp STATUS, keep checkpoints, exit 0 — "
                         "instead of training a collapsed GAN to the end")
    ap.add_argument("--prefetch", type=int, default=2,
                    help="host-side batch prefetch depth (0 = synchronous)")
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="chain K training steps in one device dispatch "
                         "(lax.scan; numerically exact). Amortizes the "
                         "~40 ms/step dispatch RTT the per-step loop pays "
                         "(measured 75 -> ~40 ms/wall-step at K=8). "
                         "Requires K | log/ckpt/audio cadences; with "
                         "--mesh > 1 use --dp shard_map (the chain scans "
                         "inside the shard_map program).")
    ap.add_argument("--ram-budget-mb", type=int, default=0,
                    help="decoded-corpus RAM budget; 0 = load fully in memory")
    args = ap.parse_args()

    from music_synthesis_tpu.utils.env import (
        enable_persistent_compile_cache, maybe_force_cpu)

    maybe_force_cpu()
    enable_persistent_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    import dataclasses

    from music_synthesis_tpu.config import TINY, PipelineConfig, TrainConfig
    from music_synthesis_tpu.data.dataset import AudioDataset, make_synthetic_corpus
    from music_synthesis_tpu.data.prefetch import Prefetcher
    from music_synthesis_tpu.data.stats import compute_mel_stats
    from music_synthesis_tpu.parallel.dp import make_dp_stage2_step
    from music_synthesis_tpu.parallel.mesh import (
        make_mesh, replicate_state, shard_batch,
    )
    from music_synthesis_tpu.parallel.shard_map_dp import make_shardmap_stage2_step
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
    if args.bf16_gen:
        vocoder = dataclasses.replace(vocoder, compute_dtype="bfloat16")
    if args.init_scheme != "dcgan":
        # Calibrated so the default-preset generator starts at output rms
        # ~0.1 (tanh linear region; real-corpus segments are ~0.14): he
        # trunk, near-identity residual branches, moderated output conv.
        vocoder = dataclasses.replace(
            vocoder, init_scheme=args.init_scheme,
            res_init_gain=0.1, out_init_gain=0.003,
        )
    msd, mrd = base.msd, base.mrd
    if args.bf16_disc:
        msd = dataclasses.replace(msd, compute_dtype="bfloat16")
        mrd = dataclasses.replace(mrd, compute_dtype="bfloat16")
    if args.dense_groups:
        msd = dataclasses.replace(msd, dense_groups_max_g=args.dense_groups)
    if args.f_fold:
        mrd = dataclasses.replace(mrd, f_fold=args.f_fold)
    if args.mrd_complex:
        mrd = dataclasses.replace(mrd, input_mode="complex")
    cfg = dataclasses.replace(
        base,
        vocoder=vocoder,
        msd=msd,
        mrd=mrd,
        train=TrainConfig(
            batch_size=args.batch,
            segment_length=args.segment,
            augment=args.augment,
            mesh_shape=(args.mesh,),
            use_pallas_frontend=args.pallas_frontend,
            grad_clip_norm=args.grad_clip,
            ema_decay=args.ema,
            reuse_real_features=args.reuse_real_feats,
            concat_disc_batch=args.concat_disc,
            g_warmup_steps=args.g_warmup,
            gan_loss=args.gan_loss,
            lr_decay_rate=args.lr_decay,
            lr_decay_every=args.lr_decay_every,
            lambda_energy=args.lambda_energy,
            lambda_phase=args.lambda_phase,
            r1_gamma=args.r1_gamma,
            d_input_noise=args.d_noise,
            d_noise_decay_steps=args.noise_decay_steps,
            **({"lambda_stft": args.lambda_stft}
               if args.lambda_stft is not None else {}),
        ),
    )
    # Fail fast on configs that would surface as opaque XLA errors later.
    assert args.batch % max(args.mesh, 1) == 0, (
        f"--batch {args.batch} must be divisible by --mesh {args.mesh}"
    )
    assert cfg.frontend.n_mels == cfg.vocoder.n_mels, (
        f"frontend.n_mels ({cfg.frontend.n_mels}) != vocoder.n_mels "
        f"({cfg.vocoder.n_mels}); the conditioning would not type-check"
    )
    assert cfg.vocoder.hop_length == cfg.frontend.hop_length, (
        f"vocoder total upsampling ({cfg.vocoder.hop_length}) must equal the "
        f"front-end hop ({cfg.frontend.hop_length})"
    )
    if args.pallas_frontend and args.mesh > 1 and args.dp == "jit":
        sys.exit("--pallas-frontend with --mesh > 1 requires --dp shard_map "
                 "(pallas_call has no SPMD partitioning rule under jit "
                 "sharding; the shard_map step runs the kernel per-device)")
    if args.pallas_frontend and jax.devices()[0].platform != "cpu":
        # Preflight the compiled kernel so a Mosaic lowering regression
        # degrades this run to the (numerically identical, ~equal-speed at
        # training shapes) XLA oracle instead of killing an unattended
        # queued job hours in. Parity CI runs interpret-mode only, so this
        # is the first compiled execution a fresh environment sees.
        try:
            from music_synthesis_tpu.ops.pallas_frontend import (
                pallas_log_mel_for_vocoder,
            )
            probe = jax.jit(
                lambda w: pallas_log_mel_for_vocoder(w, cfg.frontend)
            )(jax.numpy.zeros((2, cfg.train.segment_length), "float32"))
            jax.block_until_ready(probe)
        except Exception as e:  # noqa: BLE001 — any lowering/runtime error
            print(f"PALLAS PREFLIGHT FAILED ({e!r}); "
                  "falling back to the pure-JAX oracle front-end")
            args.pallas_frontend = False
            cfg = dataclasses.replace(
                cfg,
                train=dataclasses.replace(
                    cfg.train, use_pallas_frontend=False
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
        if args.dp == "shard_map":
            step_fn = make_shardmap_stage2_step(cfg, mesh)
        else:
            step_fn = make_dp_stage2_step(cfg, mesh)
        prep = lambda x: shard_batch(jnp.asarray(x), mesh)
    else:
        step_fn = lambda s, w: stage2.train_step(cfg, s, w)
        prep = jnp.asarray

    # Vocoded-audio dump: one jitted program reused across dumps. Uses the
    # EMA generator when enabled (the weights a deployment would serve).
    gen, _ = stage2.make_models(cfg)

    @jax.jit
    def dump_fn(g_params, wav1):
        mel = stage2.conditioning_mel(wav1, cfg)
        return gen.apply({"params": g_params}, mel)

    logger = MetricsLogger(str(outdir / "metrics.jsonl"))
    guard = None
    if args.guard:
        from music_synthesis_tpu.train.guard import CollapseGuard
        guard = CollapseGuard()
    guard_reason = None
    k_disp = max(1, args.steps_per_dispatch)
    if k_disp > 1:
        for name, every in (("log", args.log_every),
                            ("ckpt", args.ckpt_every),
                            ("audio", args.audio_every)):
            assert every % k_disp == 0, \
                f"--{name}-every must be a multiple of --steps-per-dispatch"
        assert start_step % k_disp == 0 and args.steps % k_disp == 0, \
            "start/total steps must be multiples of --steps-per-dispatch"
        if args.mesh > 1:
            assert args.dp == "shard_map", \
                "--steps-per-dispatch with --mesh needs --dp shard_map"
            from music_synthesis_tpu.parallel.mesh import shard_chunk
            from music_synthesis_tpu.parallel.shard_map_dp import (
                make_shardmap_stage2_many,
            )
            step_fn = make_shardmap_stage2_many(cfg, mesh)
            prep = lambda x: shard_chunk(jnp.asarray(x), mesh)
        else:
            step_fn = lambda s, w: stage2.train_step_many(cfg, s, w)

    def make_batch(cs):
        if k_disp == 1:
            return prep(ds.sample_batch(
                cs, cfg.train.batch_size, cfg.train.seed))
        # One [K, B, L] chunk: the SAME per-step samples a stride-1 loop
        # would draw, so resume/replay order is unchanged.
        return prep(np.stack([
            np.asarray(ds.sample_batch(
                cs + i, cfg.train.batch_size, cfg.train.seed))
            for i in range(k_disp)
        ]))

    n_chunks = (args.steps - start_step) // k_disp
    if args.prefetch > 0:
        pref = Prefetcher(
            lambda ci: make_batch(start_step + ci * k_disp),
            0, n_chunks, depth=args.prefetch)
        batches = ((start_step + ci * k_disp, b) for ci, b in pref)
    else:
        batches = ((cs, make_batch(cs))
                   for cs in range(start_step, args.steps, k_disp))
    t_start = time.perf_counter()
    for cs, wav in batches:
        state, metrics = step_fn(state, wav)
        step = cs + k_disp - 1  # last step covered by this dispatch
        if (step + 1) % args.log_every == 0 or cs == start_step:
            logger.log(step + 1, metrics)
            if guard is not None:
                guard_reason = guard.update(
                    step + 1, {k: float(metrics[k])
                               for k in ("d_loss", "g_adv", "g_stft")})
                if guard_reason:
                    print(f"GUARD: {guard_reason}; stopping early",
                          flush=True)
                    (outdir / "STATUS").write_text(
                        f"guard-stopped at step {step + 1}: "
                        f"{guard_reason}\n")
                    break
        if (step + 1) % args.ckpt_every == 0:
            ckpt.save(step + 1, state)
        if (step + 1) % args.audio_every == 0:
            g = state.g_ema if state.g_ema is not None else state.g_params
            raw = ds.sample_batch(step, 1, cfg.train.seed)
            fake = dump_fn(g, jnp.asarray(raw))
            write_wav(outdir / f"vocoded_{step + 1:07d}.wav",
                      cfg.frontend.sample_rate, np.asarray(fake[0]))
            write_wav(outdir / f"real_{step + 1:07d}.wav",
                      cfg.frontend.sample_rate, raw[0])
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
