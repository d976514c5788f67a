#!/usr/bin/env python
"""Judged scenario 4 (BASELINE.json:10): two-stage end-to-end inference —
spectrogram generator -> chunked vocoder -> overlap-add waveform, fused into
one XLA program (the reference notebooks' public API).

  python scripts/generate.py --stage1 runs/stage1/ckpt --stage2 runs/stage2/ckpt \\
      --n 4 --out generated/
--stage1/--stage2 accept a training checkpoint dir, a model-zoo entry name
(e.g. ``vocoder_rich50k``), or a zoo entry directory; zoo entries override
the preset's model config with the one the weights were trained under, and
--ema1/--ema2 must match training when restoring raw checkpoint dirs (EMA
weights are served when present). Untrained (random-weight) generation works
without checkpoints for smoke use.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage1", default=None,
                    help="stage-1 ckpt dir or zoo entry")
    ap.add_argument("--stage2", default=None,
                    help="stage-2 ckpt dir or zoo entry")
    ap.add_argument("--ema1", type=float, default=0.0,
                    help="stage-1 EMA decay used in training (ckpt dirs only)")
    ap.add_argument("--ema2", type=float, default=0.0,
                    help="stage-2 EMA decay used in training (ckpt dirs only)")
    ap.add_argument("--n", type=int, default=4, help="clips to generate")
    ap.add_argument("--seconds", type=float, default=0.0,
                    help="when > one patch (~1.5 s), stitch N latent "
                         "patches via mel-domain COLA crossfade "
                         "(infer.generate_long) to this duration")
    ap.add_argument("--crossfade-frames", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--interpolate", default="",
                    help="'A:B' = slerp the long-form latent sequence from "
                         "seed A to seed B (smooth morph between two "
                         "compositions; infer/latent.py)")
    ap.add_argument("--walk-step", type=float, default=0.0,
                    help="smooth latent random walk: each patch slerps this "
                         "far toward a fresh draw (0 = i.i.d. patches)")
    ap.add_argument("--target-rms", type=float, default=0.0,
                    help="post-gain each clip to this RMS (0 = off). The "
                         "trained vocoder renders ~0.25-0.4x real level "
                         "(DESIGN.md §13 amplitude column); real corpus "
                         "segments run ~0.14 RMS, so 0.1 is a reasonable "
                         "listening level. Pure inference-time gain — "
                         "spectral shape is untouched.")
    ap.add_argument("--gl-refine", type=int, default=0,
                    help="N warm-started Griffin-Lim consistency "
                         "projections of the vocoded audio against the "
                         "stage-1 mel (ops/griffin_lim.py; 0 = off). "
                         "Measured trade in DESIGN.md §19.")
    ap.add_argument("--out", default="generated")
    ap.add_argument("--report", action="store_true",
                    help="also write a listenable HTML report")
    ap.add_argument("--device", choices=["cpu", "default"], default="default")
    ap.add_argument("--preset", choices=["default", "fast", "tiny"],
                    default="default",
                    help="fast = iSTFT-head flagship (see config.py)")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from music_synthesis_tpu.config import (E2E_INFERENCE,
        E2E_INFERENCE_FAST, TINY)
    from music_synthesis_tpu.infer.generate import generate
    from music_synthesis_tpu.train import stage1, stage2
    from music_synthesis_tpu.train.checkpoint import CheckpointManager
    from music_synthesis_tpu.utils.wav import write_wav

    cfg = {"tiny": TINY, "fast": E2E_INFERENCE_FAST,
           "default": E2E_INFERENCE}[args.preset]
    key = jax.random.PRNGKey(args.seed)
    print(f"device: {jax.devices()[0].platform}; building generators...",
          flush=True)
    # Only generator params are needed: init them directly. Checkpoints are
    # restored against eval_shape templates (no discriminator/optimizer
    # compute ever runs here).
    from music_synthesis_tpu.models.specgan import SpectrogramGenerator
    from music_synthesis_tpu.models.vocoder import Vocoder

    import jax.numpy as jnp
    import types

    from music_synthesis_tpu.train.checkpoint import abstract_state

    import dataclasses

    from music_synthesis_tpu import zoo

    import json

    from music_synthesis_tpu.config import config_from_dict

    scaler_sources: dict[int, tuple] = {}

    def load_generator(src: str, stage: int, ema: float, cfg):
        """src = zoo entry (name or dir) | checkpoint dir. Returns
        (params, cfg) with cfg's model config — and, when the source carries
        them, mel_scaler and frontend — overridden to match training
        (conditioning must reproduce the training-time normalization;
        round-2 advisor finding on this script)."""
        p = Path(src)
        is_zoo = (p / "card.json").exists() or (
            not p.exists() and (zoo.ZOO_ROOT / src / "card.json").exists()
        )
        field = "specgan" if stage == 1 else "vocoder"
        if is_zoo:
            e = zoo.load_pretrained(src)
            want = "specgan" if stage == 1 else "vocoder"
            assert e.kind == want, f"{src} is a {e.kind}, need {want}"
            print(f"stage {stage}: zoo entry {e.name} "
                  f"({e.card['n_params'] / 1e6:.2f}M params; "
                  f"{e.card.get('notes', '')})")
            cfg = dataclasses.replace(cfg, **{field: e.config})
            if e.mel_scaler is not None:
                cfg = dataclasses.replace(cfg, mel_scaler=e.mel_scaler)
                scaler_sources[stage] = (e.name, e.mel_scaler)
            if e.frontend is not None:
                cfg = dataclasses.replace(cfg, frontend=e.frontend)
            return e.params, cfg
        # Checkpoint dir: prefer the run's exact config.json (sibling of
        # ckpt/) — it shapes the optimizer-state pytree orbax restores into
        # (lr-decay/grad-clip runs have extra optax chain state).
        run_cfg = None
        for cand in (p / "config.json", p.parent / "config.json"):
            if cand.exists():
                run_cfg = config_from_dict(json.loads(cand.read_text()))
                break
        if run_cfg is not None:
            c = run_cfg
            cfg = dataclasses.replace(
                cfg, **{field: getattr(run_cfg, field)},
                mel_scaler=run_cfg.mel_scaler, frontend=run_cfg.frontend,
            )
            scaler_sources[stage] = (str(cand), run_cfg.mel_scaler)
        else:
            c = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, ema_decay=ema))
        st = CheckpointManager(src).restore(abstract_state(c, stage=stage))
        params = st.g_ema if st.g_ema is not None else st.g_params
        which = "ema" if st.g_ema is not None else "raw"
        print(f"stage {stage}: checkpoint {src} @ step {int(st.step)} ({which})")
        return params, cfg

    if args.stage1:
        g1, cfg = load_generator(args.stage1, 1, args.ema1, cfg)
    else:
        g1 = SpectrogramGenerator(cfg.specgan).init(
            jax.random.PRNGKey(0), jnp.zeros((1, cfg.specgan.latent_dim))
        )["params"]
    if args.stage2:
        g2, cfg = load_generator(args.stage2, 2, args.ema2, cfg)
    else:
        g2 = Vocoder(cfg.vocoder).init(
            jax.random.PRNGKey(1), jnp.zeros((1, 8, cfg.vocoder.n_mels))
        )["params"]
    if len(scaler_sources) == 2:
        (n1, m1), (n2, m2) = scaler_sources[1], scaler_sources[2]
        if (m1.shift, m1.scale) != (m2.shift, m2.scale):
            print(f"WARNING: stage-1 ({n1}: shift={m1.shift:.3f} "
                  f"scale={m1.scale:.3f}) and stage-2 ({n2}: "
                  f"shift={m2.shift:.3f} scale={m2.scale:.3f}) were trained "
                  f"with DIFFERENT mel scalers — the vocoder's conditioning "
                  f"will be mis-normalized. Retrain or re-export with "
                  f"matching corpus stats.")
    s1 = types.SimpleNamespace(g_params=g1)
    s2 = types.SimpleNamespace(g_params=g2)
    print("generators ready; compiling fused two-stage program...", flush=True)

    patch_s = (cfg.specgan.n_frames * cfg.frontend.hop_length
               / cfg.frontend.sample_rate)
    if args.seconds > patch_s:
        # Long-form composition: N crossfaded latent patches, one program.
        from music_synthesis_tpu.infer.generate import generate_long

        if args.crossfade_frames >= cfg.specgan.n_frames:
            raise SystemExit(
                f"--crossfade-frames ({args.crossfade_frames}) must be < "
                f"the stage-1 patch length ({cfg.specgan.n_frames} frames); "
                f"a crossfade spanning the whole patch leaves no new "
                f"content per patch.")
        hop_t = cfg.specgan.n_frames - args.crossfade_frames
        frames = int(args.seconds * cfg.frontend.sample_rate
                     / cfg.frontend.hop_length)
        n_patches = max(1, -(-(frames - args.crossfade_frames) // hop_t))
        print(f"long-form: {n_patches} patches x {cfg.specgan.n_frames} "
              f"frames, crossfade {args.crossfade_frames}")
        if args.interpolate:
            from music_synthesis_tpu.infer.latent import latent_path
            sa, sb = (int(s) for s in args.interpolate.split(":"))
            za = jax.random.normal(
                jax.random.PRNGKey(sa), (args.n, cfg.specgan.latent_dim))
            zb = jax.random.normal(
                jax.random.PRNGKey(sb), (args.n, cfg.specgan.latent_dim))
            z = latent_path(za, zb, max(2, n_patches))
            print(f"latent slerp path: seed {sa} -> seed {sb}")
        elif args.walk_step > 0:
            from music_synthesis_tpu.infer.latent import latent_walk
            z = latent_walk(key, args.n, n_patches,
                            cfg.specgan.latent_dim, step=args.walk_step)
            print(f"latent random walk: step {args.walk_step}")
        else:
            z = jax.random.normal(
                key, (args.n, n_patches, cfg.specgan.latent_dim))
        if args.gl_refine > 0:
            from music_synthesis_tpu.infer.generate import (
                generate_long_refined,
            )

            fn = jax.jit(generate_long_refined, static_argnums=(0, 4, 5))
            call = lambda zi: fn(cfg, s1.g_params, s2.g_params, zi,
                                 args.crossfade_frames, args.gl_refine)
        else:
            fn = jax.jit(generate_long, static_argnums=(0, 4))
            call = lambda zi: fn(cfg, s1.g_params, s2.g_params, zi,
                                 args.crossfade_frames)
    else:
        z = jax.random.normal(key, (args.n, cfg.specgan.latent_dim))
        if args.gl_refine > 0:
            from music_synthesis_tpu.infer.generate import generate_refined

            fn = jax.jit(generate_refined, static_argnums=(0, 4))
            call = lambda zi: fn(cfg, s1.g_params, s2.g_params, zi,
                                 args.gl_refine)
        else:
            fn = jax.jit(generate, static_argnums=0)
            call = lambda zi: fn(cfg, s1.g_params, s2.g_params, zi)
    t0 = time.perf_counter()
    wav = call(z)
    wav.block_until_ready()
    compile_s = time.perf_counter() - t0
    # Steady-state timing over fresh latents (avoids any same-input reuse).
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        zi = jax.random.normal(jax.random.fold_in(key, i), z.shape)
        wav = call(zi)
    wav.block_until_ready()
    run_s = (time.perf_counter() - t0) / iters
    audio_s = wav.shape[0] * wav.shape[1] / cfg.frontend.sample_rate
    print(f"generated {wav.shape} ({audio_s:.2f}s audio): compile {compile_s:.1f}s,"
          f" steady-state {run_s * 1e3:.1f} ms -> RTF {audio_s / run_s:.0f}x")

    if args.target_rms > 0:
        rms = np.sqrt(np.mean(np.square(np.asarray(wav)), axis=1,
                              keepdims=True))
        # Cap the boost at 100x: near-silent clips (e.g. random weights)
        # carry no signal worth amplifying into the clip ceiling.
        gains = np.minimum(args.target_rms / np.maximum(rms, 1e-12), 100.0)
        wav = np.clip(np.asarray(wav) * gains, -1.0, 1.0)
        print(f"gain calibration: per-clip x{np.min(gains):.2f}-"
              f"x{np.max(gains):.2f} -> RMS {args.target_rms}")

    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    for i in range(args.n):
        p = outdir / f"sample_{i:03d}.wav"
        write_wav(p, cfg.frontend.sample_rate, np.asarray(wav[i]))
        print(f"wrote {p}")

    if args.report:
        from music_synthesis_tpu.models.specgan import SpectrogramGenerator
        from music_synthesis_tpu.utils.report import write_report

        z2 = z if z.ndim == 2 else z[:, 0]  # first patch per long-form clip
        mel = SpectrogramGenerator(cfg.specgan).apply(
            {"params": s1.g_params}, z2
        )
        rp = write_report(
            outdir / "report.html",
            "two-stage generation",
            [(f"sample {i}", np.asarray(wav[i])) for i in range(args.n)],
            cfg.frontend.sample_rate,
            [np.asarray(mel[i]) for i in range(args.n)],
            metrics={"rtf_x_realtime": audio_s / run_s},
        )
        print(f"wrote {rp}")


if __name__ == "__main__":
    main()
