#!/usr/bin/env python
"""Copy-synthesis fidelity evaluation of a trained stage-2 checkpoint
(VERDICT r1 next-round #1; BASELINE.json:2 proxy).

Samples held-out segments from the corpus, resynthesizes each from its own
log-mel conditioning through the trained vocoder (EMA weights when present),
and reports the multi-res STFT distance — the judged parity metric — plus an
HTML report with paired real/resynth audio.

  python scripts/eval_checkpoint.py --run runs/stage2_50k \
      --corpus runs/corpus_rich --out runs/stage2_50k/eval
"""

import argparse
import dataclasses
import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=None, help="training outdir (with ckpt/)")
    ap.add_argument("--zoo", default=None,
                    help="evaluate a shipped zoo vocoder entry instead of a "
                         "run checkpoint (the entry's own config/frontend/"
                         "mel-scaler are used; needed when run ckpts are "
                         "gone but the exported weights survive)")
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", default=None, help="default: RUN/eval")
    ap.add_argument("--preset", choices=["default", "tiny"], default="default")
    ap.add_argument("--head", choices=["waveform", "istft"], default="waveform")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="must match training (controls checkpoint structure)")
    ap.add_argument("--n-clips", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--step", type=int, default=None, help="ckpt step (latest)")
    ap.add_argument("--gl-anchor", action="store_true",
                    help="also report the Griffin-Lim model-free anchor "
                         "distance on the same held-out mels")
    ap.add_argument("--gl-refine", type=int, default=0,
                    help="also report the vocoder output refined by N "
                         "warm-started Griffin-Lim consistency projections "
                         "(ops/griffin_lim.py::griffin_lim_refine)")
    args = ap.parse_args()

    from music_synthesis_tpu.utils.env import (
        enable_persistent_compile_cache, maybe_force_cpu)

    maybe_force_cpu()
    enable_persistent_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from music_synthesis_tpu.config import (
        MelScaler, TINY, PipelineConfig, TrainConfig,
    )
    from music_synthesis_tpu.data.dataset import AudioDataset
    from music_synthesis_tpu.losses.stft_loss import multires_stft_loss
    from music_synthesis_tpu.models.vocoder import Vocoder
    from music_synthesis_tpu.train import stage2
    from music_synthesis_tpu.train.checkpoint import CheckpointManager, abstract_state
    from music_synthesis_tpu.utils.report import write_report
    from music_synthesis_tpu.utils.wav import write_wav

    if (args.run is None) == (args.zoo is None):
        ap.error("exactly one of --run / --zoo is required")

    if args.zoo is not None:
        from music_synthesis_tpu import zoo as zoo_mod

        entry = zoo_mod.load_pretrained(args.zoo)
        if entry.kind != "vocoder":
            ap.error(f"--zoo entry {args.zoo!r} is kind={entry.kind!r}; "
                     "copy-synthesis eval needs a vocoder")
        out = (Path(args.out) if args.out
               else Path("runs") / f"zoo_eval_{args.zoo}")
        out.mkdir(parents=True, exist_ok=True)
        # The card pins vocoder/frontend/mel-scaler; the judged-metric
        # config (stft_loss resolutions) comes from the preset.
        cfg = TINY if args.preset == "tiny" else PipelineConfig()
        cfg = dataclasses.replace(
            cfg, vocoder=entry.config,
            frontend=entry.frontend or cfg.frontend,
            mel_scaler=entry.mel_scaler or cfg.mel_scaler,
        )
        if entry.mel_scaler is not None:
            print(f"using zoo mel scaler: shift={entry.mel_scaler.shift} "
                  f"scale={entry.mel_scaler.scale}")
        g = entry.params
        step = int(entry.card.get("metrics", {}).get("step", 0) or 0)
        which = "zoo"
        print(f"zoo entry {args.zoo} ({entry.card.get('n_params')} params)")
        return eval_body(args, cfg, g, step, which, out)

    run = Path(args.run)
    out = Path(args.out) if args.out else run / "eval"
    out.mkdir(parents=True, exist_ok=True)

    cfg_file = run / "config.json"
    if cfg_file.exists():
        # Exact provenance (round-3): the config the run trained with,
        # including optimizer-state-shaping fields (lr decay / grad clip)
        # and head/init settings. CLI config flags are ignored.
        from music_synthesis_tpu.config import config_from_dict

        cfg = config_from_dict(json.loads(cfg_file.read_text()))
        print(f"config from {cfg_file}")
        if jax.default_backend() != "tpu" and cfg.train.use_pallas_frontend:
            # Off-TPU the kernel would run in (slow) interpret mode; the
            # pure-JAX oracle is parity-tested against it — use it here.
            cfg = dataclasses.replace(
                cfg, train=dataclasses.replace(
                    cfg.train, use_pallas_frontend=False)
            )
    else:
        base = TINY if args.preset == "tiny" else PipelineConfig()
        vocoder = base.vocoder
        if args.head == "istft":
            vocoder = dataclasses.replace(
                vocoder, head="istft", upsample_factors=(8, 8),
                istft_n_fft=16, istft_hop=4,
            )
        cfg = dataclasses.replace(
            base, vocoder=vocoder,
            train=dataclasses.replace(base.train, ema_decay=args.ema),
        )
    stats_file = run / "mel_stats.json"
    if stats_file.exists():
        s = json.loads(stats_file.read_text())
        cfg = dataclasses.replace(
            cfg, mel_scaler=MelScaler(shift=s["shift"], scale=s["scale"])
        )
        print(f"using corpus mel stats: {s}")

    ckpt = CheckpointManager(run / "ckpt")
    state = ckpt.restore(abstract_state(cfg, stage=2), step=args.step)
    step = int(state.step)
    g = state.g_ema if state.g_ema is not None else state.g_params
    which = "ema" if state.g_ema is not None else "raw"
    print(f"checkpoint step {step} ({which} generator weights)")
    eval_body(args, cfg, g, step, which, out)


def eval_body(args, cfg, g, step, which, out) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from music_synthesis_tpu.data.dataset import AudioDataset
    from music_synthesis_tpu.losses.stft_loss import multires_stft_loss
    from music_synthesis_tpu.models.vocoder import Vocoder
    from music_synthesis_tpu.train import stage2
    from music_synthesis_tpu.utils.report import write_report
    from music_synthesis_tpu.utils.wav import write_wav

    seg = int(args.seconds * cfg.frontend.sample_rate)
    seg = seg // cfg.frontend.hop_length * cfg.frontend.hop_length
    ds = AudioDataset(args.corpus, sample_rate=cfg.frontend.sample_rate,
                      segment_length=seg)

    voc = Vocoder(cfg.vocoder)

    @jax.jit
    def copy_synth(wav_in):
        mel = stage2.conditioning_mel(wav_in, cfg)
        return voc.apply({"params": g}, mel)

    dist_fn = jax.jit(lambda a, b: multires_stft_loss(a, b, cfg.stft_loss))

    # Phase health (ops/phase.py): the judged distance is magnitude-only
    # and provably blind to Griffin-Lim-style phase smear (test_phase.py);
    # report jitter(resynth)/jitter(real) alongside it (~1.0 is healthy).
    from music_synthesis_tpu.ops.phase import phase_jitter_ratio

    jitter_fn = jax.jit(functools.partial(
        phase_jitter_ratio,
        n_fft=cfg.frontend.n_fft, hop_length=cfg.frontend.hop_length))

    # Second fidelity axis (ops/cepstrum.py): mel-cepstral distortion in dB
    # compares low-order spectral-envelope shape rather than bin-wise
    # magnitudes; standard in the vocoder literature (PAPERS.md).
    from music_synthesis_tpu.ops.cepstrum import mcd

    mcd_fn = jax.jit(functools.partial(mcd, cfg=cfg.frontend))

    refine_fn = None
    if args.gl_refine:
        from music_synthesis_tpu.ops.frontend import log_mel_for_vocoder
        from music_synthesis_tpu.ops.griffin_lim import refine_with_log_mel

        @jax.jit
        def refine_fn(wav_voc, wav_in):
            # Refine against the REAL clip's raw log-mel — the same
            # conditioning the vocoder consumed (copy-synthesis pairs).
            return refine_with_log_mel(
                wav_voc, log_mel_for_vocoder(wav_in, cfg.frontend),
                cfg.frontend, n_iter=args.gl_refine)

    gl_fn = None
    if args.gl_anchor:
        from music_synthesis_tpu.ops.griffin_lim import invert_log_mel
        from music_synthesis_tpu.ops.frontend import log_mel_for_vocoder

        @jax.jit
        def gl_fn(wav_in):
            return invert_log_mel(
                log_mel_for_vocoder(wav_in, cfg.frontend), cfg.frontend, 48)

    clips, dists, rms_ratios, gl_dists = [], [], [], []
    jitters, gl_jitters = [], []
    ref_dists, ref_jitters = [], []
    mcds, gl_mcds = [], []
    for i in range(args.n_clips):
        # Held-out step indices far from any training step.
        real = ds.sample_batch(2**29 + i, 1, seed=1234)
        x = jnp.asarray(real)
        y = copy_synth(x)
        d = float(dist_fn(y, x))
        dists.append(d)
        jitters.append(float(jitter_fn(y, x)))
        mcds.append(float(mcd_fn(y, x)))
        # Amplitude health: the spectral distance is insensitive to broad
        # level errors (ROADMAP quality lead: outputs ran ~10x quiet), so
        # report the resynth/real RMS ratio alongside it.
        rms_ratios.append(float(np.sqrt(
            (np.mean(np.square(np.asarray(y))) + 1e-12)
            / (np.mean(np.square(real)) + 1e-12))))
        write_wav(out / f"real_{i:02d}.wav", cfg.frontend.sample_rate, real[0])
        write_wav(out / f"resynth_{i:02d}.wav", cfg.frontend.sample_rate,
                  np.asarray(y[0]))
        clips.append((f"real {i}", real[0]))
        clips.append((f"resynth {i} (stft_dist={d:.4f})", np.asarray(y[0])))
        if refine_fn is not None:
            y_ref = refine_fn(y, x)[:, : x.shape[1]]
            ref_dists.append(float(dist_fn(y_ref, x)))
            ref_jitters.append(float(jitter_fn(y_ref, x)))
            write_wav(out / f"refined_{i:02d}.wav",
                      cfg.frontend.sample_rate, np.asarray(y_ref[0]))
            clips.append((f"refined {i} (n_iter={args.gl_refine}, "
                          f"stft_dist={ref_dists[-1]:.4f})",
                          np.asarray(y_ref[0])))
        if gl_fn is not None:
            # Model-free anchor: Griffin-Lim on the SAME mel. Note it
            # optimizes magnitude fidelity directly (the very thing this
            # metric scores) at ~1000x the inference cost and with phase
            # artifacts the metric is blind to — a bound on phase-less
            # inversion, not a better vocoder.
            y_gl = gl_fn(x)[:, : x.shape[1]]
            gl_dists.append(float(dist_fn(y_gl, x)))
            gl_jitters.append(float(jitter_fn(y_gl, x)))
            gl_mcds.append(float(mcd_fn(y_gl, x)))
            clips.append((f"griffin-lim {i} "
                          f"(stft_dist={gl_dists[-1]:.4f})",
                          np.asarray(y_gl[0])))
        print(f"clip {i}: multires_stft_distance = {d:.4f}")

    metrics = {
        "checkpoint_step": step,
        "copy_synthesis_multires_stft_distance_mean": float(np.mean(dists)),
        "copy_synthesis_multires_stft_distance_std": float(np.std(dists)),
        "resynth_rms_over_real_rms_mean": float(np.mean(rms_ratios)),
        "phase_jitter_ratio_mean": float(np.mean(jitters)),
        "mcd_db_mean": float(np.mean(mcds)),
        "n_clips": args.n_clips,
        "generator_weights": 0.0 if which == "raw" else 1.0,
        # Per-clip values: the held-out clips are deterministic (seed=1234,
        # step 2**29+i), so evals of different checkpoints on the same corpus
        # score the SAME clips — persisting them enables paired-delta
        # comparisons (much tighter than comparing 8-clip means).
        "per_clip": {
            "dist": dists,
            "jitter": jitters,
            "mcd_db": mcds,
            "rms_ratio": rms_ratios,
        },
    }
    if ref_dists:
        metrics["gl_refine_n_iter"] = args.gl_refine
        metrics["gl_refined_distance_mean"] = float(np.mean(ref_dists))
        metrics["gl_refined_phase_jitter_ratio_mean"] = float(
            np.mean(ref_jitters))
    if gl_dists:
        metrics["griffin_lim_anchor_distance_mean"] = float(
            np.mean(gl_dists))
        metrics["griffin_lim_phase_jitter_ratio_mean"] = float(
            np.mean(gl_jitters))
        metrics["griffin_lim_mcd_db_mean"] = float(np.mean(gl_mcds))
        metrics["per_clip"]["gl_dist"] = gl_dists
        metrics["per_clip"]["gl_jitter"] = gl_jitters
    (out / "eval.json").write_text(json.dumps(metrics, indent=1))
    write_report(out / "report.html",
                 f"copy-synthesis eval @ step {step} ({which})",
                 clips, cfg.frontend.sample_rate, metrics=metrics)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
