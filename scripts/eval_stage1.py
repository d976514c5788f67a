#!/usr/bin/env python
"""Stage-1 composer evaluation: distributional match of generated mels.

There is no per-sample ground truth for novel generation, so this measures
how well the generated log-mel distribution matches the real corpus patches
(SURVEY.md C6 / §3.3; the genre's quantitative proxy next to listening):

* per-mel-bin mean/std L2 gap (marginal amplitude structure)
* temporal flux (mean |frame-to-frame delta|) gap (does it *move* like
  music rather than freeze or flicker)
* mel-covariance eigenspectrum gap (broad correlational structure)

  python scripts/eval_stage1.py --run runs/stage1_composer_40k \
      --corpus runs/corpus_rich [--zoo specgan_rich]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=None, help="training outdir (with ckpt/)")
    ap.add_argument("--zoo", default=None, help="zoo entry name instead")
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--n", type=int, default=64, help="patches per side")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="default: RUN/eval_stage1")
    args = ap.parse_args()

    from music_synthesis_tpu.utils.env import maybe_force_cpu

    maybe_force_cpu()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from music_synthesis_tpu.config import config_from_dict
    from music_synthesis_tpu.data.dataset import AudioDataset
    from music_synthesis_tpu.models.specgan import SpectrogramGenerator
    from music_synthesis_tpu.ops.frontend import log_mel_for_vocoder
    from music_synthesis_tpu.train import stage1
    from music_synthesis_tpu.train.checkpoint import (
        CheckpointManager, abstract_state,
    )
    from music_synthesis_tpu import zoo

    if args.zoo:
        e = zoo.load_pretrained(args.zoo)
        assert e.kind == "specgan", e.kind
        import dataclasses

        from music_synthesis_tpu.config import PipelineConfig

        cfg = PipelineConfig(specgan=e.config)
        if e.frontend is not None:
            cfg = dataclasses.replace(cfg, frontend=e.frontend)
        if e.mel_scaler is not None:
            cfg = dataclasses.replace(cfg, mel_scaler=e.mel_scaler)
        g = e.params
        step = e.card["metrics"].get("checkpoint_step", -1)
        out = Path(args.out or f"runs/eval_{args.zoo}")
    else:
        run = Path(args.run)
        cfg = config_from_dict(json.loads((run / "config.json").read_text()))
        state = CheckpointManager(run / "ckpt").restore(
            abstract_state(cfg, stage=1))
        step = int(state.step)
        g = state.g_ema if state.g_ema is not None else state.g_params
        out = Path(args.out or (run / "eval_stage1"))
    out.mkdir(parents=True, exist_ok=True)

    s = cfg.specgan
    gen = SpectrogramGenerator(s)
    key = jax.random.PRNGKey(args.seed)
    z = jax.random.normal(key, (args.n, s.latent_dim))
    fake = np.asarray(jax.jit(
        lambda zz: gen.apply({"params": g}, zz))(z))  # [N, T, M], normalized

    seg = s.n_frames * cfg.frontend.hop_length
    ds = AudioDataset(args.corpus, sample_rate=cfg.frontend.sample_rate,
                      segment_length=seg)
    wav = jnp.asarray(ds.sample_batch(2**28, args.n, seed=4321))
    mel = log_mel_for_vocoder(wav, cfg.frontend)
    real = np.asarray(
        (mel - cfg.mel_scaler.shift) / cfg.mel_scaler.scale)

    def stats(x):
        flat = x.reshape(-1, x.shape[-1])  # [N*T, M]
        mean = flat.mean(0)
        std = flat.std(0)
        flux = np.abs(np.diff(x, axis=1)).mean()
        cov = np.cov(flat.T)
        eig = np.sort(np.linalg.eigvalsh(cov))[::-1][:32]
        return mean, std, flux, eig

    rm, rs, rflux, reig = stats(real)
    fm, fs, fflux, feig = stats(fake)
    metrics = {
        "checkpoint_step": step,
        "n_patches": args.n,
        "bin_mean_l2": float(np.linalg.norm(fm - rm) / np.sqrt(len(rm))),
        "bin_std_l2": float(np.linalg.norm(fs - rs) / np.sqrt(len(rs))),
        "real_flux": float(rflux),
        "fake_flux": float(fflux),
        "flux_ratio": float(fflux / max(rflux, 1e-9)),
        "eig_log_l2": float(np.linalg.norm(
            np.log(np.maximum(feig, 1e-9)) - np.log(np.maximum(reig, 1e-9))
        ) / np.sqrt(len(reig))),
        "fake_rms": float(np.sqrt((fake ** 2).mean())),
        "real_rms": float(np.sqrt((real ** 2).mean())),
    }
    (out / "eval.json").write_text(json.dumps(metrics, indent=1))
    print(json.dumps(metrics, indent=1))

    # Calibration anchors so the numbers are interpretable: a random-weights
    # generator and white noise in mel space, same protocol.
    import dataclasses as _dc

    rnd_params = gen.init(jax.random.PRNGKey(99), z[:1])["params"]
    rnd = np.asarray(gen.apply({"params": rnd_params}, z))
    noise = np.random.default_rng(0).normal(
        0, real.std(), size=real.shape).astype(np.float32)
    for name, x in (("random_weights", rnd), ("white_noise", noise)):
        m2 = {}
        xm, xs, xflux, xeig = stats(x)
        m2["bin_mean_l2"] = float(
            np.linalg.norm(xm - rm) / np.sqrt(len(rm)))
        m2["bin_std_l2"] = float(np.linalg.norm(xs - rs) / np.sqrt(len(rs)))
        m2["flux_ratio"] = float(xflux / max(rflux, 1e-9))
        m2["eig_log_l2"] = float(np.linalg.norm(
            np.log(np.maximum(xeig, 1e-9)) - np.log(np.maximum(reig, 1e-9))
        ) / np.sqrt(len(reig)))
        print(f"anchor[{name}]: {json.dumps(m2)}")


if __name__ == "__main__":
    main()
