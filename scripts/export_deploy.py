#!/usr/bin/env python
"""Export a deployment artifact (.msx) from zoo entries (deploy.py).

Self-contained StableHLO programs with the trained weights baked in —
the serving host needs JAX + the artifact, not the framework. Lowering
is cross-platform: this script runs on CPU (never touches the TPU
tunnel) while targeting ``--platforms tpu,cpu``.

Examples:
    # Copy-synthesis vocoder, symbolic batch, 64-frame serving bucket:
    python scripts/export_deploy.py --zoo vocoder_istft --frames 64

    # Full two-stage pipeline (latent -> waveform), fixed batch 8:
    python scripts/export_deploy.py --pipeline specgan_flux vocoder_istft \
        --batch 8 --out deploy/two_stage.msx
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--zoo", metavar="VOCODER_ENTRY",
                      help="export copy-synthesis for one vocoder zoo entry")
    mode.add_argument("--pipeline", nargs=2,
                      metavar=("SPECGAN_ENTRY", "VOCODER_ENTRY"),
                      help="export the fused two-stage latent->wav pipeline")
    ap.add_argument("--frames", type=int, default=64,
                    help="mel frames per request (vocoder mode; serving "
                         "bucket size, static for MXU-shaped conv tiling)")
    ap.add_argument("--batch", default="poly",
                    help="'poly' (symbolic batch dim, default) or an int")
    ap.add_argument("--platforms", default="tpu,cpu",
                    help="comma-separated lowering targets")
    ap.add_argument("--out", default=None,
                    help="output path (default deploy/<entry>.msx)")
    ap.add_argument("--check", action="store_true",
                    help="reload the artifact and run it on CPU "
                         "(requires 'cpu' in --platforms)")
    args = ap.parse_args()

    import jax

    # Cross-platform lowering runs entirely on the host — never open a
    # TPU client from this script (one-client rule, ROADMAP infra notes).
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from music_synthesis_tpu import deploy, zoo
    from music_synthesis_tpu.config import PipelineConfig

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    batch = None if args.batch == "poly" else int(args.batch)

    if args.zoo:
        entry = zoo.load_pretrained(args.zoo)
        if entry.kind != "vocoder":
            raise SystemExit(f"--zoo wants a vocoder entry, got {entry.kind}")
        exported, meta = deploy.vocoder_artifact(
            entry.params, entry.config, n_frames=args.frames, batch=batch,
            platforms=platforms,
            provenance={"zoo": entry.name, "metrics": entry.card["metrics"]},
        )
        default_out = f"deploy/{entry.name}_f{args.frames}.msx"
    else:
        s1 = zoo.load_pretrained(args.pipeline[0])
        s2 = zoo.load_pretrained(args.pipeline[1])
        if (s1.kind, s2.kind) != ("specgan", "vocoder"):
            raise SystemExit("--pipeline wants SPECGAN_ENTRY VOCODER_ENTRY "
                             f"in that order, got {s1.kind}/{s2.kind}")
        cfg = PipelineConfig(
            specgan=s1.config, vocoder=s2.config,
            **({"frontend": s2.frontend} if s2.frontend else {}),
            **({"mel_scaler": s2.mel_scaler} if s2.mel_scaler else {}),
        )
        exported, meta = deploy.pipeline_artifact(
            cfg, s1.params, s2.params, batch=batch, platforms=platforms,
            provenance={"specgan_zoo": s1.name, "vocoder_zoo": s2.name},
        )
        default_out = f"deploy/{s1.name}__{s2.name}.msx"

    out = deploy.save_artifact(args.out or default_out, exported, meta)
    size_mb = out.stat().st_size / 1e6
    print(f"wrote {out} ({size_mb:.1f} MB)")
    print(f"  kind={meta['kind']} platforms={meta['platforms']} "
          f"n_params_baked={meta['n_params_baked']:,}")
    print(f"  inputs={meta['inputs']} outputs={meta['outputs']}")

    if args.check:
        if "cpu" not in platforms:
            raise SystemExit("--check needs 'cpu' in --platforms")
        art = deploy.load_artifact(out)
        shape = [2 if d == "b" else d for d in art.meta["inputs"][0]["shape"]]
        x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        y = np.asarray(art(x))
        if not np.isfinite(y).all():
            raise SystemExit("check FAILED: non-finite output")
        print(f"check OK: {list(x.shape)} -> {list(y.shape)}, "
              f"output rms {float(np.sqrt((y ** 2).mean())):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
