#!/usr/bin/env python
"""Judged scenario 5 (BASELINE.json:11): data-parallel two-stage GAN
training — stage-1 composer and stage-2 vocoder trained over the same
corpus on one mesh, with multi-res STFT + feature-matching losses.

The two stages are separate models trained separately (they are not a
pipeline-parallel schedule — SURVEY.md §2b); this runner trains them
back-to-back and writes one combined report at the end.

  python scripts/train_two_stage.py --steps 500 --mesh 8 --outdir runs/two_stage
"""

import argparse
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--mesh", type=int, default=1)
    ap.add_argument("--outdir", default="runs/two_stage")
    ap.add_argument("--preset", choices=["default", "tiny"], default="default")
    args = ap.parse_args()

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    corpus = args.corpus
    if corpus is None:
        from music_synthesis_tpu.data.dataset import make_synthetic_corpus

        corpus = str(outdir / "synthetic_corpus")
        make_synthetic_corpus(corpus, n_clips=8, seconds=4.0)
        print(f"no --corpus; wrote synthetic corpus to {corpus}")

    here = Path(__file__).resolve().parent
    base = [sys.executable]
    common = ["--corpus", str(corpus), "--steps", str(args.steps),
              "--batch", str(args.batch), "--mesh", str(args.mesh),
              "--preset", args.preset]
    rc = subprocess.call(
        base + [str(here / "train_stage1.py"), *common,
                "--outdir", str(outdir / "stage1")]
    )
    if rc != 0:
        sys.exit(rc)
    rc = subprocess.call(
        base + [str(here / "train_stage2.py"), *common,
                "--outdir", str(outdir / "stage2")]
    )
    if rc != 0:
        sys.exit(rc)

    # Final artifact: generate from the two trained stages + HTML report.
    rc = subprocess.call(
        base + [str(here / "generate.py"),
                "--stage1", str(outdir / "stage1" / "ckpt"),
                "--stage2", str(outdir / "stage2" / "ckpt"),
                "--preset", args.preset,
                "--n", "4", "--out", str(outdir / "samples"), "--report"]
    )
    sys.exit(rc)


if __name__ == "__main__":
    main()
