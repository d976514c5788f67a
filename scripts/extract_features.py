#!/usr/bin/env python
"""Judged scenario 1 (BASELINE.json:7): log-mel extraction of one 22.05 kHz
WAV clip (n_fft=1024, hop=256) on CPU.

Usage: python scripts/extract_features.py [clip.wav] [--out mel.npy]
Without a clip argument, a deterministic synthetic clip is generated first.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("clip", nargs="?", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--device", choices=["cpu", "default"], default="cpu")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from music_synthesis_tpu.config import FRONTEND_CPU_CLIP
    from music_synthesis_tpu.data.dataset import make_synthetic_corpus
    from music_synthesis_tpu.ops.frontend import log_mel
    from music_synthesis_tpu.utils.wav import load_wav

    cfg = FRONTEND_CPU_CLIP.frontend
    if args.clip is None:
        path = make_synthetic_corpus("/tmp/msynth_demo_corpus", n_clips=1,
                                     seconds=4.0)[0]
        print(f"no clip given; using synthetic {path}")
    else:
        path = args.clip
    wav = load_wav(path, cfg.sample_rate)
    t0 = time.perf_counter()
    mel = log_mel(jnp.asarray(wav)[None], cfg)
    mel.block_until_ready()
    print(f"{path}: {len(wav)} samples -> log-mel {mel.shape} "
          f"in {time.perf_counter() - t0:.3f}s on {jax.devices()[0].platform}")
    print(f"range [{float(mel.min()):.2f}, {float(mel.max()):.2f}]")
    if args.out:
        np.save(args.out, np.asarray(mel[0]))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
