#!/usr/bin/env python
"""Per-sample output-fidelity comparison (BASELINE.json:2).

Computes the multi-resolution STFT distance between paired WAVs from two
directories (matched by filename) — the judged parity metric between this
framework's outputs and the reference implementation's recorded outputs.

  python scripts/parity.py ours_dir reference_dir

Note (BASELINE.md): the reference mount was empty this round, so no
reference outputs exist yet; this tool is the comparison side, ready for
when they materialize. It also serves as a general audio-distance utility
(e.g. vocoder copy-synthesis vs ground truth).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("reference")
    ap.add_argument("--sample-rate", type=int, default=22_050)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from music_synthesis_tpu.losses.stft_loss import multires_stft_loss
    from music_synthesis_tpu.utils.wav import load_wav

    ours = {p.name: p for p in Path(args.ours).glob("*.wav")}
    ref = {p.name: p for p in Path(args.reference).glob("*.wav")}
    common = sorted(set(ours) & set(ref))
    if not common:
        print(json.dumps({"error": "no matching filenames"}))
        sys.exit(1)

    dist_fn = jax.jit(multires_stft_loss)
    results = {}
    for name in common:
        a = load_wav(ours[name], args.sample_rate)
        b = load_wav(ref[name], args.sample_rate)
        n = min(len(a), len(b))
        d = float(dist_fn(jnp.asarray(a[:n])[None], jnp.asarray(b[:n])[None]))
        results[name] = round(d, 6)
        print(f"{name}: multires_stft_distance = {d:.6f}", file=sys.stderr)
    mean = sum(results.values()) / len(results)
    print(json.dumps({
        "metric": "multires_stft_distance_vs_reference",
        "value": round(mean, 6),
        "unit": "distance (0 = identical)",
        "per_file": results,
    }))


if __name__ == "__main__":
    main()
