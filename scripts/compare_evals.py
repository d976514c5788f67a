#!/usr/bin/env python
"""Paired per-clip comparison of two checkpoint evals.

The held-out eval clips are deterministic (eval_checkpoint.py samples
step 2**29+i with seed=1234), so two evals on the same corpus score the
SAME clips and the checkpoint difference can be judged as a paired
statistic — the clip-to-clip variance (std ~0.19 on the rich corpus)
cancels, leaving only the treatment effect (SEM of the paired delta is
~3x tighter than comparing the two 8-clip means).

Inputs: eval.json files carrying "per_clip" (written by eval_checkpoint.py
from 2026-08-20 on), or eval .log files with "clip N: multires_stft_distance"
lines (all committed runs; distance metric only).

Usage:
  python scripts/compare_evals.py A.json B.json            # all shared metrics
  python scripts/compare_evals.py A.log B.log              # distance only
"""

from __future__ import annotations

import argparse
import json
import math
import re
from pathlib import Path

_CLIP_RE = re.compile(r"^clip (\d+): multires_stft_distance = ([0-9.]+)")


def load_per_clip(path: Path) -> dict[str, list[float]]:
    """Return {metric: [per-clip values]} from an eval.json or eval log."""
    text = path.read_text()
    if path.suffix == ".json":
        metrics = json.loads(text)
        per_clip = metrics.get("per_clip")
        if not per_clip:
            raise SystemExit(
                f"{path}: no per_clip block — re-run eval_checkpoint.py "
                "(per-clip persistence landed 2026-08-20), or pass the "
                "eval .log instead")
        return {k: list(map(float, v)) for k, v in per_clip.items()}
    dists: dict[int, float] = {}
    for line in text.splitlines():
        m = _CLIP_RE.match(line.strip())
        if m:
            # Later lines win: logs of re-run evals keep the last pass.
            dists[int(m.group(1))] = float(m.group(2))
    if not dists:
        raise SystemExit(f"{path}: no 'clip N: multires_stft_distance' lines")
    return {"dist": [dists[i] for i in sorted(dists)]}


def paired_stats(a: list[float], b: list[float]) -> dict[str, float]:
    deltas = [y - x for x, y in zip(a, b)]
    n = len(deltas)
    mean = sum(deltas) / n
    if n < 2:
        return {"n": n, "mean_delta": mean}
    var = sum((d - mean) ** 2 for d in deltas) / (n - 1)
    sem = math.sqrt(var / n)
    return {
        "n": n,
        "mean_delta": mean,
        "sem": sem,
        "t": mean / sem if sem > 0 else float("inf"),
        # Count of clips where B < A. For dist/jitter/mcd lower is better;
        # for rms_ratio the target is 1.0 — read the sign accordingly.
        "n_decreased": sum(d < 0 for d in deltas),
        "deltas": deltas,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("baseline", type=Path, help="eval.json or eval log (A)")
    ap.add_argument("candidate", type=Path, help="eval.json or eval log (B)")
    args = ap.parse_args()

    a, b = load_per_clip(args.baseline), load_per_clip(args.candidate)
    shared = [k for k in a if k in b and len(a[k]) == len(b[k])]
    if not shared:
        raise SystemExit("no shared per-clip metrics of equal clip count")

    out = {}
    for k in shared:
        s = paired_stats(a[k], b[k])
        out[k] = s
        extra = ""
        if "sem" in s:
            extra = (f"  sem={s['sem']:.4f}  t={s['t']:+.2f}  "
                     f"decreased={s['n_decreased']}/{s['n']}")
        print(f"{k:12s} B-A mean_delta={s['mean_delta']:+.4f}{extra}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
