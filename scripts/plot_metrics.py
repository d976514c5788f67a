#!/usr/bin/env python
"""Render training curves from a run's metrics.jsonl to PNG (SURVEY.md §5.5).

  python scripts/plot_metrics.py --run runs/stage2_50k_fp32 [--out FILE.png]

Small-multiple panels (one y-axis each): adversarial losses, G auxiliary
losses, gradient norms (log), update norms. Raw traces at low alpha with an
EMA-smoothed line on top; series colors are assigned fixed, not cycled.
"""

import argparse
import json
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

# Fixed categorical assignment (validated default palette, light mode).
C_G = "#2a78d6"      # generator family -> blue
C_D = "#eb6834"      # discriminator family -> orange
C_AUX1 = "#1baf7a"   # aqua
C_AUX2 = "#eda100"   # yellow
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e6e5e1"


def ema(x: np.ndarray, span_frac: float = 0.08) -> np.ndarray:
    """EMA whose span scales with the series length (so short logs aren't
    over-lagged and 50k-step logs aren't under-smoothed)."""
    alpha = min(0.5, 2.0 / max(len(x) * span_frac, 1.0))
    out = np.empty_like(x, dtype=np.float64)
    acc = x[0]
    for i, v in enumerate(x):
        acc = (1 - alpha) * acc + alpha * v
        out[i] = acc
    return out


def load(run: Path) -> dict[str, np.ndarray]:
    rows = [json.loads(l) for l in (run / "metrics.jsonl").open()]
    keys = sorted({k for r in rows for k in r})
    return {k: np.array([r.get(k, np.nan) for r in rows], np.float64)
            for k in keys}


def panel(ax, step, series, title, logy=False):
    ends = []
    for name, vals, color in series:
        if vals is None or np.all(np.isnan(vals)):
            continue
        ax.plot(step, vals, color=color, lw=0.8, alpha=0.25)
        sm = ema(vals)
        ax.plot(step, sm, color=color, lw=2.0, label=name)
        ends.append((name, color, float(sm[-1])))
    # Dodge colliding end-labels: stack upward with a minimum separation
    # (computed in log space when the panel is log-scaled).
    ends.sort(key=lambda e: e[2])
    key = (lambda v: np.log10(max(v, 1e-12))) if logy else (lambda v: v)
    pos = [key(v) for _, _, v in ends]
    span = (pos[-1] - pos[0]) or abs(pos[0]) or 1.0
    min_sep = 0.09 * span
    for i in range(1, len(pos)):
        pos[i] = max(pos[i], pos[i - 1] + min_sep)
    for (name, color, val), p in zip(ends, pos):
        y = 10.0 ** p if logy else p
        ax.annotate(f" {name} {val:.3g}", (step[-1], y),
                    color=color, fontsize=8, va="center")
    if logy:
        ax.set_yscale("log")
    ax.set_title(title, fontsize=10, color=INK, loc="left")
    ax.grid(True, color=GRID, lw=0.6)
    ax.tick_params(colors=INK2, labelsize=8)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.margins(x=0.02)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--out", default=None, help="default: RUN/curves.png")
    ap.add_argument("--title", default=None)
    args = ap.parse_args()
    run = Path(args.run)
    m = load(run)
    step = m["step"]

    panels = [(
        [("g_adv", m.get("g_adv", m.get("g_loss")), C_G),
         ("d_loss", m["d_loss"], C_D)],
        "adversarial losses", False,
    )]
    if "g_stft" in m:
        panels.append((
            [("g_stft", m["g_stft"], C_AUX1), ("g_fm", m["g_fm"], C_AUX2)],
            "generator auxiliary losses (multi-res STFT, feature matching)",
            False,
        ))
    if "g_rms_ratio" in m:
        panels.append((
            [("g_rms_ratio", m["g_rms_ratio"], C_AUX1)],
            "generated/real RMS ratio (amplitude health; want ~1)", False,
        ))
    if "g_grad_norm" in m:
        panels.append((
            [("g_grad_norm", m["g_grad_norm"], C_G),
             ("d_grad_norm", m.get("d_grad_norm"), C_D)],
            "gradient norms", True,
        ))
    if "g_update_norm" in m:
        panels.append((
            [("g_update_norm", m["g_update_norm"], C_G),
             ("d_update_norm", m.get("d_update_norm"), C_D)],
            "post-update parameter-delta norms", True,
        ))
    fig, axes = plt.subplots(len(panels), 1, figsize=(9, 2.6 * len(panels)),
                             sharex=True, facecolor="#fcfcfb")
    axes = np.atleast_1d(axes)
    for ax, (series, title, logy) in zip(axes, panels):
        panel(ax, step, series, title, logy=logy)
    axes[-1].set_xlabel("step", fontsize=9, color=INK2)
    fig.suptitle(args.title or f"{run.name} training curves",
                 fontsize=12, color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 0.93, 0.97))
    out = Path(args.out) if args.out else run / "curves.png"
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
