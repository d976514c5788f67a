"""Round-4 queue decision table (VERDICT r3 items 2-5).

Collects the eval artifacts produced by the round-4 TPU queue and prints
each lead's verdict against its round-3 anchor:

  istft_stab   held-out copy-synthesis dist vs the 2.084 waveform-head
               anchor; <= anchor + 0.1 means the trained iSTFT head
               reclaims the fast RTF headline (VERDICT r3 item 2).
  energy50     dist + resynth/real RMS vs the lambda=20 point
               (2.121 / 0.248) and the 0.138 baseline (item 5).
  rich16h      dist on the 16 h corpus vs the 2.084 plateau; < 2.0
               confirms the data-bound hypothesis (item 3).
  flux         flux_ratio vs the 2.27 flicker baseline with marginals
               (bin_mean_l2 vs 0.070) intact (item 4).

Pure host-side JSON reading — safe to run while a TPU client is alive.
"""

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Round-3 anchors (runs/stage2_50k_fast/eval/eval.json, DESIGN.md §13,
# runs/stage1_composer_40k/eval_stage1.json).
WAVEFORM_DIST = 2.084
ENERGY20_DIST, ENERGY20_RMS = 2.121, 0.248
BASELINE_RMS = 0.138
FLUX_BASELINE, BINL2_BASELINE = 2.273, 0.070


def _load(rel):
    p = REPO / rel
    if not p.exists():
        return None
    return json.loads(p.read_text())


def main():
    rows = []

    e = _load("runs/stage2_istft_stab_50k/eval/eval.json")
    if e:
        d = e["copy_synthesis_multires_stft_distance_mean"]
        ok = d <= WAVEFORM_DIST + 0.1
        rows.append((
            "istft_stab", f"dist {d:.3f} vs {WAVEFORM_DIST} anchor",
            "SWAP HEADLINE to istft preset" if ok
            else "3rd collapse/miss: keep waveform headline, close the lead",
        ))
    else:
        rows.append(("istft_stab", "eval missing", "run not finished"))

    e = _load("runs/stage2_energy50_50k/eval/eval.json")
    if e:
        d = e["copy_synthesis_multires_stft_distance_mean"]
        r = e.get("resynth_rms_over_real_rms_mean", float("nan"))
        better = r > ENERGY20_RMS and d <= ENERGY20_DIST + 0.1
        rows.append((
            "energy50",
            f"dist {d:.3f} (λ20: {ENERGY20_DIST}), rms {r:.3f} "
            f"(λ20: {ENERGY20_RMS}, base: {BASELINE_RMS})",
            "λ=50 is the production energy weight" if better
            else "keep λ=20 + --target-rms gain calibration",
        ))
    else:
        rows.append(("energy50", "eval missing", "run not finished"))

    e = _load("runs/stage2_rich16h_50k/eval/eval.json")
    if e:
        d = e["copy_synthesis_multires_stft_distance_mean"]
        rows.append((
            "rich16h", f"dist {d:.3f} vs 2.084 plateau (target < 2.0)",
            "data-bound hypothesis CONFIRMED; 16h corpus is the new default"
            if d < 2.0 else
            "hypothesis weakened — record curves in DESIGN.md §13",
        ))
    else:
        rows.append(("rich16h", "eval missing", "run not finished"))

    e = _load("runs/stage1_flux_40k/eval_stage1/eval.json") or _load(
        "runs/stage1_flux_40k/eval_stage1.json")
    if e:
        fr, bl = e["flux_ratio"], e["bin_mean_l2"]
        good = abs(fr - 1.0) < abs(FLUX_BASELINE - 1.0) * 0.5 and bl < 0.15
        rows.append((
            "flux",
            f"flux_ratio {fr:.3f} (base {FLUX_BASELINE}), "
            f"bin_l2 {bl:.3f} (base {BINL2_BASELINE})",
            "export composer-v2 zoo entry + regenerate demo" if good
            else "flux knob insufficient — document the negative result",
        ))
    else:
        rows.append(("flux", "eval missing", "run not finished"))

    w = max(len(r[0]) for r in rows)
    for name, measured, verdict in rows:
        print(f"{name:<{w}}  {measured}")
        print(f"{'':<{w}}  -> {verdict}")
    done = sum(1 for r in rows if "missing" not in r[1])
    print(f"\n{done}/4 leads measured")


if __name__ == "__main__":
    main()
