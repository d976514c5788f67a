#!/usr/bin/env python
"""Attribute device time in a captured step trace (SURVEY.md §5.1; VERDICT
r3 next-round #6: "a fresh trace-backed table in DESIGN.md").

Parses the Chrome-trace JSON that `scripts/profile_step.py` (via
jax.profiler) writes under <trace_dir>/plugins/profile/*/ *.trace.json.gz
and aggregates the XLA-Ops lane by:

  - phase       — the jax.named_scope region (d_step / g_step / frontend /
                  generator_fwd / ema / optimizer), recovered from the
                  `tf_op` metadata path
  - component   — msd / mrd / vocoder / frontend / optimizer, recovered
                  from the scope path
  - hlo_category — XLA's own op class (fusion / convolution / copy / ...)

Prints markdown tables (device ms per step and % of step) suitable for
pasting into docs/DESIGN.md, plus the model_flops accounting per phase.

Usage:
  python scripts/trace_report.py runs/trace_stage2_r4
"""

import argparse
import collections
import gzip
import json
import re
import sys
from pathlib import Path


def find_trace_json(trace_dir: Path) -> Path:
    hits = sorted(trace_dir.glob("plugins/profile/*/*.trace.json.gz"))
    if not hits:
        sys.exit(f"no *.trace.json.gz under {trace_dir}/plugins/profile/")
    return hits[-1]


def load_ops(path: Path):
    with gzip.open(path) as f:
        data = json.load(f)
    events = data["traceEvents"]
    # Lane discovery: the TPU pid hosts "Steps" (tid named Steps) and
    # "XLA Ops" lanes; thread_name metadata maps tids to lane names.
    lane = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lane[(e["pid"], e["tid"])] = e["args"]["name"]
    steps = [e for e in events
             if e.get("ph") == "X" and lane.get((e["pid"], e["tid"])) == "Steps"]
    ops = [e for e in events
           if e.get("ph") == "X" and lane.get((e["pid"], e["tid"])) == "XLA Ops"]
    if not steps or not ops:
        sys.exit(f"trace has {len(steps)} step / {len(ops)} op events — "
                 "not a device trace?")
    return steps, ops


PHASE_RE = re.compile(r"jit\([^)]*\)/([a-zA-Z0-9_]+)")

COMPONENTS = (
    ("msd", "msd"),
    ("mrd", "mrd"),
    ("Vocoder", "vocoder"),
    ("frontend", "frontend"),
    ("adam", "optimizer"),
    ("ema", "ema"),
)


def classify(e):
    tf_op = e["args"].get("tf_op", "") or ""
    m = PHASE_RE.match(tf_op)
    phase = m.group(1) if m else "other"
    comp = "other"
    for needle, name in COMPONENTS:
        if needle in tf_op:
            comp = name
            break
    return phase, comp


def table(title, agg, flops, n_steps, total_us):
    print(f"\n### {title}\n")
    print("| bucket | ms/step | % of device time | model GFLOP/step |")
    print("|---|---|---|---|")
    for name, us in agg.most_common():
        print(f"| {name} | {us / n_steps / 1e3:.2f} "
              f"| {100 * us / total_us:.1f}% "
              f"| {flops[name] / n_steps / 1e9:.1f} |")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", type=Path)
    ap.add_argument("--top", type=int, default=12,
                    help="rows in the top-single-ops table")
    args = ap.parse_args()

    path = find_trace_json(args.trace_dir)
    steps, ops = load_ops(path)
    n = len(steps)
    step_ms = sum(s["dur"] for s in steps) / n / 1e3
    total_us = sum(o["dur"] for o in ops)

    by_phase, by_comp, by_cat = (collections.Counter() for _ in range(3))
    fl_phase, fl_comp, fl_cat = (collections.Counter() for _ in range(3))
    for e in ops:
        phase, comp = classify(e)
        cat = e["args"].get("hlo_category", "?")
        us = e["dur"]
        gf = int(e["args"].get("model_flops") or 0)
        by_phase[phase] += us
        by_comp[comp] += us
        by_cat[cat] += us
        fl_phase[phase] += gf
        fl_comp[comp] += gf
        fl_cat[cat] += gf

    print(f"trace: {path}")
    print(f"steps: {n}   mean step: {step_ms:.2f} ms   "
          f"device-op time: {total_us / n / 1e3:.2f} ms/step   "
          f"model flops: {sum(fl_phase.values()) / n / 1e12:.3f} TFLOP/step")

    table("By phase (named_scope region)", by_phase, fl_phase, n, total_us)
    table("By component", by_comp, fl_comp, n, total_us)
    table("By HLO category", by_cat, fl_cat, n, total_us)

    # Top individual ops — where a single fusion is the lever.
    per_op = collections.Counter()
    meta = {}
    for e in ops:
        tf_op = e["args"].get("tf_op", "") or e["name"]
        per_op[tf_op] += e["dur"]
        meta[tf_op] = e["args"].get("source", "")
    print(f"\n### Top {args.top} single ops\n")
    print("| ms/step | % | op (scope path) | source |")
    print("|---|---|---|---|")
    for name, us in per_op.most_common(args.top):
        short = name.replace("jit(train_step_impl)/", "")
        print(f"| {us / n / 1e3:.2f} | {100 * us / total_us:.1f}% "
              f"| `{short[:90]}` | {meta[name].split('/')[-1]} |")


if __name__ == "__main__":
    main()
