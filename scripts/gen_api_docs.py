#!/usr/bin/env python
"""Generate docs/API.md from the package's own docstrings.

Walks every module under music_synthesis_tpu, collects public classes and
functions (those not prefixed with "_" and defined in that module), and
emits a markdown reference: signature + first docstring paragraph. Run on
CPU (JAX_PLATFORMS=cpu); re-run whenever the API surface changes so the
committed reference never drifts from the code.

Usage: JAX_PLATFORMS=cpu python scripts/gen_api_docs.py [--check]
  --check: exit 1 if docs/API.md is stale (for CI).
"""
from __future__ import annotations

import argparse
import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

PACKAGE = "music_synthesis_tpu"
# Order modules for the reader (pipeline order), not alphabetically.
SECTION_ORDER = [
    ("Configuration", ["config"]),
    ("DSP ops", ["ops.frontend", "ops.pallas_frontend", "ops.istft",
                 "ops.overlap_add", "ops.griffin_lim", "ops.conv",
                 "ops.phase", "ops.cepstrum"]),
    ("Models", ["models.specgan", "models.vocoder", "models.discriminators"]),
    ("Losses", ["losses.gan", "losses.stft_loss", "losses.phase_loss"]),
    ("Training", ["train.stage1", "train.stage2", "train.state",
                  "train.checkpoint", "train.metrics", "train.guard"]),
    ("Parallelism", ["parallel.mesh", "parallel.dp", "parallel.shard_map_dp",
                     "parallel.seqshard", "parallel.multihost"]),
    ("Inference", ["infer.generate", "infer.stream", "infer.latent"]),
    ("Data", ["data.dataset", "data.musicnet", "data.native",
              "data.prefetch", "data.stats"]),
    ("Serving & deployment", ["serve", "deploy", "zoo"]),
    ("Utilities", ["utils.wav", "utils.report", "utils.profiling",
                   "utils.env"]),
]


def first_paragraph(doc: str | None) -> str:
    if not doc:
        return "*(no docstring)*"
    paras = inspect.cleandoc(doc).split("\n\n")
    return paras[0].replace("\n", " ").strip()


def doc_signature(obj) -> str:
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    if len(sig) > 400:  # dataclasses with huge nested defaults (PipelineConfig)
        names = []
        try:
            for p in inspect.signature(obj).parameters.values():
                names.append(p.name)
        except (ValueError, TypeError):
            return "(...)"
        sig = "(" + ", ".join(names) + ")"
    return sig


def public_members(mod):
    """Classes and functions defined in (not imported into) this module."""
    out = []
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if not (inspect.isclass(obj) or inspect.isfunction(obj)):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue
        out.append((name, obj))
    # Preserve definition order via source line numbers where possible.
    def lineno(item):
        try:
            return inspect.getsourcelines(item[1])[1]
        except (OSError, TypeError):
            return 1 << 30
    return sorted(out, key=lineno)


def render_module(qualname: str) -> str:
    mod = importlib.import_module(f"{PACKAGE}.{qualname}")
    lines = [f"### `{PACKAGE}.{qualname}`", ""]
    lines += [first_paragraph(mod.__doc__), ""]
    for name, obj in public_members(mod):
        kind = "class" if inspect.isclass(obj) else "def"
        lines.append(f"- **`{kind} {name}{doc_signature(obj)}`** — "
                     f"{first_paragraph(obj.__doc__)}")
        if inspect.isclass(obj):
            for mname, meth in public_members_of_class(obj):
                lines.append(f"  - `.{mname}{doc_signature(meth)}` — "
                             f"{first_paragraph(meth.__doc__)}")
    lines.append("")
    return "\n".join(lines)


def public_members_of_class(cls):
    out = []
    for name, obj in vars(cls).items():
        if name.startswith("_") or not callable(obj):
            continue
        if isinstance(obj, (staticmethod, classmethod)):
            obj = obj.__func__
        if not inspect.isfunction(obj):
            continue
        out.append((name, obj))
    def lineno(item):
        try:
            return inspect.getsourcelines(item[1])[1]
        except (OSError, TypeError):
            return 1 << 30
    return sorted(out, key=lineno)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    known = {m for _, mods in SECTION_ORDER for m in mods}
    # Catch modules added later but not yet placed in a section.
    pkg = importlib.import_module(PACKAGE)
    discovered = set()
    for info in pkgutil.walk_packages(pkg.__path__, prefix=""):
        discovered.add(info.name)
        sub = importlib.import_module(f"{PACKAGE}.{info.name}")
        if hasattr(sub, "__path__"):
            for si in pkgutil.walk_packages(sub.__path__,
                                            prefix=f"{info.name}."):
                discovered.add(si.name)
    unplaced = sorted(m for m in discovered - known
                      if not m.endswith("__init__") and "." in m or
                      m in {"serve", "deploy", "zoo", "config"})
    unplaced = [m for m in unplaced if m not in known]

    parts = [
        "# API reference",
        "",
        "Generated from docstrings by `scripts/gen_api_docs.py` — do not "
        "edit by hand; re-run the script. One bullet per public class/"
        "function: signature plus the first docstring paragraph (the full "
        "docstrings in the source carry the details, measurements, and "
        "SURVEY.md component citations).",
        "",
    ]
    for title, mods in SECTION_ORDER:
        parts += [f"## {title}", ""]
        for m in mods:
            parts.append(render_module(m))
    if unplaced:
        parts += ["## Unsectioned modules (add to SECTION_ORDER)", ""]
        for m in unplaced:
            parts.append(render_module(m))
    text = "\n".join(parts) + "\n"

    out = ROOT / "docs" / "API.md"
    if args.check:
        if not out.exists() or out.read_text() != text:
            print("docs/API.md is stale — run scripts/gen_api_docs.py")
            sys.exit(1)
        print("docs/API.md is current")
        return
    out.write_text(text)
    print(f"wrote {out} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()
