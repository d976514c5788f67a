"""Scalar metrics logging (SURVEY.md §5.5): JSONL + console.

The genre's real observability is periodic generated-audio dumps; those are
written by the training scripts via utils.wav. Here: one JSON object per
logged step, floats only, safe to tail/parse from anywhere.
"""

from __future__ import annotations

import json
import time
from typing import IO, Mapping


class MetricsLogger:
    """Append-only JSONL scalar logger (SURVEY.md §5.5); also echoes to stdout."""

    def __init__(self, path: str | None = None, echo: bool = True):
        self._fh: IO | None = open(path, "a") if path else None
        self._echo = echo
        self._t0 = time.monotonic()

    def log(self, step: int, metrics: Mapping[str, object]) -> None:
        """Write one record: ``{"step": step, "wall_s": ..., **metrics}``."""
        rec = {
            "step": int(step),
            "wall_s": round(time.monotonic() - self._t0, 3),
        }
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._echo:
            print(line)

    def close(self) -> None:
        """Close the JSONL file handle (no-op for echo-only loggers)."""
        if self._fh:
            self._fh.close()
