"""Training data pipeline (SURVEY.md C1, L0).

Host-side corpus handling: scan a directory of WAVs, resample to the
front-end rate, and sample fixed-length segments into static-shape batches
(zero recompile churn — SURVEY.md §7 step 5). Sampling is step-seeded and
process-sharded, so data order is deterministic and resumable (SURVEY.md
§5.3) and each host in a multi-process run reads a disjoint shard (§5.8).

Also provides a deterministic synthetic "music-like" corpus (harmonic notes
with envelopes) so training, tests, and benchmarks run without MusicNet.
"""

from __future__ import annotations

import collections
import os
import threading
from pathlib import Path

import numpy as np

from music_synthesis_tpu.utils.wav import load_wav, write_wav

__all__ = ["AudioDataset", "make_synthetic_corpus"]


class AudioDataset:
    """Corpus of mono waveforms at the target sample rate.

    Two residency modes (SURVEY.md C1 — a MusicNet-class corpus is tens of
    GB, far past host RAM):

    * ``ram_budget_mb=None`` (default): fully decoded into RAM up front —
      zero per-step IO, right for small/medium corpora.
    * ``ram_budget_mb=N``: only (path, length) metadata is kept resident;
      decoded clips live in an LRU cache capped at N MB and are re-decoded
      on miss. Sampling stays step-seeded and deterministic either way (the
      sampling decisions depend only on the recorded lengths).

    The one-time init scan decodes each file once (one clip in flight) to
    record its resampled length; in budgeted mode the scan also warms the
    LRU, so small corpora behave identically in both modes.
    """

    def __init__(
        self,
        root: str | os.PathLike,
        sample_rate: int = 22_050,
        segment_length: int = 8192,
        min_length: int | None = None,
        process_index: int = 0,
        process_count: int = 1,
        ram_budget_mb: int | None = None,
    ):
        self.sample_rate = sample_rate
        self.segment_length = segment_length
        min_length = min_length or segment_length
        paths = sorted(Path(root).rglob("*.wav"))
        # Shard files across hosts: each process loads a disjoint subset.
        paths = paths[process_index::process_count]
        if not paths:
            raise FileNotFoundError(f"no .wav files under {root}")
        self.paths: list[Path] = []
        self.lengths: list[int] = []
        self._budget = (
            None if ram_budget_mb is None else ram_budget_mb * (1 << 20)
        )
        self._cache: collections.OrderedDict[int, np.ndarray] = (
            collections.OrderedDict()
        )
        self._cache_bytes = 0
        # Single lock around the LRU: the prefetcher thread and the main
        # thread (audio dumps, parity evals) may sample concurrently.
        self._lock = threading.Lock()
        self.clips: list[np.ndarray] | None = [] if self._budget is None else None
        for p in paths:
            wav = load_wav(p, sample_rate)
            if len(wav) < min_length:
                continue
            self.paths.append(p)
            self.lengths.append(len(wav))
            if self.clips is not None:
                self.clips.append(wav)
            else:
                self._cache_put(len(self.paths) - 1, wav)
        if not self.paths:
            raise ValueError(f"no clips of >= {min_length} samples under {root}")

    def __len__(self) -> int:
        return len(self.paths)

    def _cache_put(self, idx: int, wav: np.ndarray) -> None:
        self._cache[idx] = wav
        self._cache_bytes += wav.nbytes
        while self._cache_bytes > self._budget and len(self._cache) > 1:
            _, old = self._cache.popitem(last=False)
            self._cache_bytes -= old.nbytes

    def _get_clip(self, idx: int) -> np.ndarray:
        if self.clips is not None:
            return self.clips[idx]
        with self._lock:
            wav = self._cache.get(idx)
            if wav is not None:
                self._cache.move_to_end(idx)
                return wav
        wav = load_wav(self.paths[idx], self.sample_rate)
        with self._lock:
            if idx not in self._cache:
                self._cache_put(idx, wav)
        return wav

    def sample_batch(self, step: int, batch_size: int, seed: int = 0) -> np.ndarray:
        """Step-seeded segment batch ``[B, segment_length]`` float32.

        Deterministic in (step, seed): restoring a checkpoint and replaying
        from the same step reproduces the exact data order.
        """
        rng = np.random.default_rng(np.random.SeedSequence([seed, step]))
        out = np.empty((batch_size, self.segment_length), np.float32)
        clip_idx = rng.integers(0, len(self.paths), size=batch_size)
        for i, ci in enumerate(clip_idx):
            start = rng.integers(0, self.lengths[ci] - self.segment_length + 1)
            clip = self._get_clip(ci)
            out[i] = clip[start : start + self.segment_length]
        return out


def make_synthetic_corpus(
    root: str | os.PathLike,
    n_clips: int = 8,
    seconds: float = 4.0,
    sample_rate: int = 22_050,
    seed: int = 0,
) -> list[Path]:
    """Write deterministic harmonic clips (notes + envelopes) as WAVs."""
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = int(seconds * sample_rate)
    t = np.arange(n) / sample_rate
    paths = []
    scale = 220.0 * 2.0 ** (np.arange(15) / 12.0)  # A3 chromatic-ish
    for c in range(n_clips):
        wav = np.zeros(n, np.float64)
        n_notes = rng.integers(4, 10)
        for _ in range(n_notes):
            f0 = rng.choice(scale)
            onset = rng.uniform(0, seconds * 0.8)
            dur = rng.uniform(0.3, 1.5)
            amp = rng.uniform(0.05, 0.2)
            env = np.clip((t - onset) / 0.02, 0, 1) * np.exp(
                -np.maximum(t - onset, 0) / (dur / 3)
            ) * (t >= onset)
            for h, ha in enumerate((1.0, 0.5, 0.33, 0.25)):
                wav += amp * ha * env * np.sin(2 * np.pi * f0 * (h + 1) * t)
        peak = np.abs(wav).max()
        if peak > 0:
            wav = 0.7 * wav / peak
        p = root / f"clip_{c:03d}.wav"
        write_wav(p, sample_rate, wav)
        paths.append(p)
    return paths
