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

import os
from pathlib import Path

import numpy as np

from music_synthesis_tpu.utils.wav import load_wav, write_wav

__all__ = ["AudioDataset", "make_synthetic_corpus"]


class AudioDataset:
    """In-memory corpus of mono waveforms at the target sample rate."""

    def __init__(
        self,
        root: str | os.PathLike,
        sample_rate: int = 22_050,
        segment_length: int = 8192,
        min_length: int | None = None,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.sample_rate = sample_rate
        self.segment_length = segment_length
        min_length = min_length or segment_length
        paths = sorted(Path(root).rglob("*.wav"))
        # Shard files across hosts: each process loads a disjoint subset.
        paths = paths[process_index::process_count]
        if not paths:
            raise FileNotFoundError(f"no .wav files under {root}")
        self.clips: list[np.ndarray] = []
        self.paths: list[Path] = []
        for p in paths:
            wav = load_wav(p, sample_rate)
            if len(wav) >= min_length:
                self.clips.append(wav)
                self.paths.append(p)
        if not self.clips:
            raise ValueError(f"no clips of >= {min_length} samples under {root}")

    def sample_batch(self, step: int, batch_size: int, seed: int = 0) -> np.ndarray:
        """Step-seeded segment batch ``[B, segment_length]`` float32.

        Deterministic in (step, seed): restoring a checkpoint and replaying
        from the same step reproduces the exact data order.
        """
        rng = np.random.default_rng(np.random.SeedSequence([seed, step]))
        out = np.empty((batch_size, self.segment_length), np.float32)
        clip_idx = rng.integers(0, len(self.clips), size=batch_size)
        for i, ci in enumerate(clip_idx):
            clip = self.clips[ci]
            start = rng.integers(0, len(clip) - self.segment_length + 1)
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
