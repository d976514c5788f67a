"""Corpus-derived feature statistics (SURVEY.md §5.6; VERDICT r1 weak #6).

The GAN works in a normalized log-mel space; ``config.MelScaler`` is the
affine map between real log-mel units and [-1, 1]. Its defaults suit
unit-scale synthetic audio, but a real corpus can sit anywhere in log space —
so derive (shift, scale) from the corpus itself: sample batches, compute the
oracle log-mel, and fit the robust (0.5 / 99.5 percentile) range onto
[-1, 1].

Deterministic in (corpus, seed), so a resumed run re-derives identical stats.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.config import MelScaler, PipelineConfig
from music_synthesis_tpu.ops.frontend import log_mel_for_vocoder

__all__ = ["compute_mel_stats"]


def compute_mel_stats(
    ds,
    cfg: PipelineConfig,
    n_batches: int = 16,
    batch_size: int = 32,
    seed: int = 0,
) -> MelScaler:
    """Fit a MelScaler so corpus log-mel maps robustly onto [-1, 1].

    ``ds`` is any dataset with ``sample_batch(step, batch_size, seed)``.
    Uses dedicated step indices (2**30 + i) so the stats batches never
    coincide with training batches.
    """
    lo_sum = hi_sum = 0.0
    for i in range(n_batches):
        wav = ds.sample_batch(2**30 + i, batch_size, seed)
        mel = log_mel_for_vocoder(jnp.asarray(wav), cfg.frontend)
        mel = np.asarray(mel)
        lo_sum += float(np.percentile(mel, 0.5))
        hi_sum += float(np.percentile(mel, 99.5))
    lo = lo_sum / n_batches
    hi = hi_sum / n_batches
    shift = 0.5 * (lo + hi)
    scale = max(0.5 * (hi - lo), 1e-3)
    return MelScaler(shift=shift, scale=scale)
