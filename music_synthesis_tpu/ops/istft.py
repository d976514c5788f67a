"""Inverse STFT synthesis as GEMMs (for the iSTFT vocoder head).

iSTFTNet (PAPERS.md: arxiv 2203.02395) replaces a vocoder's last upsampling
stages with predicted magnitude/phase + inverse STFT. On TPU the tiny
n_fft (8-32) inverse rFFT is expressed as one matmul against precomputed
cos/sin bases — MXU-shaped and fusable — followed by windowed COLA
overlap-add (ops.overlap_add).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.ops.frontend import hann_window
from music_synthesis_tpu.ops.overlap_add import ola_normalizer, overlap_add

__all__ = ["irdft_matrices", "istft_synthesis"]


@functools.lru_cache(maxsize=8)
def irdft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse real-DFT bases: ``frames = re @ IC + im @ IS``.

    IC/IS are ``[n_fft//2+1, n_fft]``; matches np.fft.irfft exactly.
    """
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    n = np.arange(n_fft, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft
    w = np.full(n_fft // 2 + 1, 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    ic = (w[:, None] * np.cos(ang) / n_fft).astype(np.float32)
    is_ = (-w[:, None] * np.sin(ang) / n_fft).astype(np.float32)
    return ic, is_


def istft_synthesis(
    re: jax.Array, im: jax.Array, n_fft: int, hop: int,
    precision: jax.lax.Precision | str | None = None,
) -> jax.Array:
    """Spectral frames -> waveform: ``[B, T, n_fft//2+1] x2 -> [B, T*hop]``.

    Hann-windowed synthesis with COLA normalization; the (n_fft - hop)/2
    edge samples on each side are trimmed so output length is exactly
    T * hop (centered).

    ``precision`` feeds the irDFT GEMMs. The default (backend default:
    bf16 inputs on TPU MXU) is right for the trained iSTFT vocoder head —
    one synthesis pass, error well under the model's own. Iterative
    callers (Griffin-Lim runs this every iteration and scores empty bins
    through a log-magnitude loss) pass ``"highest"``: TPU-vs-CPU GL
    distance was 1.693 vs 0.678 under the default (round 4).
    """
    ic, is_ = irdft_matrices(n_fft)
    frames = (jnp.matmul(re, jnp.asarray(ic), precision=precision)
              + jnp.matmul(im, jnp.asarray(is_), precision=precision))
    window = hann_window(n_fft, frames.dtype)
    wav = overlap_add(frames * window, hop)
    n_frames = frames.shape[-2]
    norm = ola_normalizer(window, n_frames, hop)
    wav = wav / norm
    trim = (n_fft - hop) // 2
    return wav[..., trim : trim + n_frames * hop]
