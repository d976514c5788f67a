"""Multi-resolution STFT distance (SURVEY.md C13).

Spectral-convergence + log-magnitude L1 at several (n_fft, hop, win)
resolutions. This is both a stage-2 auxiliary training loss (BASELINE.json:11)
and the driver's judged parity metric (BASELINE.json:2), so it is kept
dependency-free and deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from music_synthesis_tpu.config import STFTLossConfig
from music_synthesis_tpu.ops.frontend import magnitude_stft

__all__ = ["stft_distance", "multires_stft_loss"]


def stft_distance(
    x: jax.Array,
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    eps: float = 1e-7,
) -> tuple[jax.Array, jax.Array]:
    """(spectral_convergence, log_magnitude_L1) at one resolution.

    sc = ||.|S_y| - |S_x|.||_F / ||S_y||_F,  mag = mean |log|S_x| - log|S_y||
    where y is the reference signal.
    """
    sx = magnitude_stft(x, n_fft, hop_length, win_length, eps)
    sy = magnitude_stft(y, n_fft, hop_length, win_length, eps)
    sc = jnp.linalg.norm(sy - sx) / jnp.maximum(jnp.linalg.norm(sy), eps)
    mag = jnp.mean(jnp.abs(jnp.log(sx) - jnp.log(sy)))
    return sc, mag


def multires_stft_loss(
    x: jax.Array, y: jax.Array, cfg: STFTLossConfig = STFTLossConfig()
) -> jax.Array:
    """Mean over resolutions of (sc + mag). x = generated, y = reference."""
    total = 0.0
    for n_fft, hop, win in cfg.resolutions:
        sc, mag = stft_distance(x, y, n_fft, hop, win, cfg.eps)
        total = total + sc + mag
    return total / len(cfg.resolutions)
