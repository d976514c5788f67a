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
    axis_name: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """(spectral_convergence, log_magnitude_L1) at one resolution.

    sc = ||.|S_y| - |S_x|.||_F / ||S_y||_F,  mag = mean |log|S_x| - log|S_y||
    where y is the reference signal.

    ``axis_name``: under shard_map DP, the mesh axis holding batch shards.
    sc is a nonlinear Frobenius-norm ratio, so a per-shard sc would NOT mean
    to the global-batch value; instead the squared norms are psum'd so every
    device computes the exact global sc. The returned sc additionally carries
    an N-times gradient correction (value unchanged, via a stop_gradient
    identity) so that the caller's subsequent grad-pmean reproduces the
    single-device gradient exactly. mag stays a local-shard mean: the
    caller's grad-pmean and metric-pmean already make it exact (equal-size
    shards), and pmean-ing it here would double-divide its gradient by N.
    """
    sx = magnitude_stft(x, n_fft, hop_length, win_length, eps)
    sy = magnitude_stft(y, n_fft, hop_length, win_length, eps)
    diff2 = jnp.sum(jnp.square(sy - sx))
    ref2 = jnp.sum(jnp.square(sy))
    mag = jnp.mean(jnp.abs(jnp.log(sx) - jnp.log(sy)))
    if axis_name:
        diff2 = jax.lax.psum(diff2, axis_name)
        ref2 = jax.lax.psum(ref2, axis_name)
    sc = jnp.sqrt(diff2) / jnp.maximum(jnp.sqrt(ref2), eps)
    if axis_name:
        # pmean-of-grads divides the (already global) sc gradient by N once
        # more than the single-device step would; pre-scale the gradient by
        # N while leaving the value untouched.
        n = jax.lax.psum(1, axis_name)
        sc = n * sc - jax.lax.stop_gradient((n - 1) * sc)
    return sc, mag


def multires_stft_loss(
    x: jax.Array,
    y: jax.Array,
    cfg: STFTLossConfig = STFTLossConfig(),
    axis_name: str | None = None,
) -> jax.Array:
    """Mean over resolutions of (sc + mag). x = generated, y = reference."""
    total = 0.0
    for n_fft, hop, win in cfg.resolutions:
        sc, mag = stft_distance(x, y, n_fft, hop, win, cfg.eps, axis_name)
        total = total + sc + mag
    return total / len(cfg.resolutions)
