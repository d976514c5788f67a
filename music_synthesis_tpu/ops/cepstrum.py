"""Mel-cepstral distortion (MCD) — a second, tilt-sensitive fidelity axis.

The judged multi-res STFT distance (losses/stft_loss.py) scores magnitude
agreement bin-by-bin; MCD instead compares low-order mel *cepstra* (DCT-II
of the log-mel), which summarize spectral-envelope shape and are the
standard objective metric in the vocoder literature (e.g. the MelGAN and
iSTFTNet papers' evaluation sections, PAPERS.md). Like the STFT distance it
is provably phase-blind (it sees only |STFT|), so it complements — not
replaces — the phase-jitter ratio (ops/phase.py).

This is the log-mel-DCT formulation (sometimes called "MCD13 from
mel-spectrogram"): cepstra are DCT-II(orthonormal) of the natural-log mel
spectrogram, coefficients 1..n_coeffs (c0 — overall energy — excluded),
frame-paired Euclidean distance, scaled by 10 * sqrt(2) / ln(10) dB.
WORLD/SPTK-based MCD uses a different envelope estimator; numbers are
comparable only within one formulation, which is all the A/B evals here
need.

Everything is a [T, M] @ [M, K] matmul — MXU-friendly, jit-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.config import FrontendConfig
from music_synthesis_tpu.ops.frontend import log_mel_for_vocoder


@functools.lru_cache(maxsize=8)
def _dct2_matrix(n_mels: int, n_coeffs: int) -> np.ndarray:
    """Orthonormal DCT-II basis, shape [n_mels, n_coeffs + 1] (c0 kept so
    callers can decide to drop it)."""
    m = np.arange(n_mels)[:, None]  # input bin
    k = np.arange(n_coeffs + 1)[None, :]  # coefficient
    basis = np.cos(np.pi * (m + 0.5) * k / n_mels)
    basis *= np.sqrt(2.0 / n_mels)
    basis[:, 0] *= np.sqrt(0.5)
    return basis.astype(np.float32)


def mel_cepstra(x: jax.Array, cfg: FrontendConfig,
                n_coeffs: int = 13) -> jax.Array:
    """``[..., L]`` waveform -> ``[..., T, n_coeffs]`` mel cepstra c1..cK.

    Uses the vocoder-aligned log-mel (one frame per hop) so real/resynth
    pairs of equal length produce frame-aligned cepstra.
    """
    lm = log_mel_for_vocoder(x, cfg)  # [..., T, n_mels], natural log
    # 80 dB dynamic-range floor (per clip, relative to its loudest bin):
    # near-silent bins otherwise sit at log(eps) where window-leakage noise
    # dominates and the cepstra pick up phase-dependent junk.
    floor = jnp.max(lm, axis=(-2, -1), keepdims=True) - 8.0 * np.log(10.0)
    lm = jnp.maximum(lm, floor)
    basis = jnp.asarray(_dct2_matrix(cfg.n_mels, n_coeffs))
    return (lm @ basis)[..., 1:]  # drop c0 (energy)


def mcd(a: jax.Array, b: jax.Array, cfg: FrontendConfig,
        n_coeffs: int = 13) -> jax.Array:
    """Mean mel-cepstral distortion in dB between equal-length waveforms.

    MCD = (10 * sqrt(2) / ln 10) * mean_t ||c_a(t) - c_b(t)||_2, the
    conventional dB scaling for natural-log cepstra.
    """
    ca = mel_cepstra(a, cfg, n_coeffs)
    cb = mel_cepstra(b, cfg, n_coeffs)
    per_frame = jnp.sqrt(jnp.sum((ca - cb) ** 2, axis=-1) + 1e-12)
    # The outermost frames see the reflect-padding seam, whose magnitude
    # STFT genuinely depends on the signal's phase at the clip boundary
    # (measured: seam frames score 20-80x the interior on a pure time
    # shift). Score interior frames only; the seam spans
    # ceil(pad / hop) = 2 frames each side at the default geometry.
    seam = -(-((cfg.n_fft - cfg.hop_length) // 2) // cfg.hop_length)
    if per_frame.shape[-1] > 2 * seam + 1:
        per_frame = per_frame[..., seam:-seam]
    return (10.0 * np.sqrt(2.0) / np.log(10.0)) * jnp.mean(per_frame)
