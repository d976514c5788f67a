"""Griffin-Lim mel inversion: the model-free vocoder baseline.

A complete framework needs audio out of a mel WITHOUT a trained vocoder —
for corpus debugging, for listening to stage-1 composer output before
stage 2 exists, and as the classical anchor that contextualizes the
neural vocoder's copy-synthesis distance (scripts/eval_checkpoint.py
reports ~2.08 for the trained system; Griffin-Lim bounds what phase-less
spectral inversion alone achieves).

TPU-shaped: the mel pseudo-inverse and every analysis/synthesis pass are
GEMMs/FFTs inside one ``lax.scan`` over iterations — a single jittable
program, no Python loop per iteration. Uses the momentum-accelerated
update (Perraudin et al. 2013, the librosa formulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.config import FrontendConfig
from music_synthesis_tpu.ops.frontend import mel_matrix, stft
from music_synthesis_tpu.ops.istft import istft_synthesis

__all__ = ["mel_pinv_matrix", "log_mel_to_magnitude", "griffin_lim",
           "griffin_lim_refine", "refine_with_log_mel", "invert_log_mel"]


@functools.lru_cache(maxsize=4)
def _pinv_cached(sample_rate, n_fft, n_mels, fmin, fmax) -> np.ndarray:
    m = mel_matrix(sample_rate, n_fft, n_mels, fmin, fmax)  # [F, n_mels]
    return np.linalg.pinv(m).astype(np.float32)  # [n_mels, F]


def mel_pinv_matrix(cfg: FrontendConfig) -> np.ndarray:
    """Moore-Penrose inverse of the mel filterbank, ``[n_mels, F]``."""
    return _pinv_cached(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                        cfg.fmin, cfg.fmax_resolved)


def log_mel_to_magnitude(logmel: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """Invert the front-end's compression: ``[.., T, n_mels] -> [.., T, F]``
    linear magnitude (exactly undoing log_mel's eps/power conventions)."""
    mel_lin = jnp.maximum(jnp.exp(logmel) - cfg.log_epsilon, 0.0)
    # fp32 GEMM: the pinv output feeds log-magnitude losses that score
    # near-empty bins, where TPU's default bf16 matmul error dominates
    # (measured: GL tone distance 1.693 default vs 0.678 CPU, round 4).
    spec = jnp.maximum(
        jnp.matmul(mel_lin, jnp.asarray(mel_pinv_matrix(cfg)),
                   precision="highest"), 0.0)
    if cfg.power == 2.0:
        return jnp.sqrt(spec)
    if cfg.power == 1.0:
        return spec
    return jnp.power(spec, 1.0 / cfg.power)


def griffin_lim(
    mag: jax.Array,
    n_fft: int,
    hop: int,
    n_iter: int = 48,
    momentum: float = 0.99,
) -> jax.Array:
    """Phase recovery: magnitude frames ``[B, T, F] -> waveform [B, T*hop]``.

    The analysis/synthesis pair is the framework's own matched stft /
    istft_synthesis (Hann, COLA-normalized, centered trim), so the scan's
    fixed point is consistent with everything else in ops/.
    """
    mag = mag.astype(jnp.float32)
    angles0 = jnp.ones(mag.shape, jnp.complex64)
    rebuilt0 = jnp.zeros(mag.shape, jnp.complex64)
    return _gl_iterations(mag, angles0, rebuilt0, n_fft, hop,
                          n_iter, momentum)


def _synth(spec: jax.Array, n_fft: int, hop: int) -> jax.Array:
    # "highest": the irDFT GEMMs run every iteration; bf16 MXU error
    # compounds through the fixed point (see istft_synthesis docs).
    return istft_synthesis(
        jnp.real(spec), jnp.imag(spec), n_fft, hop, precision="highest")


def _analyze(wav: jax.Array, n_fft: int, hop: int) -> jax.Array:
    trim = (n_fft - hop) // 2
    pad = [(0, 0)] * (wav.ndim - 1) + [(trim, trim)]
    return stft(jnp.pad(wav, pad), n_fft=n_fft, hop_length=hop)


def _gl_iterations(
    mag: jax.Array,
    angles0: jax.Array,
    rebuilt0: jax.Array,
    n_fft: int,
    hop: int,
    n_iter: int,
    momentum: float,
) -> jax.Array:
    def body(carry, _):
        angles, rebuilt_prev = carry
        wav = _synth(mag * angles, n_fft, hop)
        rebuilt = _analyze(wav, n_fft, hop)
        angles = rebuilt - (momentum / (1.0 + momentum)) * rebuilt_prev
        angles = angles / (jnp.abs(angles) + 1e-16)
        return (angles, rebuilt), None

    (angles, _), _ = jax.lax.scan(
        body, (angles0, rebuilt0), None, length=n_iter)
    return _synth(mag * angles, n_fft, hop)


def griffin_lim_refine(
    mag: jax.Array,
    wav0: jax.Array,
    n_fft: int,
    hop: int,
    n_iter: int = 8,
    momentum: float = 0.99,
) -> jax.Array:
    """Warm-started Griffin-Lim: consistency-project ``wav0``'s phase onto
    the target magnitude ``mag`` (``[B, T, F]``) for ``n_iter`` iterations.

    This is the neural+classical hybrid: the vocoder supplies a phase
    estimate that is already structurally coherent (cold GL needs ~48
    iterations from random phase to converge on this corpus — DESIGN.md
    §15), and a handful of projections enforce STFT-consistency against
    the conditioning magnitude, the one thing the adversarially trained
    generator does NOT optimize exactly. n_iter=0 is a single
    magnitude-replacement synthesis (keep wav0's phase verbatim).

    Reference citation: the reference mount is empty (SURVEY.md §0); the
    reference has no refinement pass — this is a capability extension,
    off by default everywhere.
    """
    mag = mag.astype(jnp.float32)
    rebuilt0 = _analyze(wav0.astype(jnp.float32), n_fft, hop)
    angles0 = rebuilt0 / (jnp.abs(rebuilt0) + 1e-16)
    return _gl_iterations(mag, angles0, rebuilt0, n_fft, hop,
                          n_iter, momentum)


def refine_with_log_mel(
    wav: jax.Array, logmel: jax.Array, cfg: FrontendConfig, n_iter: int = 8
) -> jax.Array:
    """Refine a vocoded waveform ``[B, T*hop]`` against its own raw log-mel
    conditioning ``[B, T, n_mels]`` (log_mel_for_vocoder alignment).
    Jittable; cfg/n_iter static."""
    mag = log_mel_to_magnitude(logmel, cfg)
    return griffin_lim_refine(mag, wav, cfg.n_fft, cfg.hop_length,
                              n_iter=n_iter)


def invert_log_mel(
    logmel: jax.Array, cfg: FrontendConfig, n_iter: int = 48
) -> jax.Array:
    """Full baseline vocoder: vocoder-aligned log-mel ``[B, T, n_mels]``
    (log_mel_for_vocoder convention: one frame per hop) -> ``[B, T*hop]``.
    Jittable end to end; cfg/n_iter static."""
    mag = log_mel_to_magnitude(logmel, cfg)
    return griffin_lim(mag, cfg.n_fft, cfg.hop_length, n_iter=n_iter)
