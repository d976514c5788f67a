"""Phase-jitter metric tests (ops/phase.py).

The metric exists to catch what the magnitude-only judged metric cannot:
Griffin-Lim-style inter-frame phase incoherence (runs/gl_anchor measured
GL BETTER than the trained vocoder on multires_stft_distance while sounding
worse). These tests pin the three properties that make the ratio usable:
steady tones score ~0, identity copies score ratio 1, and a random-phase
reconstruction with a near-perfect MAGNITUDE spectrum scores >> 1 on phase
jitter even though the magnitude metric barely moves.
"""

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.losses.stft_loss import multires_stft_loss
from music_synthesis_tpu.ops.frontend import stft
from music_synthesis_tpu.ops.istft import istft_synthesis
from music_synthesis_tpu.ops.phase import phase_jitter, phase_jitter_ratio

SR = 22050
N_FFT = 1024
HOP = 256


def _tone(freq=440.0, n=8192, amp=0.5):
    t = np.arange(n) / SR
    return jnp.asarray(amp * np.sin(2 * np.pi * freq * t), jnp.float32)[None]


def _music_like(n=8192, seed=0):
    """A few partials + mild noise: realistic nonzero baseline jitter."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    x = sum(a * np.sin(2 * np.pi * f * t + p) for a, f, p in
            [(0.4, 220, 0.1), (0.2, 440, 1.3), (0.1, 1330, 2.2)])
    x = x + 0.01 * rng.standard_normal(n)
    return jnp.asarray(x, jnp.float32)[None]


def _random_phase_resynth(x, seed=7):
    """Keep |STFT(x)| exactly, replace all phases with uniform noise."""
    s = stft(x, n_fft=N_FFT, hop_length=HOP)
    key = jax.random.PRNGKey(seed)
    phi = jax.random.uniform(key, s.shape, jnp.float32, 0.0, 2 * np.pi)
    mag = jnp.abs(s)
    return istft_synthesis(mag * jnp.cos(phi), mag * jnp.sin(phi), N_FFT, HOP)


def test_steady_tone_has_near_zero_jitter():
    j = float(phase_jitter(_tone(), N_FFT, HOP))
    # Constant per-bin phase advance cancels exactly in the second
    # difference; only fp32 angle noise on tiny side-lobe cells remains.
    assert j < 0.05, j


def test_identity_ratio_is_one():
    x = _music_like()
    r = float(phase_jitter_ratio(x, x, N_FFT, HOP))
    np.testing.assert_allclose(r, 1.0, rtol=1e-6)


def test_random_phase_resynth_caught_by_jitter_not_by_magnitude():
    x = _music_like()
    y = _random_phase_resynth(x)
    n = min(x.shape[1], y.shape[1])  # no-centering STFT shortens the resynth
    x, y = x[:, :n], y[:, :n]

    # The magnitude metric is nearly blind to the corruption: the score
    # stays below the white-noise calibration anchor (6.60) by a wide
    # margin even though the signal is perceptually wrecked.
    mag_dist = float(multires_stft_loss(y, x))
    assert mag_dist < 3.0, mag_dist

    # The phase metric is not.
    r = float(phase_jitter_ratio(y, x, N_FFT, HOP))
    assert r > 3.0, r


def test_batched_pooling_matches_scalar():
    a, b = _music_like(seed=1), _music_like(seed=2)
    both = jnp.concatenate([a, b], axis=0)
    j = float(phase_jitter(both, N_FFT, HOP))
    ja, jb = (float(phase_jitter(v, N_FFT, HOP)) for v in (a, b))
    assert min(ja, jb) <= j <= max(ja, jb)
