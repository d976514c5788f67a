"""Mel-cepstral distortion metric (ops/cepstrum.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_synthesis_tpu.config import FrontendConfig
from music_synthesis_tpu.ops.cepstrum import _dct2_matrix, mcd, mel_cepstra


CFG = FrontendConfig()
L = 4 * CFG.hop_length * 8  # short multiple of hop


def _tone(freq, l=L, sr=CFG.sample_rate, amp=0.3):
    t = np.arange(l) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)[None]


def test_dct_matrix_is_orthonormal():
    b = _dct2_matrix(128, 127)  # full square basis
    eye = b.T @ b
    np.testing.assert_allclose(eye, np.eye(128), atol=1e-5)


def test_mcd_zero_on_identical():
    x = jnp.asarray(_tone(440.0))
    assert float(mcd(x, x, CFG)) < 1e-3


def test_mcd_phase_blind_but_tilt_sensitive():
    x = jnp.asarray(_tone(440.0))
    # Pure phase shift (quarter period) leaves the magnitude STFT — and so
    # the cepstra — nearly unchanged...
    shift = int(CFG.sample_rate / 440.0 / 4)
    x_shift = jnp.asarray(_tone(440.0, l=L + shift))[:, shift:]
    d_phase = float(mcd(x, x_shift, CFG))
    # ...while a spectral-envelope change (different pitch) moves it a lot.
    # A small phase residual remains (negative-frequency leakage of the
    # windowed sinusoid interferes phase-dependently): ~1.5 dB measured,
    # vs ~264 dB for the pitch change — assert the separation.
    y = jnp.asarray(_tone(880.0))
    d_tilt = float(mcd(x, y, CFG))
    assert d_phase < 3.0
    assert d_tilt > 20.0 * d_phase


def test_mcd_symmetric_and_jittable():
    x = jnp.asarray(_tone(440.0))
    y = jnp.asarray(_tone(660.0, amp=0.2))
    f = jax.jit(lambda a, b: mcd(a, b, CFG))
    d1, d2 = float(f(x, y)), float(f(y, x))
    assert d1 == pytest.approx(d2, rel=1e-5)
    assert np.isfinite(d1) and d1 > 0


def test_cepstra_shape():
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(2, L)).astype(np.float32))
    c = mel_cepstra(x, CFG, n_coeffs=13)
    assert c.shape == (2, L // CFG.hop_length, 13)
