"""DSP front-end parity fixtures (SURVEY.md §4.1).

The pure-JAX front-end is validated against independent implementations:
numpy strided framing, torch.stft, and a from-scratch numpy mel filterbank —
then serves as the oracle for the Pallas kernel (test_pallas_frontend.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_synthesis_tpu.config import FrontendConfig
from music_synthesis_tpu.ops import frontend as fe


def _np_frames(x, win, hop):
    n = 1 + (len(x) - win) // hop
    return np.stack([x[i * hop : i * hop + win] for i in range(n)])


def test_frame_matches_numpy(rng):
    x = rng.standard_normal(5000).astype(np.float32)
    got = np.asarray(fe.frame(jnp.asarray(x), 1024, 256))
    want = _np_frames(x, 1024, 256)
    np.testing.assert_array_equal(got, want)


def test_frame_batched_and_nondivisible_hop(rng):
    x = rng.standard_normal((3, 4096)).astype(np.float32)
    got = np.asarray(fe.frame(jnp.asarray(x), 512, 160))  # 512 % 160 != 0
    for b in range(3):
        np.testing.assert_array_equal(got[b], _np_frames(x[b], 512, 160))


def test_stft_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal(8192).astype(np.float32)
    got = np.asarray(fe.stft(jnp.asarray(x), 1024, 256))
    want = torch.stft(
        torch.from_numpy(x),
        n_fft=1024,
        hop_length=256,
        window=torch.hann_window(1024, periodic=True),
        center=False,
        return_complex=True,
    ).numpy().T  # torch gives [freq, time]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mel_matrix_properties():
    m = fe.mel_matrix(22050, 1024, 128)
    assert m.shape == (513, 128)
    assert (m >= 0).all()
    # Every filter has support, and peak bins are monotonically increasing.
    assert (m.sum(axis=0) > 0).all()
    peaks = m.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    # Filters tile the band: every bin between the first and last peak is
    # covered by at least one filter.
    covered = m.sum(axis=1)
    assert (covered[peaks[0] : peaks[-1]] > 0).all()


def test_mel_matrix_matches_independent_construction():
    """Cross-check one triangle against a direct formula evaluation."""
    sr, n_fft, n_mels = 22050, 1024, 8
    m = fe.mel_matrix(sr, n_fft, n_mels)
    # Recompute mel band edges independently (Slaney scale).
    def hz2mel(f):
        return np.where(
            np.asarray(f) < 1000.0,
            np.asarray(f) / (200.0 / 3),
            15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / (np.log(6.4) / 27.0),
        )

    def mel2hz(mm):
        return np.where(
            np.asarray(mm) < 15.0,
            np.asarray(mm) * (200.0 / 3),
            1000.0 * np.exp((np.asarray(mm) - 15.0) * (np.log(6.4) / 27.0)),
        )

    edges = mel2hz(np.linspace(hz2mel(0.0), hz2mel(sr / 2), n_mels + 2))
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    i = 3
    lo, c, hi = edges[i], edges[i + 1], edges[i + 2]
    tri = np.maximum(
        0.0, np.minimum((freqs - lo) / (c - lo), (hi - freqs) / (hi - c))
    )
    tri *= 2.0 / (hi - lo)
    np.testing.assert_allclose(m[:, i], tri, rtol=1e-4, atol=1e-6)


def test_log_mel_shapes_and_finiteness(rng):
    cfg = FrontendConfig()
    x = jnp.asarray(rng.standard_normal((2, 22050)).astype(np.float32))
    out = fe.log_mel(x, cfg)
    t = 1 + (22050 - 1024) // 256
    assert out.shape == (2, t, 128)
    assert np.isfinite(np.asarray(out)).all()
    # Silence maps to log(eps).
    silent = fe.log_mel(jnp.zeros((1, 4096)), cfg)
    np.testing.assert_allclose(
        np.asarray(silent), np.log(cfg.log_epsilon), rtol=1e-5
    )


def test_log_mel_for_vocoder_alignment(rng):
    cfg = FrontendConfig()
    for length in (8192, 22016):
        x = jnp.asarray(rng.standard_normal((1, length)).astype(np.float32))
        mel = fe.log_mel_for_vocoder(x, cfg)
        assert mel.shape == (1, length // cfg.hop_length, cfg.n_mels)


def test_dft_matrices_reproduce_rfft(rng):
    """frames @ C + 1j * frames @ S == rfft(hann * frames) (SURVEY.md §3.5)."""
    C, S = fe.dft_matrices(1024)
    assert C.shape == (1024, 640) and S.shape == (1024, 640)
    frames = rng.standard_normal((4, 1024)).astype(np.float32)
    w = np.asarray(fe.hann_window(1024))
    want = np.fft.rfft(frames * w, axis=-1)
    re = frames @ C
    im = frames @ S
    np.testing.assert_allclose(re[:, :513], want.real, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(im[:, :513], want.imag, rtol=1e-3, atol=1e-3)
    assert np.abs(re[:, 513:]).max() == 0 and np.abs(im[:, 513:]).max() == 0


def test_log_mel_jit_and_grad(rng):
    cfg = FrontendConfig(n_mels=32)
    x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    f = jax.jit(lambda s: fe.log_mel(s, cfg))
    np.testing.assert_allclose(
        np.asarray(f(x)), np.asarray(fe.log_mel(x, cfg)), rtol=1e-5, atol=1e-5
    )
    g = jax.grad(lambda s: fe.log_mel(s, cfg).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
