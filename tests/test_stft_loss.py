"""Multi-res STFT distance tests — the judged parity metric (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_synthesis_tpu.config import STFTLossConfig
from music_synthesis_tpu.losses.stft_loss import multires_stft_loss, stft_distance

CFG = STFTLossConfig(resolutions=((256, 64, 256), (512, 128, 512)))


def test_zero_for_identical(rng):
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    loss = multires_stft_loss(x, x, CFG)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-5)


def test_positive_and_ordered(rng):
    y = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    near = y + 0.01 * jnp.asarray(rng.standard_normal(y.shape).astype(np.float32))
    far = jnp.asarray(rng.standard_normal(y.shape).astype(np.float32))
    l_near = float(multires_stft_loss(near, y, CFG))
    l_far = float(multires_stft_loss(far, y, CFG))
    assert 0 < l_near < l_far


def test_grad_finite_even_for_silence(rng):
    """eps floor keeps log/sqrt grads finite at zero signal."""
    y = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32))
    g = jax.grad(lambda x: multires_stft_loss(x, y, CFG))(jnp.zeros_like(y))
    assert np.isfinite(np.asarray(g)).all()


def test_stft_distance_components(rng):
    x = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    sc, mag = stft_distance(x * 0.5, x, 512, 128, 512)
    assert float(sc) > 0 and float(mag) > 0
    # Pure gain error: log-mag L1 equals |log 0.5| exactly.
    np.testing.assert_allclose(float(mag), abs(np.log(0.5)), rtol=1e-4)


def test_multires_loss_matches_independent_torch_implementation(rng):
    """The judged parity metric cross-checked against a from-scratch torch
    implementation (independent STFT + norms)."""
    torch = pytest.importorskip("torch")

    x = rng.standard_normal(4096).astype(np.float32)
    y = (x + 0.1 * rng.standard_normal(4096)).astype(np.float32)

    def torch_distance(a, b, n_fft, hop, win):
        sa = torch.stft(torch.from_numpy(a), n_fft, hop, win,
                        window=torch.hann_window(win, periodic=True),
                        center=False, return_complex=True)
        sb = torch.stft(torch.from_numpy(b), n_fft, hop, win,
                        window=torch.hann_window(win, periodic=True),
                        center=False, return_complex=True)
        ma = torch.clamp(sa.abs(), min=np.sqrt(1e-7))
        mb = torch.clamp(sb.abs(), min=np.sqrt(1e-7))
        sc = torch.norm(mb - ma) / torch.norm(mb)
        mag = torch.mean(torch.abs(torch.log(ma) - torch.log(mb)))
        return float(sc + mag)

    want = sum(
        torch_distance(x, y, f, h, w) for f, h, w in CFG.resolutions
    ) / len(CFG.resolutions)
    got = float(multires_stft_loss(jnp.asarray(x)[None], jnp.asarray(y)[None], CFG))
    np.testing.assert_allclose(got, want, rtol=1e-3)
