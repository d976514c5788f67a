"""Model unit tests (SURVEY.md §4.2): shapes, weight norm, gradient flow."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_synthesis_tpu.config import TINY
from music_synthesis_tpu.models.discriminators import (
    CombinedDiscriminator,
    MultiResSTFTDiscriminator,
    MultiScaleDiscriminator,
)
from music_synthesis_tpu.models.specgan import (
    SpectrogramDiscriminator,
    SpectrogramGenerator,
)
from music_synthesis_tpu.models.vocoder import Vocoder
from music_synthesis_tpu.ops.conv import WNConv, WNConvTranspose1d, avg_pool1d

KEY = jax.random.PRNGKey(0)


def test_wnconv_weight_norm_semantics():
    """At init, kernel == v (g = ||v||); scaling g scales output norm."""
    m = WNConv(8, (3,), padding="valid")
    x = jax.random.normal(KEY, (1, 16, 4))
    params = m.init(KEY, x)["params"]
    v, g = params["v"], params["g"]
    norm = np.sqrt((np.asarray(v) ** 2).sum(axis=(0, 1)))
    np.testing.assert_allclose(np.asarray(g), norm, rtol=1e-5)
    out1 = m.apply({"params": params}, x)
    params2 = dict(params, g=g * 2.0)
    out2 = m.apply({"params": params2}, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1) * 2.0,
                               rtol=1e-4, atol=1e-6)


def test_wnconv_strided_grouped_shapes():
    m = WNConv(16, (41,), strides=(4,), groups=4, padding="same")
    x = jax.random.normal(KEY, (2, 256, 8))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == (2, 64, 16)


def test_wnconv_transpose_exact_upsample():
    for u in (2, 8):
        m = WNConvTranspose1d(4, kernel_size=2 * u, stride=u)
        x = jax.random.normal(KEY, (2, 10, 6))
        out = m.apply(m.init(KEY, x), x)
        assert out.shape == (2, 10 * u, 4)


def test_avg_pool_matches_numpy_interior():
    x = jax.random.normal(KEY, (1, 64, 1))
    out = np.asarray(avg_pool1d(x, window=4, stride=2, pad=1))
    xn = np.asarray(x)[0, :, 0]
    # Interior windows (fully inside) are plain means of 4 samples.
    np.testing.assert_allclose(out[0, 1, 0], xn[1:5].mean(), rtol=1e-5)
    np.testing.assert_allclose(out[0, 2, 0], xn[3:7].mean(), rtol=1e-5)
    # Edge window is normalized by true count (count_include_pad=False).
    np.testing.assert_allclose(out[0, 0, 0], xn[0:3].mean(), rtol=1e-5)


def test_vocoder_shape_and_hop():
    cfg = TINY.vocoder
    assert cfg.hop_length == 256
    model = Vocoder(cfg)
    mel = jax.random.normal(KEY, (2, 8, cfg.n_mels))
    params = model.init(KEY, mel)
    wav = model.apply(params, mel)
    assert wav.shape == (2, 8 * 256)
    assert np.abs(np.asarray(wav)).max() <= 1.0
    # Length-polymorphic: same params, longer input.
    mel2 = jax.random.normal(KEY, (2, 12, cfg.n_mels))
    assert model.apply(params, mel2).shape == (2, 12 * 256)


def test_msd_heads_and_features():
    cfg = TINY.msd
    model = MultiScaleDiscriminator(cfg)
    wav = jax.random.normal(KEY, (2, 2048))
    params = model.init(KEY, wav)
    logits, feats = model.apply(params, wav)
    assert len(logits) == cfg.n_scales == len(feats)
    # Each downstream scale sees half the samples.
    assert logits[1].shape[1] < logits[0].shape[1]
    assert all(len(f) == len(cfg.strides) + 2 for f in feats)


def test_mrd_heads():
    model = MultiResSTFTDiscriminator(TINY.mrd)
    wav = jax.random.normal(KEY, (2, 2048))
    logits, feats = model.apply(model.init(KEY, wav), wav)
    assert len(logits) == len(TINY.mrd.resolutions)
    assert all(np.isfinite(np.asarray(l)).all() for l in logits)


def test_specgan_shapes():
    cfg = TINY.specgan
    gen = SpectrogramGenerator(cfg)
    z = jax.random.normal(KEY, (2, cfg.latent_dim))
    mel = gen.apply(gen.init(KEY, z), z)
    assert mel.shape == (2, cfg.n_frames, cfg.n_mels)
    assert np.abs(np.asarray(mel)).max() <= 1.0
    disc = SpectrogramDiscriminator(cfg)
    logit, feats = disc.apply(disc.init(KEY, mel), mel)
    assert logit.shape[0] == 2 and logit.shape[-1] == 1
    assert len(feats) == len(cfg.disc_channels)


@pytest.mark.slow
def test_gradients_flow_everywhere():
    """Every generator parameter receives nonzero gradient through D."""
    cfg = TINY
    voc = Vocoder(cfg.vocoder)
    disc = CombinedDiscriminator(cfg.msd, cfg.mrd)
    mel = jax.random.normal(KEY, (1, 8, cfg.vocoder.n_mels))
    vp = voc.init(KEY, mel)["params"]
    wav = voc.apply({"params": vp}, mel)
    dp = disc.init(jax.random.PRNGKey(1), wav)["params"]

    def g_loss(vparams):
        fake = voc.apply({"params": vparams}, mel)
        logits, _ = disc.apply({"params": dp}, fake)
        return -sum(jnp.mean(l) for l in logits)

    grads = jax.grad(g_loss)(vp)
    flat = flax.traverse_util.flatten_dict(grads)
    for path, g in flat.items():
        assert np.isfinite(np.asarray(g)).all(), path
        assert np.abs(np.asarray(g)).max() > 0, f"zero grad at {path}"


def test_bfloat16_compute_dtype_smoke():
    """bf16 conv path: f32 params/outputs, finite values, close to f32."""
    import dataclasses

    cfg32 = TINY.vocoder
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    mel = jax.random.normal(KEY, (1, 8, cfg32.n_mels))
    m32, m16 = Vocoder(cfg32), Vocoder(cfg16)
    params = m32.init(KEY, mel)
    w32 = np.asarray(m32.apply(params, mel))
    w16 = np.asarray(m16.apply(params, mel))  # same params, bf16 compute
    assert w16.dtype == np.float32
    assert np.isfinite(w16).all()
    # bf16 has ~3 decimal digits; outputs are tanh-bounded.
    assert np.abs(w32 - w16).max() < 0.1


def test_vocoder_repeat_upsample_mode():
    import dataclasses

    cfg = dataclasses.replace(TINY.vocoder, upsample_mode="repeat")
    model = Vocoder(cfg)
    mel = jax.random.normal(KEY, (1, 8, cfg.n_mels))
    wav = model.apply(model.init(KEY, mel), mel)
    assert wav.shape == (1, 8 * 256)
    assert np.isfinite(np.asarray(wav)).all()
