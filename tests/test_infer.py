"""Fused two-stage inference tests (SURVEY.md §4.2, §3.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.config import TINY
from music_synthesis_tpu.infer.generate import (
    chunk_frames,
    generate,
    generate_direct,
    vocode_chunked,
)
from music_synthesis_tpu.models.vocoder import Vocoder
from music_synthesis_tpu.train import stage1, stage2

KEY = jax.random.PRNGKey(0)


def test_chunk_frames_layout():
    mel = jnp.arange(2 * 32 * 4, dtype=jnp.float32).reshape(2, 32, 4)
    chunks = chunk_frames(mel, 16, 8)
    assert chunks.shape == (2, 3, 16, 4)
    np.testing.assert_array_equal(
        np.asarray(chunks[:, 1]), np.asarray(mel[:, 8:24])
    )


def test_generate_end_to_end_shapes():
    cfg = TINY
    s1 = stage1.make_train_state(cfg, KEY)
    s2 = stage2.make_train_state(cfg, jax.random.PRNGKey(1))
    z = jax.random.normal(KEY, (2, cfg.specgan.latent_dim))
    wav = jax.jit(generate, static_argnums=0)(
        cfg, s1.g_params, s2.g_params, z
    )
    assert wav.shape == (2, cfg.specgan.n_frames * cfg.vocoder.hop_length)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0 + 1e-5


def test_chunked_matches_direct_in_interior():
    """Away from chunk boundaries (vocoder receptive field), chunked OLA
    output equals whole-mel vocoding: the overlap covers edge effects."""
    cfg = TINY
    s2 = stage2.make_train_state(cfg, KEY)
    mel = jax.random.normal(jax.random.PRNGKey(3), (1, 32, cfg.vocoder.n_mels))
    voc = Vocoder(cfg.vocoder)
    direct = np.asarray(voc.apply({"params": s2.g_params}, mel))
    chunked = np.asarray(vocode_chunked(voc, s2.g_params, mel, cfg))
    assert chunked.shape == direct.shape
    err = np.abs(chunked - direct)
    hop = cfg.vocoder.hop_length
    # Compare the central region of each chunk interior; boundaries blend
    # chunks whose receptive field was truncated, so only check the middle.
    mid = slice(12 * hop, 20 * hop)
    np.testing.assert_allclose(chunked[:, mid], direct[:, mid], atol=5e-3)
    assert err.mean() < 2e-2


def test_generate_direct_shape():
    cfg = TINY
    s1 = stage1.make_train_state(cfg, KEY)
    s2 = stage2.make_train_state(cfg, jax.random.PRNGKey(1))
    z = jax.random.normal(KEY, (1, cfg.specgan.latent_dim))
    wav = generate_direct(cfg, s1.g_params, s2.g_params, z)
    assert wav.shape == (1, cfg.specgan.n_frames * cfg.vocoder.hop_length)


def test_generate_long_duration_control():
    """z[B, N, Z] stitches N patches into one long waveform (C17 'seconds')."""
    from music_synthesis_tpu.infer.generate import generate_long

    cfg = TINY
    s1 = stage1.make_train_state(cfg, KEY)
    s2 = stage2.make_train_state(cfg, jax.random.PRNGKey(1))
    n_patches, crossfade = 3, 4
    z = jax.random.normal(KEY, (2, n_patches, cfg.specgan.latent_dim))
    wav = jax.jit(generate_long, static_argnums=(0, 4))(
        cfg, s1.g_params, s2.g_params, z, crossfade
    )
    t = cfg.specgan.n_frames
    t_long = (n_patches - 1) * (t - crossfade) + t
    usable = t_long - (t_long - cfg.infer.chunk_frames) % cfg.infer.hop_frames
    assert wav.shape == (2, usable * cfg.vocoder.hop_length)
    assert np.isfinite(np.asarray(wav)).all()
    # Longer than a single patch, as promised.
    assert wav.shape[1] > t * cfg.vocoder.hop_length


def test_generate_long_mel_stitching_is_cola():
    """With identical patches, crossfade stitching reproduces the patch
    values exactly in every interior frame (COLA over the frame axis)."""
    import dataclasses

    from music_synthesis_tpu.infer import generate as gen_mod

    cfg = TINY
    t, m = cfg.specgan.n_frames, cfg.specgan.n_mels
    const = jnp.broadcast_to(
        jnp.linspace(-1, 1, m), (1, 4, t, m)
    )  # same patch 4x
    window = gen_mod.ola_window(t, t - 4)[:, None]
    stacked = jnp.moveaxis(const * window, -1, 1)
    stitched = gen_mod.overlap_add(stacked, t - 4)
    norm = gen_mod.ola_normalizer(gen_mod.ola_window(t, t - 4), 4, t - 4)
    out = jnp.moveaxis(stitched / norm, 1, -1)
    np.testing.assert_allclose(
        np.asarray(out[0, 2:-2]),
        np.broadcast_to(np.linspace(-1, 1, m), (out.shape[1] - 4, m)),
        rtol=1e-5, atol=1e-6,
    )


def test_istft_synthesis_matches_numpy_irfft():
    from music_synthesis_tpu.ops.istft import irdft_matrices, istft_synthesis

    rng = np.random.default_rng(0)
    n_fft = 16
    re = rng.standard_normal((1, 12, n_fft // 2 + 1)).astype(np.float32)
    im = rng.standard_normal((1, 12, n_fft // 2 + 1)).astype(np.float32)
    im[..., 0] = 0.0
    im[..., -1] = 0.0
    ic, is_ = irdft_matrices(n_fft)
    frames = re @ ic + im @ is_
    want = np.fft.irfft(re + 1j * im, n=n_fft, axis=-1)
    np.testing.assert_allclose(frames, want, atol=1e-5)
    wav = istft_synthesis(jnp.asarray(re), jnp.asarray(im), n_fft, 4)
    assert wav.shape == (1, 12 * 4)
    assert np.isfinite(np.asarray(wav)).all()


def test_vocoder_istft_head():
    import dataclasses

    from music_synthesis_tpu.models.vocoder import Vocoder

    cfg = dataclasses.replace(
        TINY.vocoder,
        head="istft",
        upsample_factors=(8, 8),
        istft_n_fft=16,
        istft_hop=4,
    )
    assert cfg.hop_length == 256  # 8*8*4
    model = Vocoder(cfg)
    mel = jax.random.normal(KEY, (2, 8, cfg.n_mels))
    wav = model.apply(model.init(KEY, mel), mel)
    assert wav.shape == (2, 8 * 256)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_generate_long_refined_shape_matches_unrefined():
    """generate_long_refined: same duration/shape as generate_long, finite
    (the stitch half is shared code — stitch_long_mel)."""
    import jax
    import jax.numpy as jnp

    from music_synthesis_tpu.config import TINY
    from music_synthesis_tpu.infer.generate import (
        generate_long, generate_long_refined,
    )
    from music_synthesis_tpu.models.specgan import SpectrogramGenerator
    from music_synthesis_tpu.models.vocoder import Vocoder

    cfg = TINY
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (1, 3, cfg.specgan.latent_dim))
    sg = SpectrogramGenerator(cfg.specgan).init(
        key, z[:, 0])["params"]
    vp = Vocoder(cfg.vocoder).init(
        key, jnp.zeros((1, cfg.specgan.n_frames, cfg.vocoder.n_mels))
    )["params"]
    base = jax.jit(generate_long, static_argnums=(0, 4))(cfg, sg, vp, z, 4)
    ref = jax.jit(generate_long_refined, static_argnums=(0, 4, 5))(
        cfg, sg, vp, z, 4, 2)
    assert ref.shape == base.shape
    assert bool(jnp.isfinite(ref).all())
