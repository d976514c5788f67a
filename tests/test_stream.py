"""StreamingSynth == generate_long on the same latent sequence."""

import jax
import numpy as np
import pytest

from music_synthesis_tpu.config import TINY
from music_synthesis_tpu.infer.generate import generate_long
from music_synthesis_tpu.infer.stream import StreamingSynth
from music_synthesis_tpu.models.specgan import SpectrogramGenerator
from music_synthesis_tpu.models.vocoder import Vocoder

KEY = jax.random.PRNGKey(3)


@pytest.fixture(scope="module")
def params():
    z0 = jax.numpy.zeros((1, TINY.specgan.latent_dim))
    sg = SpectrogramGenerator(TINY.specgan).init(KEY, z0)["params"]
    m0 = jax.numpy.zeros((1, 8, TINY.vocoder.n_mels))
    vp = Vocoder(TINY.vocoder).init(KEY, m0)["params"]

    def jitter(p, s):
        leaves, td = jax.tree.flatten(p)
        ks = jax.random.split(jax.random.PRNGKey(s), len(leaves))
        return jax.tree.unflatten(td, [
            x + 0.3 * jax.random.normal(k, x.shape)
            for x, k in zip(leaves, ks)])

    return jitter(sg, 1), jitter(vp, 2)


@pytest.mark.parametrize("cf", [4, 0])
def test_stream_matches_generate_long(params, cf):
    sg, vp = params
    b, n = 2, 5
    z = jax.random.normal(
        jax.random.PRNGKey(9), (b, n, TINY.specgan.latent_dim))
    ref = np.asarray(generate_long(TINY, sg, vp, z, crossfade_frames=cf))

    s = StreamingSynth(TINY, sg, vp, crossfade_frames=cf)
    parts = [s.feed(z[:, i]) for i in range(n)]
    parts.append(s.finish())
    out = np.concatenate(parts, axis=-1)

    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # Audio must actually arrive incrementally, not all in the flush.
    emitted_early = sum(p.shape[-1] for p in parts[:-1])
    assert emitted_early > 0.5 * ref.shape[-1]


def test_stream_state_is_bounded(params):
    """Host buffers stay O(patch + chunk) regardless of stream length."""
    sg, vp = params
    s = StreamingSynth(TINY, sg, vp, crossfade_frames=4)
    sizes = []
    for i in range(12):
        s.feed(jax.random.normal(
            jax.random.PRNGKey(i), (1, TINY.specgan.latent_dim)))
        sizes.append((
            s._mel_acc.shape[1],
            0 if s._final_mel is None else s._final_mel.shape[1],
            0 if s._wav_acc is None else s._wav_acc.shape[1],
        ))
    # After warm-up the tail sizes are periodic, not growing.
    assert sizes[-1] == sizes[-3], sizes[-4:]


def test_stream_finish_is_terminal(params):
    sg, vp = params
    s = StreamingSynth(TINY, sg, vp, crossfade_frames=4)
    s.feed(jax.random.normal(KEY, (1, TINY.specgan.latent_dim)))
    s.finish()
    with pytest.raises(AssertionError):
        s.feed(jax.random.normal(KEY, (1, TINY.specgan.latent_dim)))
