"""Deployment-artifact tests (deploy.py): export -> serialize -> load ->
call must reproduce the live program exactly (SURVEY.md §1 L5 serving
surface; reference citation impossible — mount empty, SURVEY.md §0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_synthesis_tpu import deploy
from music_synthesis_tpu.config import TINY
from music_synthesis_tpu.infer.generate import generate
from music_synthesis_tpu.models.vocoder import Vocoder
from music_synthesis_tpu.train import stage1, stage2

KEY = jax.random.PRNGKey(0)


def _vocoder_params():
    return stage2.make_train_state(TINY, KEY).g_params


@pytest.mark.slow
def test_vocoder_artifact_roundtrip(tmp_path):
    params = _vocoder_params()
    exported, meta = deploy.vocoder_artifact(
        params, TINY.vocoder, n_frames=16, batch=2, platforms=("cpu",),
        provenance={"run": "unit-test"},
    )
    path = deploy.save_artifact(tmp_path / "voc.msx", exported, meta)

    art = deploy.load_artifact(path)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 16, TINY.vocoder.n_mels))
    got = np.asarray(art(mel))
    want = np.asarray(Vocoder(TINY.vocoder).apply({"params": params}, mel))
    np.testing.assert_allclose(got, want, atol=1e-6)

    assert art.meta["kind"] == "vocoder_copy_synthesis"
    assert art.meta["provenance"] == {"run": "unit-test"}
    assert art.meta["inputs"][0]["shape"] == [2, 16, TINY.vocoder.n_mels]
    assert art.meta["n_params_baked"] == sum(
        int(x.size) for x in jax.tree.leaves(params)
    )


def test_vocoder_artifact_symbolic_batch(tmp_path):
    """batch=None exports a symbolic leading dim: one artifact, any batch."""
    params = _vocoder_params()
    exported, meta = deploy.vocoder_artifact(
        params, TINY.vocoder, n_frames=8, batch=None, platforms=("cpu",)
    )
    assert meta["inputs"][0]["shape"][0] == "b"
    art = deploy.load_artifact(
        deploy.save_artifact(tmp_path / "voc_poly.msx", exported, meta)
    )
    voc = Vocoder(TINY.vocoder)
    for b in (1, 3):
        mel = jax.random.normal(jax.random.PRNGKey(b), (b, 8, TINY.vocoder.n_mels))
        np.testing.assert_allclose(
            np.asarray(art(mel)),
            np.asarray(voc.apply({"params": params}, mel)),
            atol=1e-6,
        )


def test_pipeline_artifact_matches_generate(tmp_path):
    s1 = stage1.make_train_state(TINY, KEY)
    s2 = stage2.make_train_state(TINY, jax.random.PRNGKey(1))
    exported, meta = deploy.pipeline_artifact(
        TINY, s1.g_params, s2.g_params, batch=2, platforms=("cpu",)
    )
    art = deploy.load_artifact(
        deploy.save_artifact(tmp_path / "pipe.msx", exported, meta)
    )
    z = jax.random.normal(jax.random.PRNGKey(2), (2, TINY.specgan.latent_dim))
    got = np.asarray(art(z))
    want = np.asarray(
        jax.jit(generate, static_argnums=0)(TINY, s1.g_params, s2.g_params, z)
    )
    assert got.shape == (2, TINY.specgan.n_frames * TINY.vocoder.hop_length)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # Both parameter sets are baked in.
    n_both = sum(
        int(x.size)
        for x in jax.tree.leaves({"s": s1.g_params, "v": s2.g_params})
    )
    assert meta["n_params_baked"] == n_both


def test_read_meta_without_deserialize(tmp_path):
    params = _vocoder_params()
    exported, meta = deploy.vocoder_artifact(
        params, TINY.vocoder, n_frames=8, batch=1, platforms=("cpu",)
    )
    path = deploy.save_artifact(tmp_path / "a.msx", exported, meta)
    read = deploy.read_meta(path)
    assert read["platforms"] == ["cpu"]
    assert read["format_version"] == deploy.FORMAT_VERSION
    assert read["jax_version"] == jax.__version__


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "junk.msx"
    p.write_bytes(b"NOTANARTIFACT")
    with pytest.raises(ValueError, match="bad magic"):
        deploy.read_meta(p)


def test_batch_validation():
    params = _vocoder_params()
    with pytest.raises(ValueError, match="batch"):
        deploy.vocoder_artifact(
            params, TINY.vocoder, n_frames=8, batch=0, platforms=("cpu",)
        )
