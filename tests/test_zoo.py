"""Model-zoo roundtrip: save_pretrained -> load_pretrained reproduces the
exact parameter pytree and model config (SURVEY.md §1 L5 demo surface;
ROADMAP 'trained model zoo')."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_synthesis_tpu import zoo
from music_synthesis_tpu.config import TINY, MelScaler
from music_synthesis_tpu.models.vocoder import Vocoder

KEY = jax.random.PRNGKey(0)


@pytest.fixture()
def entry_dir(tmp_path):
    return tmp_path / "zoo"


def _tiny_vocoder_params():
    cfg = TINY.vocoder
    mel = jnp.zeros((1, 8, cfg.n_mels), jnp.float32)
    return cfg, Vocoder(cfg).init(KEY, mel)["params"]


def test_roundtrip_exact(entry_dir):
    cfg, params = _tiny_vocoder_params()
    scaler = MelScaler(shift=-4.012, scale=7.501)
    zoo.save_pretrained(
        "voc_test", "vocoder", params, cfg,
        frontend=TINY.frontend, mel_scaler=scaler,
        metrics={"copy_synthesis_multires_stft_distance_mean": 1.23},
        notes="test entry", root=entry_dir,
    )
    e = zoo.load_pretrained("voc_test", root=entry_dir)
    assert e.kind == "vocoder"
    assert e.config == cfg  # tuples restored from JSON lists
    assert e.frontend == TINY.frontend
    assert e.mel_scaler == scaler
    assert e.card["metrics"]["copy_synthesis_multires_stft_distance_mean"] == 1.23
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(e.params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Loaded params drive the rebuilt model directly.
    mel = jnp.zeros((2, 8, e.config.n_mels), jnp.float32)
    wav = Vocoder(e.config).apply({"params": e.params}, mel)
    assert wav.shape == (2, 8 * e.config.hop_length)
    assert bool(jnp.isfinite(wav).all())


def test_list_and_missing(entry_dir):
    assert zoo.list_pretrained(entry_dir) == []
    cfg, params = _tiny_vocoder_params()
    zoo.save_pretrained("a", "vocoder", params, cfg, root=entry_dir)
    zoo.save_pretrained("b", "vocoder", params, cfg, root=entry_dir)
    assert zoo.list_pretrained(entry_dir) == ["a", "b"]
    with pytest.raises(FileNotFoundError, match="available"):
        zoo.load_pretrained("nope", root=entry_dir)


def test_kind_config_mismatch_rejected(entry_dir):
    cfg, params = _tiny_vocoder_params()
    with pytest.raises(TypeError, match="SpecGANConfig"):
        zoo.save_pretrained("bad", "specgan", params, cfg, root=entry_dir)
    with pytest.raises(ValueError, match="kind"):
        zoo.save_pretrained("bad", "nope", params, cfg, root=entry_dir)


def test_param_count_guard(entry_dir):
    cfg, params = _tiny_vocoder_params()
    out = zoo.save_pretrained("voc", "vocoder", params, cfg, root=entry_dir)
    import json
    card = json.loads((out / "card.json").read_text())
    card["n_params"] += 1
    (out / "card.json").write_text(json.dumps(card))
    with pytest.raises(ValueError, match="parameters"):
        zoo.load_pretrained("voc", root=entry_dir)
