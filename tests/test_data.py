"""Data pipeline tests (SURVEY.md C1): corpus, sampling, determinism."""

import numpy as np
import pytest

from music_synthesis_tpu.data.dataset import AudioDataset, make_synthetic_corpus
from music_synthesis_tpu.utils.wav import load_wav, read_wav, resample, write_wav


def test_synthetic_corpus_deterministic(tmp_path):
    p1 = make_synthetic_corpus(tmp_path / "a", n_clips=2, seconds=0.5, seed=7)
    p2 = make_synthetic_corpus(tmp_path / "b", n_clips=2, seconds=0.5, seed=7)
    for a, b in zip(p1, p2):
        _, wa = read_wav(a)
        _, wb = read_wav(b)
        np.testing.assert_array_equal(wa, wb)


def test_dataset_sampling_and_sharding(tmp_path):
    make_synthetic_corpus(tmp_path, n_clips=4, seconds=0.5)
    ds = AudioDataset(tmp_path, segment_length=2048)
    b = ds.sample_batch(0, 3)
    assert b.shape == (3, 2048) and b.dtype == np.float32
    # Step-seeded determinism; different steps differ.
    np.testing.assert_array_equal(b, ds.sample_batch(0, 3))
    assert not np.array_equal(b, ds.sample_batch(1, 3))
    # Process sharding partitions the files disjointly.
    d0 = AudioDataset(tmp_path, segment_length=2048, process_index=0,
                      process_count=2)
    d1 = AudioDataset(tmp_path, segment_length=2048, process_index=1,
                      process_count=2)
    assert len(d0.paths) + len(d1.paths) == 4
    assert set(d0.paths).isdisjoint(d1.paths)


def test_augment_gain_and_polarity(tmp_path):
    make_synthetic_corpus(tmp_path, n_clips=4, seconds=0.5)
    plain = AudioDataset(tmp_path, segment_length=2048)
    aug = AudioDataset(tmp_path, segment_length=2048, augment=True)
    a = aug.sample_batch(3, 8)
    p = plain.sample_batch(3, 8)
    # Same (step, seed) -> same segments, scaled per row by g*s with
    # g in [0.6, 1.0] and s in {-1, +1}.
    ratios = []
    for i in range(8):
        nz = np.abs(p[i]) > 1e-6
        assert nz.any()
        r = a[i][nz] / p[i][nz]
        np.testing.assert_allclose(r, r[0], rtol=1e-5)
        ratios.append(r[0])
    ratios = np.asarray(ratios)
    assert (0.6 <= np.abs(ratios)).all() and (np.abs(ratios) <= 1.0).all()
    assert (ratios < 0).any() and (ratios > 0).any()  # both polarities
    # Augmentation is deterministic in (step, seed) too.
    np.testing.assert_array_equal(a, aug.sample_batch(3, 8))
    # Default-off path is bit-identical to the pre-augment sampler.
    np.testing.assert_array_equal(p, plain.sample_batch(3, 8))


def test_resample_preserves_tone():
    sr0, sr1 = 44100, 22050
    t = np.arange(sr0) / sr0
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample(tone, sr0, sr1)
    assert out.shape == (sr1,)
    # Zero-crossing count halves sample count but keeps ~440 Hz.
    zc = (np.diff(np.signbit(out[1000:-1000])) != 0).sum()
    freq = zc / 2 / (len(out) - 2000) * sr1
    assert abs(freq - 440) < 5


def test_wav_roundtrip(tmp_path):
    wav = np.clip(np.random.default_rng(0).standard_normal(4000) * 0.3, -1, 1)
    write_wav(tmp_path / "x.wav", 22050, wav)
    out = load_wav(tmp_path / "x.wav", 22050)
    np.testing.assert_allclose(out, wav.astype(np.float32), atol=1e-4)
