"""Native C++ IO library tests (decode/resample parity vs scipy)."""

import io

import numpy as np
import pytest
import scipy.io.wavfile
import scipy.signal

from music_synthesis_tpu.data import native
from music_synthesis_tpu.data.prefetch import Prefetcher

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


def _wav_bytes(sr, data):
    buf = io.BytesIO()
    scipy.io.wavfile.write(buf, sr, data)
    return buf.getvalue()


def test_decode_pcm16_stereo_matches_scipy(rng):
    stereo = (rng.standard_normal((4000, 2)) * 8000).astype(np.int16)
    sr, mono = native.decode_wav(_wav_bytes(44100, stereo))
    want = stereo.astype(np.float32).mean(axis=1) / 32768.0
    assert sr == 44100
    np.testing.assert_allclose(mono, want, atol=1e-7)


def test_decode_float32(rng):
    f32 = (rng.standard_normal(1000) * 0.5).astype(np.float32)
    sr, out = native.decode_wav(_wav_bytes(22050, f32))
    np.testing.assert_array_equal(out, f32)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        native.decode_wav(b"not a wav file at all")


def test_resample_matches_scipy_tone():
    t = np.arange(44100) / 44100
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = native.resample(tone, 44100, 22050)
    ref = scipy.signal.resample_poly(tone, 1, 2).astype(np.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out[500:-500], ref[500:-500], atol=5e-4)


def test_resample_upsample_length():
    x = np.zeros(1000, np.float32)
    out = native.resample(x, 8000, 22050)
    assert len(out) == -(-1000 * 22050 // 8000)


def test_load_wav_native_path(tmp_path, rng):
    from music_synthesis_tpu.utils.wav import load_wav, write_wav

    wav = np.clip(rng.standard_normal(4000) * 0.3, -1, 1)
    write_wav(tmp_path / "x.wav", 44100, wav)
    nat = load_wav(tmp_path / "x.wav", 22050, use_native=True)
    ref = load_wav(tmp_path / "x.wav", 22050, use_native=False)
    assert nat.shape == ref.shape
    np.testing.assert_allclose(nat[200:-200], ref[200:-200], atol=2e-3)


def test_prefetcher_order_and_error():
    out = [(s, b) for s, b in Prefetcher(lambda s: s * 10, 3, 8, depth=2)]
    assert out == [(s, s * 10) for s in range(3, 8)]

    def boom(s):
        if s == 2:
            raise RuntimeError("boom")
        return s

    with pytest.raises(RuntimeError, match="boom"):
        list(Prefetcher(boom, 0, 5))
