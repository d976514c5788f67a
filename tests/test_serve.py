"""Serving layer tests (serve.py): bucketing math, synthesis, HTTP API."""

import http.client
import io
import json
import threading

import jax
import numpy as np
import pytest
import scipy.io.wavfile

from music_synthesis_tpu.config import TINY
from music_synthesis_tpu.models.specgan import SpectrogramGenerator
from music_synthesis_tpu.models.vocoder import Vocoder
from music_synthesis_tpu.serve import (
    ServeConfig,
    SynthService,
    make_server,
    wav_bytes,
)
from music_synthesis_tpu import zoo

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def tiny_zoo(tmp_path_factory):
    """Random-init TINY composer + vocoder saved as real zoo entries."""
    root = tmp_path_factory.mktemp("zoo")

    def jitter(params):
        # Random init zeroes the output conv (near-silent audio) and barely
        # propagates the latent; 0.5-scale jitter on every leaf gives the
        # served model non-degenerate level AND real seed sensitivity.
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(KEY, len(leaves))
        return jax.tree.unflatten(treedef, [
            x + 0.5 * jax.random.normal(k, x.shape)
            for x, k in zip(leaves, keys)])

    z0 = jax.numpy.zeros((1, TINY.specgan.latent_dim))
    sg = jitter(SpectrogramGenerator(TINY.specgan).init(KEY, z0)["params"])
    zoo.save_pretrained(
        "composer_t", "specgan", sg, TINY.specgan,
        frontend=TINY.frontend, mel_scaler=TINY.mel_scaler, root=root)
    m0 = jax.numpy.zeros((1, 8, TINY.vocoder.n_mels))
    vp = jitter(Vocoder(TINY.vocoder).init(KEY, m0)["params"])
    zoo.save_pretrained(
        "vocoder_t", "vocoder", vp, TINY.vocoder,
        frontend=TINY.frontend, mel_scaler=TINY.mel_scaler, root=root)
    return root


@pytest.fixture(scope="module")
def service(tiny_zoo):
    sc = ServeConfig(
        composer="composer_t", vocoder="vocoder_t", zoo_root=str(tiny_zoo),
        batch_buckets=(1, 2), patch_buckets=(1, 2),
        crossfade_frames=4, target_rms=0.1, max_clips_per_request=4,
    )
    return SynthService(sc, base_cfg=TINY, warmup=True)


def test_bucket_math(service):
    # out_samples strictly increases with patch count.
    assert service.out_samples(2) > service.out_samples(1)
    sr = service.cfg.frontend.sample_rate
    # A request the 1-patch program covers picks bucket 1.
    small = service.out_samples(1) / sr * 0.5
    assert service.patches_for_seconds(small) == 1
    # A request between buckets rounds up; beyond the max it clamps.
    mid = service.out_samples(1) / sr * 1.5
    assert service.patches_for_seconds(mid) == 2
    assert service.patches_for_seconds(1e9) == 2
    assert service.batch_bucket(1) == 1
    assert service.batch_bucket(2) == 2


def test_synth_shapes_gain_and_determinism(service):
    sr = service.cfg.frontend.sample_rate
    seconds = service.out_samples(1) / sr * 0.8
    wav, meta = service.synth(seconds=seconds, seed=7, n_clips=2)
    assert wav.shape == (2, meta["samples"])
    assert meta["samples"] == int(round(seconds * sr))
    assert np.isfinite(wav).all()
    # Default target_rms=0.1 calibration applies per clip.
    rms = np.sqrt(np.mean(np.square(wav), axis=-1))
    np.testing.assert_allclose(rms, 0.1, rtol=1e-3)
    # Same seed -> same audio; different seed -> different audio.
    wav2, _ = service.synth(seconds=seconds, seed=7, n_clips=2)
    np.testing.assert_array_equal(wav, wav2)
    wav3, _ = service.synth(seconds=seconds, seed=8, n_clips=2)
    assert not np.array_equal(wav, wav3)
    # Raw level when calibration is disabled.
    raw, _ = service.synth(seconds=seconds, seed=7, n_clips=1, target_rms=0.0)
    assert not np.allclose(
        np.sqrt(np.mean(np.square(raw))), 0.1, rtol=1e-3)


def test_synth_more_clips_than_largest_bucket(service):
    """n_clips above the largest batch bucket (2) chunks across multiple
    device calls instead of failing (regression: assert r <= b)."""
    sr = service.cfg.frontend.sample_rate
    seconds = service.out_samples(1) / sr * 0.5
    before = service.metrics()["device_calls"]
    wav, meta = service.synth(seconds=seconds, seed=2, n_clips=3,
                              target_rms=0.0)
    assert wav.shape[0] == 3 and np.isfinite(wav).all()
    assert service.metrics()["device_calls"] - before == 2  # 2 + 1
    # Chunking must not change any clip's audio.
    two, _ = service.synth(seconds=seconds, seed=2, n_clips=2,
                           target_rms=0.0)
    np.testing.assert_allclose(wav[:2], two, rtol=2e-4, atol=1e-6)


def test_synth_validates(service):
    with pytest.raises(ValueError):
        service.synth(seconds=-1.0)
    with pytest.raises(ValueError):
        service.synth(seconds=1.0, n_clips=99)


def test_wav_bytes_roundtrip(service):
    wav, meta = service.synth(seconds=0.1, seed=1, n_clips=2)
    payload = wav_bytes(meta["sample_rate"], wav)
    sr, decoded = scipy.io.wavfile.read(io.BytesIO(payload))
    assert sr == meta["sample_rate"]
    assert decoded.shape == (2 * meta["samples"],)
    np.testing.assert_allclose(
        decoded.astype(np.float32) / 32767.0,
        np.concatenate(list(wav)), atol=1.5 / 32767.0)


def test_dp_serving_matches_single_device(tiny_zoo, service):
    """Batch sharded over the 8-device mesh == single-device audio."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    sc = ServeConfig(
        composer="composer_t", vocoder="vocoder_t", zoo_root=str(tiny_zoo),
        batch_buckets=(8,), patch_buckets=(1,),
        crossfade_frames=4, target_rms=0.0, max_clips_per_request=8,
        mesh_devices=8,
    )
    dp = SynthService(sc, base_cfg=TINY, warmup=False)
    assert dp.health()["mesh_devices"] == 8
    sr = dp.cfg.frontend.sample_rate
    seconds = dp.out_samples(1) / sr * 0.9
    wav_dp, meta = dp.synth(seconds=seconds, seed=11, n_clips=3,
                            target_rms=0.0)
    assert meta["batch_bucket"] == 8 and wav_dp.shape[0] == 3
    # Reference: the plain single-device service, same z per clip. Its
    # batch bucket (2) pads clip 3's slot differently but clips are batch-
    # independent, so compare the first two.
    wav_1, _ = service.synth(seconds=seconds, seed=11, n_clips=2,
                             target_rms=0.0)
    np.testing.assert_allclose(wav_dp[:2], wav_1, rtol=2e-4, atol=1e-6)


def test_bf16_serving_close_to_fp32(tiny_zoo, service):
    """bfloat16 compute serves audio spectrally close to fp32."""
    from music_synthesis_tpu.losses.stft_loss import multires_stft_loss

    sc = dataclasses_replace_serve(
        ServeConfig(
            composer="composer_t", vocoder="vocoder_t",
            zoo_root=str(tiny_zoo), batch_buckets=(2,), patch_buckets=(1,),
            crossfade_frames=4, target_rms=0.0),
        compute_dtype="bfloat16")
    bf = SynthService(sc, base_cfg=TINY, warmup=False)
    sr = bf.cfg.frontend.sample_rate
    seconds = bf.out_samples(1) / sr * 0.9
    wav_bf, _ = bf.synth(seconds=seconds, seed=11, n_clips=2, target_rms=0.0)
    wav_fp, _ = service.synth(seconds=seconds, seed=11, n_clips=2,
                              target_rms=0.0)
    d = float(multires_stft_loss(
        jax.numpy.asarray(wav_bf), jax.numpy.asarray(wav_fp),
        TINY.stft_loss))
    # The 0.5-jittered random net is numerically chaotic, so this bound is
    # mechanism-level only (finite, same ballpark, not bit-equal). On the
    # real trained zoo the measured bf16-vs-fp32 distance is 0.069 with
    # RMS equal to 0.1% (DESIGN.md §14) — the production-quality evidence.
    assert 0 < d < 2.0, d
    rms_bf = float(np.sqrt(np.mean(wav_bf ** 2)))
    rms_fp = float(np.sqrt(np.mean(wav_fp ** 2)))
    assert abs(rms_bf - rms_fp) / rms_fp < 0.25


def dataclasses_replace_serve(sc, **kw):
    import dataclasses
    return dataclasses.replace(sc, **kw)


def test_dp_coalesce_compose(tiny_zoo, service):
    """The full production stack composes: mesh-sharded buckets behind
    the coalescer still produce each clip's solo audio."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    sc = ServeConfig(
        composer="composer_t", vocoder="vocoder_t", zoo_root=str(tiny_zoo),
        batch_buckets=(8,), patch_buckets=(1,),
        crossfade_frames=4, target_rms=0.0, max_clips_per_request=8,
        mesh_devices=8, coalesce_window_ms=1000.0,
    )
    svc = SynthService(sc, base_cfg=TINY, warmup=False)
    sr = svc.cfg.frontend.sample_rate
    seconds = svc.out_samples(1) / sr * 0.9
    results = {}

    def hit(seed):
        results[seed] = svc.synth(seconds=seconds, seed=seed, n_clips=1,
                                  target_rms=0.0)[0]

    threads = [threading.Thread(target=hit, args=(s,)) for s in (1, 2, 3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert svc.metrics()["device_calls"] < 3
    for seed in (1, 2, 3):
        solo, _ = service.synth(seconds=seconds, seed=seed, n_clips=1,
                                target_rms=0.0)
        np.testing.assert_allclose(results[seed], solo,
                                   rtol=2e-4, atol=1e-6)


def test_dp_serving_rejects_indivisible_buckets(tiny_zoo):
    with pytest.raises(ValueError, match="divide"):
        SynthService(ServeConfig(
            composer="composer_t", vocoder="vocoder_t",
            zoo_root=str(tiny_zoo), batch_buckets=(3,), patch_buckets=(1,),
            crossfade_frames=4, mesh_devices=8,
        ), base_cfg=TINY, warmup=False)


def test_coalescing_merges_requests_and_preserves_audio(tiny_zoo, service):
    """Concurrent requests merge into fewer device calls; each clip's
    audio is identical to its solo (uncoalesced) synthesis."""
    sc = ServeConfig(
        composer="composer_t", vocoder="vocoder_t", zoo_root=str(tiny_zoo),
        batch_buckets=(1, 2, 4), patch_buckets=(1,),
        crossfade_frames=4, target_rms=0.0, max_clips_per_request=4,
        coalesce_window_ms=1000.0,
    )
    co = SynthService(sc, base_cfg=TINY, warmup=False)
    sr = co.cfg.frontend.sample_rate
    seconds = co.out_samples(1) / sr * 0.9

    results = {}

    def hit(seed):
        results[seed] = co.synth(seconds=seconds, seed=seed, n_clips=1,
                                 target_rms=0.0)[0]

    threads = [threading.Thread(target=hit, args=(s,)) for s in (1, 2, 3, 4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    m = co.metrics()
    assert m["requests"] == 4
    assert m["device_calls"] < 4, m  # at least some requests merged
    # Audio identity vs the solo service (same tiny zoo, same seeds).
    for seed in (1, 2, 3, 4):
        solo, _ = service.synth(seconds=seconds, seed=seed, n_clips=1,
                                target_rms=0.0)
        # Different pad-to-bucket shapes may pick different conv
        # algorithms; clips match to float tolerance, not bit-for-bit.
        np.testing.assert_allclose(results[seed], solo,
                                   rtol=2e-4, atol=1e-6)


@pytest.fixture(scope="module")
def http_server(service):
    httpd = make_server(service, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address
    httpd.shutdown()


def _req(addr, method, path, body=None):
    conn = http.client.HTTPConnection(*addr, timeout=120)
    conn.request(method, path,
                 body=json.dumps(body) if body is not None else None)
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r, data


def test_http_endpoints(http_server, service):
    r, data = _req(http_server, "GET", "/healthz")
    assert r.status == 200
    h = json.loads(data)
    assert h["status"] == "ok"
    assert [1, 1] in h["warm_buckets"] or (1, 1) in [
        tuple(x) for x in h["warm_buckets"]]

    r, data = _req(http_server, "GET", "/models")
    assert r.status == 200
    cards = json.loads(data)
    assert cards["vocoder"]["kind"] == "vocoder"

    sr_cfg = service.cfg.frontend.sample_rate
    r, data = _req(http_server, "POST", "/generate",
                   {"seconds": 0.2, "seed": 5, "n_clips": 1})
    assert r.status == 200
    assert r.getheader("Content-Type") == "audio/wav"
    meta = json.loads(r.getheader("X-Msynth-Meta"))
    assert meta["samples"] == int(round(0.2 * sr_cfg))
    sr, decoded = scipy.io.wavfile.read(io.BytesIO(data))
    assert sr == sr_cfg and decoded.shape == (meta["samples"],)

    # Bad request -> 400 + error counter.
    r, data = _req(http_server, "POST", "/generate", {"seconds": -3})
    assert r.status == 400
    r, data = _req(http_server, "GET", "/metrics")
    m = json.loads(data)
    assert m["requests"] >= 1 and m["errors"] >= 1
    assert m["latency_p50_ms"] > 0

    r, _ = _req(http_server, "GET", "/nope")
    assert r.status == 404


def test_http_hot_reload(tiny_zoo, http_server, service):
    """POST /reload swaps models blue/green; failures keep the old ones."""
    # A second vocoder with different weights -> audibly different output.
    import dataclasses as _dc
    m0 = jax.numpy.zeros((1, 8, TINY.vocoder.n_mels))
    vp2 = Vocoder(TINY.vocoder).init(jax.random.PRNGKey(99), m0)["params"]
    leaves, td = jax.tree.flatten(vp2)
    ks = jax.random.split(jax.random.PRNGKey(100), len(leaves))
    vp2 = jax.tree.unflatten(td, [
        x + 0.5 * jax.random.normal(k, x.shape)
        for x, k in zip(leaves, ks)])
    zoo.save_pretrained(
        "vocoder_t2", "vocoder", vp2, TINY.vocoder,
        frontend=TINY.frontend, mel_scaler=TINY.mel_scaler, root=tiny_zoo)

    body = {"seconds": 0.2, "seed": 5, "n_clips": 1, "target_rms": 0.0}
    _, before = _req(http_server, "POST", "/generate", body)

    # Unknown entry -> 400, old service still answers identically.
    r, _ = _req(http_server, "POST", "/reload", {"vocoder": "nope"})
    assert r.status == 400
    r, still = _req(http_server, "POST", "/generate", body)
    assert r.status == 200 and still == before

    r, data = _req(http_server, "POST", "/reload", {"vocoder": "vocoder_t2"})
    assert r.status == 200
    assert json.loads(data)["vocoder"] == "vocoder_t2"
    r, after = _req(http_server, "POST", "/generate", body)
    assert r.status == 200 and after != before

    # Swap back so later tests see the original service behavior.
    r, _ = _req(http_server, "POST", "/reload", {"vocoder": "vocoder_t"})
    assert r.status == 200


def test_stream_blocks_exact_length_and_incremental(service):
    sr = service.cfg.frontend.sample_rate
    seconds = 3.1 * service.out_samples(1) / sr  # spans multiple patches
    want, n = service.stream_samples(seconds)
    assert n >= 3
    blocks = list(service.stream_blocks(seconds=seconds, seed=4))
    assert len(blocks) > 1  # audio arrives incrementally
    total = np.concatenate(blocks)
    assert total.shape == (want,)
    assert np.isfinite(total).all()
    # Deterministic per seed.
    again = np.concatenate(list(service.stream_blocks(seconds, seed=4)))
    np.testing.assert_array_equal(total, again)


def test_stream_rejects_overlong(service):
    with pytest.raises(ValueError):
        service.stream_samples(
            service.serve_cfg.max_stream_seconds + 1)


def test_http_stream_endpoint(http_server, service):
    sr = service.cfg.frontend.sample_rate
    seconds = 2.2 * service.out_samples(1) / sr
    r, data = _req(http_server, "POST", "/stream",
                   {"seconds": seconds, "seed": 6})
    assert r.status == 200
    meta = json.loads(r.getheader("X-Msynth-Meta"))
    assert meta["streamed"] is True
    sr2, decoded = scipy.io.wavfile.read(io.BytesIO(data))
    assert sr2 == sr and decoded.shape == (meta["samples"],)
    # The WAV body is the PCM quantization of the service's own stream.
    ref = np.concatenate(list(service.stream_blocks(seconds, seed=6)))
    np.testing.assert_allclose(
        decoded.astype(np.float32) / 32767.0, np.clip(ref, -1, 1),
        atol=1.5 / 32767.0)

    r, _ = _req(http_server, "POST", "/stream", {"seconds": -1})
    assert r.status == 400


def test_gl_refined_serving_shapes_and_differs(tiny_zoo, service):
    """gl_refine deployment knob: same request surface and shapes, audio
    actually changed by the consistency projections."""
    sc = ServeConfig(
        composer="composer_t", vocoder="vocoder_t", zoo_root=str(tiny_zoo),
        batch_buckets=(1,), patch_buckets=(2,),
        crossfade_frames=4, target_rms=0.0, gl_refine=2,
    )
    svc = SynthService(sc, base_cfg=TINY, warmup=False)
    base, _ = service.synth(seconds=0.3, n_clips=1, seed=11, target_rms=0.0)
    ref, _ = svc.synth(seconds=0.3, n_clips=1, seed=11)
    assert ref.shape == base.shape
    assert np.isfinite(ref).all()
    assert not np.allclose(ref, base)
