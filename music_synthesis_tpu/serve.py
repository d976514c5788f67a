"""Production synthesis serving (SURVEY.md §1 L5 deployment surface).

The reference exposes trained models only through notebooks; a production
deployment needs a long-lived server that keeps the XLA programs compiled
and the weights resident on device. This module is that server, built
TPU-first:

- **Static-shape buckets.** Requests ask for arbitrary ``seconds``; the
  server maps each request onto a precompiled ``generate_long`` program
  keyed by (batch bucket, patch bucket) and trims host-side. No request
  shape ever triggers a recompile in steady state — the cardinal rule for
  serving on XLA devices.
- **Warm start.** All configured buckets compile and execute once at
  startup, so the first user request pays device-step latency, not a
  20-40 s XLA compile.
- **One device stream.** Dispatch is serialized behind a lock: one chip,
  one client, predictable queueing (the same one-client discipline the
  training stack uses for the TPU tunnel).
- **Self-describing models.** Weights come from the zoo (``zoo.py``):
  the card's model config, front-end and MelScaler override the base
  pipeline config, so the served program is exactly the trained system.

Transport is stdlib ``http.server`` (no third-party web stack in this
environment): ``GET /healthz``, ``GET /models``, ``GET /metrics``,
``POST /generate`` -> ``audio/wav`` bytes, ``POST /stream`` -> a
known-length progressive WAV (infer/stream.py), and ``POST /reload``
for blue/green zoo model hot-swap.

Usage (see scripts/serve.py for the CLI):

    svc = SynthService(ServeConfig(composer="specgan_flux",
                                   vocoder="vocoder_istft"))
    httpd = make_server(svc, port=8000)
    httpd.serve_forever()
"""

from __future__ import annotations

import dataclasses
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu import zoo
from music_synthesis_tpu.config import E2E_INFERENCE, PipelineConfig
from music_synthesis_tpu.infer.generate import (
    generate_long,
    generate_long_refined,
)
from music_synthesis_tpu.utils.wav import write_wav

__all__ = ["ServeConfig", "SynthService", "make_server"]


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    """Serving deployment knobs (model selection + compiled-shape budget)."""

    composer: str = "specgan_flux"      # zoo entry name or dir (specgan)
    vocoder: str = "vocoder_istft"      # zoo entry name or dir (vocoder)
    zoo_root: str | None = None         # default: repo zoo/
    # Precompiled shape grid. Every (batch, patches) request is padded up
    # to the nearest bucket; larger asks are clamped to the max bucket.
    batch_buckets: tuple[int, ...] = (1, 4)
    patch_buckets: tuple[int, ...] = (1, 2, 4, 8)
    crossfade_frames: int = 8
    # Default loudness calibration (DESIGN.md §13: the trained vocoder
    # renders quieter than real; 0.1 RMS is a listenable level). Requests
    # can override per call; 0 disables.
    target_rms: float = 0.1
    max_clips_per_request: int = 16
    # Data-parallel serving: shard each bucket's batch axis over this many
    # devices (params replicated — the same DP layout as training,
    # parallel/mesh.py). 1 = single device. Every batch bucket must divide
    # evenly over the mesh so shapes stay static per shard.
    mesh_devices: int = 1
    # Serving precision: "bfloat16" runs both generators' convs MXU-native
    # at half the HBM traffic (fp32 master weights, per-op casts — the
    # same mixed-precision layout the bf16 training recipe uses).
    compute_dtype: str = "float32"
    # Request coalescing: hold each device call open this long and merge
    # concurrently-arriving requests with the same patch bucket into ONE
    # batched program execution (clips are batch-independent, so merged
    # audio is identical to solo audio). 0 = every request dispatches
    # immediately. The latency/throughput trade every accelerator server
    # makes; worth it when the chip is the bottleneck, not the queue.
    coalesce_window_ms: float = 0.0
    # POST /stream ceiling: streaming synthesis (infer/stream.py) runs two
    # fixed-shape programs per patch, so duration is unbounded in compile
    # terms; this only bounds a single request's wall time.
    max_stream_seconds: float = 600.0
    # Warm-started Griffin-Lim consistency refinement of every served clip
    # (ops/griffin_lim.py; measured quality/RTF trade in DESIGN.md §19).
    # Deployment-level (not per-request): one compiled program per bucket.
    # /stream is never refined — its blocks are synthesized incrementally.
    gl_refine: int = 0


def _load_entry(name: str, kind: str, root) -> zoo.PretrainedEntry:
    e = zoo.load_pretrained(name, **({"root": root} if root else {}))
    if e.kind != kind:
        raise ValueError(f"zoo entry {name!r} is a {e.kind}, need {kind}")
    return e


class SynthService:
    """Loads zoo models, compiles the bucket grid, serves synthesis calls."""

    def __init__(
        self,
        serve_cfg: ServeConfig = ServeConfig(),
        base_cfg: PipelineConfig = E2E_INFERENCE,
        warmup: bool = True,
    ):
        self.serve_cfg = serve_cfg
        self.base_cfg = base_cfg  # kept for hot-reload (POST /reload)
        root = serve_cfg.zoo_root
        self._composer = _load_entry(serve_cfg.composer, "specgan", root)
        self._vocoder = _load_entry(serve_cfg.vocoder, "vocoder", root)

        cfg = dataclasses.replace(
            base_cfg,
            specgan=dataclasses.replace(
                self._composer.config,
                compute_dtype=serve_cfg.compute_dtype),
            vocoder=dataclasses.replace(
                self._vocoder.config,
                compute_dtype=serve_cfg.compute_dtype),
        )
        # Conditioning must reproduce the training-time normalization
        # (round-2 advisor finding on scripts/generate.py): the vocoder
        # card's scaler/front-end win; the composer was trained in the
        # same normalized space.
        for e in (self._composer, self._vocoder):
            if e.mel_scaler is not None:
                cfg = dataclasses.replace(cfg, mel_scaler=e.mel_scaler)
            if e.frontend is not None:
                cfg = dataclasses.replace(cfg, frontend=e.frontend)
        if serve_cfg.crossfade_frames >= cfg.specgan.n_frames:
            raise ValueError(
                f"crossfade_frames ({serve_cfg.crossfade_frames}) must be < "
                f"specgan.n_frames ({cfg.specgan.n_frames})")
        self.cfg = cfg

        if serve_cfg.gl_refine > 0:
            # Bake the iteration count in as a default (static by
            # construction, so both jit paths below stay signature-
            # compatible with generate_long).
            n_gl = serve_cfg.gl_refine

            def _gen_fn(cfg_, cp, vp, z, cf, _n=n_gl):
                return generate_long_refined(cfg_, cp, vp, z, cf, _n)
        else:
            _gen_fn = generate_long

        if serve_cfg.mesh_devices > 1:
            from music_synthesis_tpu.parallel.mesh import (
                batch_sharding, make_mesh, replicated)

            bad = [b for b in serve_cfg.batch_buckets
                   if b % serve_cfg.mesh_devices]
            if bad:
                raise ValueError(
                    f"batch buckets {bad} do not divide over "
                    f"{serve_cfg.mesh_devices} mesh devices")
            mesh = make_mesh((serve_cfg.mesh_devices,))
            repl = replicated(mesh)
            # Replicate weights once at startup; requests only move z.
            self._composer = dataclasses.replace(
                self._composer,
                params=jax.device_put(self._composer.params, repl))
            self._vocoder = dataclasses.replace(
                self._vocoder,
                params=jax.device_put(self._vocoder.params, repl))
            self._fn = jax.jit(
                _gen_fn, static_argnums=(0, 4),
                in_shardings=(repl, repl, batch_sharding(mesh)),
                out_shardings=batch_sharding(mesh),
            )
        else:
            self._fn = jax.jit(_gen_fn, static_argnums=(0, 4))
        self._dispatch = threading.Lock()
        self._m_lock = threading.Lock()
        self._requests = 0
        self._errors = 0
        self._device_calls = 0
        self._latencies: list[float] = []  # seconds, last 512 kept
        self._warm: list[tuple[int, int]] = []
        self._coalescer = (
            _Coalescer(self, serve_cfg.coalesce_window_ms / 1e3)
            if serve_cfg.coalesce_window_ms > 0 else None)
        from music_synthesis_tpu.infer.stream import make_stream_fns
        self._stream_fns = make_stream_fns(cfg)
        if warmup:
            self.warm_all()

    # -- shape bucketing ---------------------------------------------------

    def out_samples(self, n_patches: int) -> int:
        """Exact output length of the (.., n_patches) program in samples."""
        c = self.cfg
        t = c.specgan.n_frames
        cf = self.serve_cfg.crossfade_frames
        t_long = n_patches * (t - cf) + cf
        usable = t_long - (t_long - c.infer.chunk_frames) % c.infer.hop_frames
        return usable * c.vocoder.hop_length

    def patches_for_seconds(self, seconds: float) -> int:
        """Smallest patch bucket whose output covers ``seconds`` (clamped
        to the largest bucket)."""
        want = int(round(seconds * self.cfg.frontend.sample_rate))
        for n in sorted(self.serve_cfg.patch_buckets):
            if self.out_samples(n) >= want:
                return n
        return max(self.serve_cfg.patch_buckets)

    def batch_bucket(self, n_clips: int) -> int:
        """Smallest warm-compiled batch bucket that fits ``n_clips``."""
        for b in sorted(self.serve_cfg.batch_buckets):
            if b >= n_clips:
                return b
        return max(self.serve_cfg.batch_buckets)

    # -- synthesis ---------------------------------------------------------

    def _run(self, b: int, n: int, z: jax.Array) -> jax.Array:
        with self._dispatch:
            wav = self._fn(
                self.cfg, self._composer.params, self._vocoder.params, z,
                self.serve_cfg.crossfade_frames,
            )
            wav.block_until_ready()
        return wav

    def _z_rows(self, seed: int, n_clips: int, n: int) -> jax.Array:
        """Per-request latent rows ``[n_clips, n, Z]``. Threefry is
        counter-based, so these rows are a prefix of any larger same-key
        draw — bucket padding never changes a clip's audio."""
        return jax.random.normal(
            jax.random.PRNGKey(seed),
            (n_clips, n, self.cfg.specgan.latent_dim))

    def _execute(self, n: int, rows: jax.Array) -> np.ndarray:
        """Run ``[R, n, Z]`` rows through the precompiled programs: chunk
        by the largest batch bucket, pad each chunk up to its bucket,
        return exactly R clips."""
        max_b = max(self.serve_cfg.batch_buckets)
        outs = []
        for i in range(0, rows.shape[0], max_b):
            chunk = jnp.asarray(rows[i:i + max_b])
            r = chunk.shape[0]
            b = self.batch_bucket(r)
            if b > r:
                chunk = jnp.concatenate(
                    [chunk,
                     jnp.zeros((b - r,) + chunk.shape[1:], chunk.dtype)],
                    axis=0)
            out = self._run(b, n, chunk)
            with self._m_lock:
                self._device_calls += 1
            outs.append(np.asarray(out[:r]))
        return np.concatenate(outs, axis=0)

    def warm_all(self) -> list[tuple[int, int]]:
        """Compile + execute every configured (batch, patches) bucket,
        plus the two fixed-shape streaming programs."""
        key = jax.random.PRNGKey(0)
        for b in self.serve_cfg.batch_buckets:
            for n in self.serve_cfg.patch_buckets:
                z = jax.random.normal(
                    key, (b, n, self.cfg.specgan.latent_dim))
                self._run(b, n, z)
                self._warm.append((b, n))
        for _ in self.stream_blocks(seconds=1e-6, seed=0):
            pass
        self._warm.append(("stream", 1))
        return list(self._warm)

    def synth(
        self,
        seconds: float,
        seed: int = 0,
        n_clips: int = 1,
        target_rms: float | None = None,
    ) -> tuple[np.ndarray, dict]:
        """Generate ``n_clips`` clips of ``seconds`` audio.

        Returns ``(wav [n_clips, samples] float32, meta dict)``. The device
        program runs at the padded bucket shape; padding clips and excess
        samples are trimmed on the host.
        """
        sc = self.serve_cfg
        if not (0 < n_clips <= sc.max_clips_per_request):
            raise ValueError(
                f"n_clips must be in [1, {sc.max_clips_per_request}]")
        if seconds <= 0:
            raise ValueError("seconds must be > 0")
        n = self.patches_for_seconds(seconds)
        b = self.batch_bucket(n_clips)
        want = min(int(round(seconds * self.cfg.frontend.sample_rate)),
                   self.out_samples(n))

        t0 = time.perf_counter()
        rows = self._z_rows(seed, n_clips, n)
        if self._coalescer is not None:
            wav = self._coalescer.submit(n, rows)[:, :want]
        else:
            wav = self._execute(n, rows)[:, :want]
        rms_target = sc.target_rms if target_rms is None else target_rms
        if rms_target > 0:
            rms = np.sqrt(np.mean(np.square(wav), axis=-1, keepdims=True))
            wav = np.clip(wav * (rms_target / np.maximum(rms, 1e-8)),
                          -1.0, 1.0)
        dt = time.perf_counter() - t0

        with self._m_lock:
            self._requests += 1
            self._latencies = (self._latencies + [dt])[-512:]
        meta = {
            "seed": seed,
            "patches": n,
            "batch_bucket": b,
            "n_clips": n_clips,
            "samples": int(want),
            "sample_rate": self.cfg.frontend.sample_rate,
            "gen_ms": round(dt * 1e3, 3),
            "rtf": round((want * n_clips / self.cfg.frontend.sample_rate)
                         / max(dt, 1e-9), 1),
        }
        return wav.astype(np.float32), meta

    # -- streaming -----------------------------------------------------------

    def stream_samples(self, seconds: float) -> tuple[int, int]:
        """(exact samples, patch count) a /stream request will produce."""
        sc = self.serve_cfg
        if not (0 < seconds <= sc.max_stream_seconds):
            raise ValueError(
                f"seconds must be in (0, {sc.max_stream_seconds}]")
        c = self.cfg
        t, cf = c.specgan.n_frames, sc.crossfade_frames
        want = max(1, int(round(seconds * c.frontend.sample_rate)))
        n = 1
        while True:
            t_long = n * (t - cf) + cf
            usable = t_long - (t_long - c.infer.chunk_frames) \
                % c.infer.hop_frames
            if usable * c.vocoder.hop_length >= want or n > 1_000_000:
                return want, n
            n += 1

    def stream_blocks(self, seconds: float, seed: int = 0):
        """Yield float32 ``[samples]`` blocks as they become final; total
        is exactly ``stream_samples(seconds)[0]``. Unbounded duration,
        fixed-shape programs (infer/stream.py), raw model loudness."""
        from music_synthesis_tpu.infer.stream import StreamingSynth

        want, n = self.stream_samples(seconds)
        s = StreamingSynth(self.cfg, self._composer.params,
                           self._vocoder.params,
                           self.serve_cfg.crossfade_frames,
                           fns=self._stream_fns)
        z = jax.random.normal(
            jax.random.PRNGKey(seed), (1, n, self.cfg.specgan.latent_dim))
        sent = 0
        for i in range(n):
            with self._dispatch:
                blk = s.feed(z[:, i])
            blk = blk[0, : max(0, want - sent)]
            sent += blk.shape[0]
            if blk.shape[0]:
                yield blk
            if sent >= want:
                return
        with self._dispatch:
            tail = s.finish()
        tail = tail[0, : max(0, want - sent)]
        if tail.shape[0]:
            yield tail

    # -- introspection -----------------------------------------------------

    def health(self) -> dict:
        """GET /health payload: device kind + warm-bucket inventory."""
        dev = jax.devices()[0]
        return {
            "status": "ok",
            "device": f"{dev.platform}/{dev.device_kind}",
            "mesh_devices": self.serve_cfg.mesh_devices,
            "warm_buckets": self._warm,
            "composer": self._composer.name,
            "vocoder": self._vocoder.name,
        }

    def models(self) -> dict:
        """GET /models payload: loaded zoo entries and their model cards."""
        return {
            "composer": self._composer.card,
            "vocoder": self._vocoder.card,
        }

    def metrics(self) -> dict:
        """GET /metrics payload: request/device-call counts, latency pXX."""
        with self._m_lock:
            lat = sorted(self._latencies)
            n = len(lat)
            return {
                "requests": self._requests,
                "errors": self._errors,
                "device_calls": self._device_calls,
                "latency_p50_ms": round(lat[n // 2] * 1e3, 3) if n else None,
                "latency_p95_ms": (
                    round(lat[min(n - 1, int(n * 0.95))] * 1e3, 3)
                    if n else None),
            }

    def count_error(self) -> None:
        """Increment the served-error counter (thread-safe)."""
        with self._m_lock:
            self._errors += 1


class _Coalescer:
    """Merge concurrent same-patch-bucket requests into one device call.

    A single worker thread drains a queue: the first waiting request opens
    a window; everything that arrives within it joins the flush. Each
    flush groups requests by patch bucket, concatenates their latent rows,
    and executes per group in max-bucket-sized chunks; results are split
    back by row offsets. Clips are batch-independent, so a coalesced
    clip's audio is identical to its solo audio (tested).
    """

    def __init__(self, svc: SynthService, window_s: float):
        import queue

        self._svc = svc
        self._window = window_s
        self._q: "queue.SimpleQueue" = queue.SimpleQueue()
        self._empty = queue.Empty
        t = threading.Thread(target=self._loop, daemon=True,
                             name="msynth-coalescer")
        t.start()

    def submit(self, n: int, rows: jax.Array) -> np.ndarray:
        item = {"n": n, "rows": rows, "done": threading.Event(),
                "out": None, "exc": None}
        self._q.put(item)
        item["done"].wait()
        if item["exc"] is not None:
            raise item["exc"]
        return item["out"]

    def _loop(self) -> None:
        while True:
            batch = [self._q.get()]
            deadline = time.monotonic() + self._window
            while True:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except self._empty:
                    break
            groups: dict[int, list[dict]] = {}
            for it in batch:
                groups.setdefault(it["n"], []).append(it)
            for n, items in groups.items():
                try:
                    rows = jnp.concatenate([it["rows"] for it in items], 0)
                    out = self._svc._execute(n, rows)
                    off = 0
                    for it in items:
                        r = it["rows"].shape[0]
                        it["out"] = out[off:off + r]
                        off += r
                except Exception as e:  # propagate to every waiter
                    for it in items:
                        it["exc"] = e
                finally:
                    for it in items:
                        it["done"].set()


def wav_bytes(sample_rate: int, wav: np.ndarray) -> bytes:
    """Multi-clip [N, L] -> one 16-bit PCM WAV payload (clips concatenated)."""
    buf = io.BytesIO()
    write_wav(buf, sample_rate, np.concatenate(list(wav), axis=-1))
    return buf.getvalue()


def wav_header(sample_rate: int, n_samples: int) -> bytes:
    """44-byte PCM16 mono WAV header for a known-length progressive body."""
    import struct

    data = n_samples * 2
    return b"".join([
        b"RIFF", struct.pack("<I", 36 + data), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                             sample_rate * 2, 2, 16),
        b"data", struct.pack("<I", data),
    ])


def pcm16(block: np.ndarray) -> bytes:
    """Float [-1, 1] -> little-endian 16-bit PCM bytes (clipping, not wrapping)."""
    return (np.clip(block, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()


class _Handler(BaseHTTPRequestHandler):
    # service is attached to the server object by make_server().

    def _svc(self) -> SynthService:
        return self.server.service  # type: ignore[attr-defined]

    def _send_json(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def do_GET(self):  # noqa: N802 (http.server API)
        svc = self._svc()
        routes = {
            "/healthz": svc.health,
            "/models": svc.models,
            "/metrics": svc.metrics,
        }
        fn = routes.get(self.path)
        if fn is None:
            self._send_json(404, {"error": f"no route {self.path}"})
            return
        self._send_json(200, fn())

    def do_POST(self):  # noqa: N802
        svc = self._svc()
        if self.path == "/stream":
            self._do_stream(svc)
            return
        if self.path == "/reload":
            self._do_reload(svc)
            return
        if self.path != "/generate":
            self._send_json(404, {"error": f"no route {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            wav, meta = svc.synth(
                seconds=float(req.get("seconds", 4.0)),
                seed=int(req.get("seed", 0)),
                n_clips=int(req.get("n_clips", 1)),
                target_rms=(float(req["target_rms"])
                            if "target_rms" in req else None),
            )
        except (ValueError, KeyError, TypeError, json.JSONDecodeError) as e:
            svc.count_error()
            self._send_json(400, {"error": str(e)})
            return
        body = wav_bytes(meta["sample_rate"], wav)
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Content-Length", str(len(body)))
        self.send_header("X-Msynth-Meta", json.dumps(meta))
        self.end_headers()
        self.wfile.write(body)


    def _do_reload(self, old: SynthService) -> None:
        """Blue/green model hot-swap: build + warm a NEW service for the
        requested zoo entries, then atomically repoint the server at it.
        In-flight requests finish on the old service; a failed load or
        warm leaves the old service untouched."""
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            sc = dataclasses.replace(
                old.serve_cfg,
                composer=req.get("composer", old.serve_cfg.composer),
                vocoder=req.get("vocoder", old.serve_cfg.vocoder),
            )
            new = SynthService(sc, base_cfg=old.base_cfg, warmup=True)
        except Exception as e:  # keep serving the old models on ANY failure
            old.count_error()
            self._send_json(400, {"error": str(e)})
            return
        self.server.service = new  # type: ignore[attr-defined]
        self._send_json(200, new.health())

    def _do_stream(self, svc: SynthService) -> None:
        """Progressive synthesis: a known-length WAV whose PCM body is
        written patch-by-patch as audio becomes final (raw model level —
        loudness calibration needs the whole clip)."""
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            seconds = float(req.get("seconds", 8.0))
            seed = int(req.get("seed", 0))
            want, n = svc.stream_samples(seconds)
        except (ValueError, KeyError, TypeError, json.JSONDecodeError) as e:
            svc.count_error()
            self._send_json(400, {"error": str(e)})
            return
        sr = svc.cfg.frontend.sample_rate
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Content-Length", str(44 + 2 * want))
        self.send_header("X-Msynth-Meta", json.dumps(
            {"seed": seed, "patches": n, "samples": want,
             "sample_rate": sr, "streamed": True}))
        self.end_headers()
        self.wfile.write(wav_header(sr, want))
        self.wfile.flush()
        t0 = time.perf_counter()
        for block in svc.stream_blocks(seconds=seconds, seed=seed):
            self.wfile.write(pcm16(block))
            self.wfile.flush()
        with svc._m_lock:
            svc._requests += 1
            svc._latencies = (
                svc._latencies + [time.perf_counter() - t0])[-512:]


def make_server(
    service: SynthService, host: str = "127.0.0.1", port: int = 8000
) -> ThreadingHTTPServer:
    """HTTP front for a SynthService. Threaded accept loop; device dispatch
    itself is serialized inside the service."""
    httpd = ThreadingHTTPServer((host, port), _Handler)
    httpd.service = service  # type: ignore[attr-defined]
    return httpd
