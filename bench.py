"""Benchmark harness (SURVEY.md §4.5, BASELINE.md).

Headline metric: real-time factor of the fused two-stage inference program
(spectrogram generator -> chunked vocoder -> overlap-add, one XLA program)
on the current default device — generated-audio-seconds per wall-second per
chip. The driver target is >= 500x realtime per v5e chip (BASELINE.json:5);
``vs_baseline`` reports the ratio against that 500x target (no published
reference numbers exist — BASELINE.md).

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from music_synthesis_tpu.config import E2E_INFERENCE
    from music_synthesis_tpu.infer.generate import generate
    from music_synthesis_tpu.models.specgan import SpectrogramGenerator
    from music_synthesis_tpu.models.vocoder import Vocoder

    cfg = E2E_INFERENCE
    dev = jax.devices()[0]
    log(f"device: {dev.platform} / {dev.device_kind}")

    key = jax.random.PRNGKey(0)
    k1, k2, kz = jax.random.split(key, 3)
    z0 = jnp.zeros((1, cfg.specgan.latent_dim), jnp.float32)
    specgan_params = SpectrogramGenerator(cfg.specgan).init(k1, z0)["params"]
    mel0 = jnp.zeros((1, 8, cfg.vocoder.n_mels), jnp.float32)
    vocoder_params = Vocoder(cfg.vocoder).init(k2, mel0)["params"]

    batch = 16
    z = jax.random.normal(kz, (batch, cfg.specgan.latent_dim), jnp.float32)
    fn = jax.jit(generate, static_argnums=0)

    def call(i: int):
        # Fresh latents every call: repeated identical invocations can be
        # served from execution caches and would overstate throughput.
        zi = jax.random.normal(
            jax.random.fold_in(kz, i), (batch, cfg.specgan.latent_dim)
        )
        return fn(cfg, specgan_params, vocoder_params, zi)

    samples_per_call = batch * cfg.specgan.n_frames * cfg.vocoder.hop_length
    audio_sec_per_call = samples_per_call / cfg.frontend.sample_rate
    log(f"batch={batch} frames={cfg.specgan.n_frames} "
        f"-> {audio_sec_per_call:.2f} audio-seconds per call")

    # Warmup / compile.
    t0 = time.perf_counter()
    out = fn(cfg, specgan_params, vocoder_params, z)
    jax.block_until_ready(out)
    log(f"compile+first call: {time.perf_counter() - t0:.1f}s; "
        f"out shape {out.shape}")

    jax.block_until_ready(call(10_000))  # warm the fresh-z path
    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = call(i)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    rtf = audio_sec_per_call * n_iters / elapsed
    log(f"{n_iters} iters in {elapsed:.3f}s -> RTF {rtf:.0f}x")

    print(json.dumps({
        "metric": "fused_two_stage_inference_rtf",
        "value": round(rtf, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
