#!/usr/bin/env python
"""One-command on-device validation: compiled Pallas kernel vs oracle,
fused inference, and a training step — on the real TPU.

The CPU test suite runs the Pallas kernel in interpreter mode; this script
exercises the actual Mosaic compilation path plus the main jitted programs
and prints PASS/FAIL per check. All result pulls are scalars (the dev
tunnel ships large outputs slowly).

  python scripts/verify_tpu.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from music_synthesis_tpu.utils.env import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from music_synthesis_tpu.config import E2E_INFERENCE, E2E_INFERENCE_FAST
    from music_synthesis_tpu.infer.generate import generate
    from music_synthesis_tpu.models.specgan import SpectrogramGenerator
    from music_synthesis_tpu.models.vocoder import Vocoder
    from music_synthesis_tpu.ops.frontend import log_mel
    from music_synthesis_tpu.ops.pallas_frontend import pallas_log_mel
    from music_synthesis_tpu.train import stage2

    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}")
    failures = 0
    seed = int.from_bytes(os.urandom(4), "little")
    key = jax.random.PRNGKey(seed)

    def check(name, ok, detail=""):
        nonlocal failures
        # flush: the artifact is read while the process may still be hung
        # on a later check (tunnel stalls mid-run), so partial results must
        # hit the file eagerly.
        print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}", flush=True)
        failures += 0 if ok else 1

    # 1. Fused two-stage inference, both presets (finite checksums).
    for name, pc in (("waveform", E2E_INFERENCE), ("istft", E2E_INFERENCE_FAST)):
        g1 = SpectrogramGenerator(pc.specgan).init(
            jax.random.fold_in(key, 1), jnp.zeros((1, pc.specgan.latent_dim))
        )["params"]
        g2 = Vocoder(pc.vocoder).init(
            jax.random.fold_in(key, 2), jnp.zeros((1, 8, pc.vocoder.n_mels))
        )["params"]

        @jax.jit
        def gen_sum(z, g1=g1, g2=g2, pc=pc):
            return jnp.abs(generate(pc, g1, g2, z)).sum()

        s = float(gen_sum(jax.random.normal(jax.random.fold_in(key, 3),
                                            (2, pc.specgan.latent_dim))))
        check(f"fused two-stage inference ({name} head)",
              s == s and s > 0, f"(checksum {s:.3g})")

    # 2. One full stage-2 GAN training step.
    state = stage2.make_train_state(E2E_INFERENCE, jax.random.fold_in(key, 4))
    batch = 0.5 * jnp.tanh(
        jax.random.normal(jax.random.fold_in(key, 5), (4, 8192))
    )
    t0 = time.perf_counter()
    state, metrics = stage2.train_step(E2E_INFERENCE, state, batch)
    vals = {k: float(v) for k, v in metrics.items()}
    ok = all(v == v for v in vals.values()) and vals["g_grad_norm"] > 0
    check("stage-2 GAN train step", ok,
          f"(d={vals['d_loss']:.2f} g={vals['g_loss']:.2f}, "
          f"{time.perf_counter() - t0:.0f}s)")

    # 3. Streaming == generate_long on device (scalar error pull).
    from music_synthesis_tpu.infer.generate import generate_long
    from music_synthesis_tpu.infer.stream import StreamingSynth

    pc = E2E_INFERENCE
    g1 = SpectrogramGenerator(pc.specgan).init(
        jax.random.fold_in(key, 6), jnp.zeros((1, pc.specgan.latent_dim))
    )["params"]
    g2 = Vocoder(pc.vocoder).init(
        jax.random.fold_in(key, 7), jnp.zeros((1, 8, pc.vocoder.n_mels))
    )["params"]
    z3 = jax.random.normal(jax.random.fold_in(key, 8),
                           (1, 3, pc.specgan.latent_dim))
    t0 = time.perf_counter()
    ref = jax.jit(generate_long, static_argnums=(0, 4))(pc, g1, g2, z3, 8)
    s = StreamingSynth(pc, g1, g2, crossfade_frames=8)
    import numpy as np
    out = np.concatenate(
        [s.feed(z3[:, i]) for i in range(3)] + [s.finish()], axis=-1)
    err = float(jnp.abs(jnp.asarray(out) - ref).max())
    check("streaming == generate_long (compiled)", err < 1e-3,
          f"(max err {err:.2e}, {time.perf_counter() - t0:.0f}s)")

    # 4. Griffin-Lim inversion compiles and reconstructs on device.
    from music_synthesis_tpu.losses.stft_loss import multires_stft_loss
    from music_synthesis_tpu.ops.frontend import log_mel_for_vocoder
    from music_synthesis_tpu.ops.griffin_lim import invert_log_mel

    cfg = E2E_INFERENCE.frontend
    t = jnp.arange(44032) / cfg.sample_rate
    tone = (0.3 * jnp.sin(2 * jnp.pi * 440 * t))[None]
    t0 = time.perf_counter()

    @jax.jit
    def gl_dist(x):
        mel = log_mel_for_vocoder(x, cfg)
        rec = invert_log_mel(mel, cfg, 32)
        return multires_stft_loss(rec, x[:, : rec.shape[-1]])

    d = float(gl_dist(tone))
    # Calibration (round 4): this pure-tone check measured 0.678 on CPU
    # but 1.693 on TPU under default matmul precision — bf16 MXU error in
    # the mel-pinv + per-iteration irDFT GEMMs, scored by the loss's
    # log-magnitude term in the tone's empty bins. Both GEMMs run at
    # precision="highest" (ops/griffin_lim.py); the round-5 hardware rerun
    # confirmed 0.686 on the compiled path (runs/verify_tpu_r05.txt). The
    # bound stays a loose 1.2. White-noise anchor ~6.6.
    # tests/test_griffin_lim.py pins the CPU value so CI catches
    # miscalibration first.
    check("griffin-lim inversion (compiled)", 0 < d < 1.2,
          f"(stft dist {d:.3f}, {time.perf_counter() - t0:.0f}s)")

    # 5. Compiled Pallas front-end vs fused-XLA oracle (scalar error pull).
    # Deliberately LAST: this exercises the newest Mosaic code path (the
    # batch-fused relayout), so if it ever hangs or dies the stable checks
    # above are already on disk instead of lost with the process.
    wav = 0.5 * jnp.tanh(jax.random.normal(key, (4, 22050)))
    t0 = time.perf_counter()

    @jax.jit
    def frontend_err(w):
        return jnp.abs(pallas_log_mel(w, cfg) - log_mel(w, cfg)).max()

    err = float(frontend_err(wav))
    check("pallas front-end vs oracle", err < 2e-2,
          f"(max log-mel err {err:.2e}, {time.perf_counter() - t0:.0f}s)")

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
