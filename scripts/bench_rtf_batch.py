#!/usr/bin/env python
"""Batch-size sweep for the fused two-stage inference RTF headline.

BASELINE.json config 4 ("two-stage end-to-end inference") scores audio
seconds generated per wall second per chip; the batch size is ours to
choose. bench.py pins the headline at batch=16 — this sweep measures
where per-chip throughput actually saturates so that pin is evidence,
not habit.

Methodology matches bench.py: n generations inside one jitted lax.scan
(checksum forces all work), per-call time from the (n - 1)-call delta
between a 1-call and an n-call run, min over repeats, per>0 noise
filter. scan iterations are scaled down as batch grows so device time
per timed run stays ~constant.

  python scripts/bench_rtf_batch.py --batches 8,16,32,64,128
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32,64,128")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--calls", type=int, default=5120,
                    help="approx total generate() calls per timed run at "
                         "batch=16; scaled inversely with batch")
    ap.add_argument("--preset", choices=["fast", "tiny"], default="fast",
                    help="tiny = CPU smoke test of the harness itself")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from music_synthesis_tpu.config import E2E_INFERENCE_FAST, TINY
    from music_synthesis_tpu.infer.generate import generate
    from music_synthesis_tpu.models.specgan import SpectrogramGenerator
    from music_synthesis_tpu.models.vocoder import Vocoder

    cfg = TINY if args.preset == "tiny" else E2E_INFERENCE_FAST
    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    k1, k2, kz = jax.random.split(key, 3)
    z0 = jnp.zeros((1, cfg.specgan.latent_dim), jnp.float32)
    sg = SpectrogramGenerator(cfg.specgan).init(k1, z0)["params"]
    mel0 = jnp.zeros((1, 8, cfg.vocoder.n_mels), jnp.float32)
    vp = Vocoder(cfg.vocoder).init(k2, mel0)["params"]

    rows = []
    for batch in [int(b) for b in args.batches.split(",")]:
        samples = batch * cfg.specgan.n_frames * cfg.vocoder.hop_length
        audio_sec = samples / cfg.frontend.sample_rate

        @functools.partial(jax.jit, static_argnums=(0, 1))
        def many(n, b, loop_key):
            def body(carry, i):
                zi = jax.random.normal(
                    jax.random.fold_in(loop_key, i),
                    (b, cfg.specgan.latent_dim))
                wav = generate(cfg, sg, vp, zi)
                return carry + jnp.sum(jnp.abs(wav)), None

            total, _ = lax.scan(body, jnp.float32(0), jnp.arange(n))
            return total

        # Keep device work per timed run roughly constant across batches.
        n_iters = max(41, (args.calls * 16) // batch + 1)

        def run(n, r):
            t0 = time.perf_counter()
            v = float(many(n, batch, jax.random.fold_in(kz, 1000 * n + r)))
            assert v > 0
            return time.perf_counter() - t0

        run(1, 0)
        run(n_iters, 0)  # compile + warm
        per = []
        for r in range(1, args.repeats + 1):
            d = (run(n_iters, r) - run(1, r)) / (n_iters - 1)
            if d > 0:
                per.append(d)
        assert per, f"batch {batch}: noise-dominated"
        best = min(per)
        rtf = audio_sec / best
        rows.append({"batch": batch, "ms_per_call": round(best * 1e3, 4),
                     "audio_sec_per_call": round(audio_sec, 3),
                     "rtf_per_chip": round(rtf, 1)})
        print(f"batch {batch:4d}: {best * 1e3:7.3f} ms/call "
              f"-> {rtf:10.1f}x realtime", file=sys.stderr)

    best_row = max(rows, key=lambda r: r["rtf_per_chip"])
    print(json.dumps({"sweep": rows, "best": best_row}))


if __name__ == "__main__":
    main()
