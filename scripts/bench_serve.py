#!/usr/bin/env python
"""Serving load benchmark: concurrent request latency/throughput.

  python scripts/bench_serve.py --requests 32 --concurrency 8 \
      --coalesce-ms 5 --seconds 4

Measures the in-process SynthService (no HTTP overhead): p50/p95 request
latency, aggregate audio-seconds/sec throughput, and the device-call
merge ratio the coalescer achieved. Run with --coalesce-ms 0 for the
baseline; the delta is what request merging buys on one chip.
"""

import argparse
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--composer", default="specgan_rich")
    ap.add_argument("--vocoder", default="vocoder_rich")
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--coalesce-ms", type=float, default=5.0)
    ap.add_argument("--batch-buckets", default="1,4,8")
    ap.add_argument("--patch-buckets", default="4")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--device", choices=["cpu", "default"], default="default")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from music_synthesis_tpu.serve import ServeConfig, SynthService

    sc = ServeConfig(
        composer=args.composer,
        vocoder=args.vocoder,
        batch_buckets=tuple(int(x) for x in args.batch_buckets.split(",")),
        patch_buckets=tuple(int(x) for x in args.patch_buckets.split(",")),
        coalesce_window_ms=args.coalesce_ms,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        target_rms=0.0,
    )
    print(f"warming {len(sc.batch_buckets) * len(sc.patch_buckets)} buckets "
          f"(+stream) ...", flush=True)
    svc = SynthService(sc)
    print(f"device: {svc.health()['device']}", flush=True)

    lat: list[float] = []
    lat_lock = threading.Lock()
    sem = threading.Semaphore(args.concurrency)
    done = threading.Event()
    remaining = [args.requests]

    def worker(i: int) -> None:
        with sem:
            t0 = time.perf_counter()
            wav, meta = svc.synth(seconds=args.seconds, seed=i,
                                  target_rms=0.0)
            dt = time.perf_counter() - t0
        assert np.isfinite(wav).all()
        with lat_lock:
            lat.append(dt)
            remaining[0] -= 1
            if remaining[0] == 0:
                done.set()

    t_start = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(args.requests)]
    for t in threads:
        t.start()
    done.wait()
    wall = time.perf_counter() - t_start
    for t in threads:
        t.join()

    lat.sort()
    n = len(lat)
    m = svc.metrics()
    audio_s = args.requests * args.seconds
    print(f"requests: {args.requests} @ concurrency {args.concurrency}, "
          f"coalesce {args.coalesce_ms} ms")
    print(f"wall: {wall:.2f}s  throughput: {audio_s / wall:.1f} "
          f"audio-sec/sec  (serving RTF {audio_s / wall:.1f}x)")
    print(f"latency p50: {lat[n // 2] * 1e3:.0f} ms  "
          f"p95: {lat[min(n - 1, int(n * 0.95))] * 1e3:.0f} ms")
    print(f"device_calls: {m['device_calls']} for {m['requests']} requests "
          f"(merge ratio {m['requests'] / max(1, m['device_calls']):.2f}x)")


if __name__ == "__main__":
    main()
