#!/usr/bin/env python
"""Standalone Pallas-vs-oracle front-end A/B at both bench shapes.

Same device-loop methodology as bench.py's bench_frontend_ab (fresh
on-device waveforms per scan iteration, scalar checksum out, n=1 dispatch
overhead subtracted), but parameterized over the two shapes the kernel is
judged at: the stage-2 training shape [16, 8192] and the long-clip shape
[16, 4 s]. Prints a JSON dict of all numbers to stdout.

  python scripts/bench_frontend_ab.py
"""

import functools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    from music_synthesis_tpu.utils.env import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from music_synthesis_tpu.config import PipelineConfig
    from music_synthesis_tpu.ops import frontend as fe
    from music_synthesis_tpu.ops import pallas_frontend as pfe

    cfg = PipelineConfig().frontend
    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}", file=sys.stderr)
    seed = int.from_bytes(os.urandom(4), "little")
    results = {}

    # Iteration counts sized so the on-device signal (n * ms/call) sits
    # well above the ±30 ms tunnel-RTT noise band: 2001 * 0.04 ms = 80 ms
    # for the training shape. 101 iterations measured this kernel anywhere
    # between 0.028 and 0.089 ms across runs — pure noise.
    shapes = {
        "train_16x8192": (16, 8192, 2001),
        "long_16x4s": (16, 4 * cfg.sample_rate, 501),
    }
    for sname, (b, seg, n_iters) in shapes.items():
        for kname, f in (
            ("pallas", lambda w: pfe.pallas_log_mel_for_vocoder(w, cfg)),
            ("oracle", lambda w: fe.log_mel_for_vocoder(w, cfg)),
        ):
            @functools.partial(jax.jit, static_argnums=0)
            def many(n: int, loop_key, _f=f, _b=b, _seg=seg):
                def body(carry, i):
                    wav = 0.5 * jnp.tanh(jax.random.normal(
                        jax.random.fold_in(loop_key, i), (_b, _seg)))
                    return carry + jnp.sum(_f(wav)), None

                total, _ = lax.scan(body, jnp.float32(0), jnp.arange(n))
                return total

            def run(n: int, r: int) -> float:
                key = jax.random.fold_in(
                    jax.random.PRNGKey(seed), 13 * n + r)
                t0 = time.perf_counter()
                v = float(many(n, key))
                assert jnp.isfinite(v)
                return time.perf_counter() - t0

            run(1, 0)
            run(n_iters, 0)
            per = []
            for r in range(1, 6):
                d = (run(n_iters, r) - run(1, r)) / (n_iters - 1)
                if d > 0:
                    per.append(d)
            assert per, f"{sname}/{kname} noise-dominated"
            ms = round(min(per) * 1e3, 4)
            results[f"{sname}_{kname}_ms"] = ms
            print(f"[{sname}] {kname}: {ms} ms", file=sys.stderr)
        results[f"{sname}_pallas_speedup"] = round(
            results[f"{sname}_oracle_ms"] / results[f"{sname}_pallas_ms"], 3)
        print(f"[{sname}] speedup "
              f"{results[f'{sname}_pallas_speedup']}x", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
