#!/usr/bin/env python
"""Per-stage vocoder profiling with the honest device-loop methodology.

Each stage (and the full model) is timed as ``lax.scan`` over fresh inputs
derived on device, returning one checksum; fixed dispatch overhead is
subtracted via an n=1 run (see bench.py header for why naive timing lies in
this environment).

  python scripts/profile_vocoder.py [--iters 20] [--batch 16]
"""

import argparse
import functools
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--compute-dtype", default="float32")
    ap.add_argument("--upsample-mode", default="transpose")
    args = ap.parse_args()

    import dataclasses

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from jax import lax

    from music_synthesis_tpu.config import E2E_INFERENCE
    from music_synthesis_tpu.models.vocoder import ResidualStack, Vocoder
    from music_synthesis_tpu.ops.conv import WNConv, WNConvTranspose1d

    base = dataclasses.replace(
        E2E_INFERENCE.vocoder,
        compute_dtype=args.compute_dtype,
        upsample_mode=args.upsample_mode,
    )
    seed = int.from_bytes(os.urandom(4), "little")
    key = jax.random.PRNGKey(seed)
    B, T = args.batch, args.frames
    n = args.iters

    class Up(nn.Module):
        ch: int
        u: int

        @nn.compact
        def __call__(self, x):
            if base.upsample_mode == "transpose":
                x = WNConvTranspose1d(self.ch, 2 * self.u, self.u,
                                      compute_dtype=base.compute_dtype)(x)
            else:
                x = jnp.repeat(x, self.u, axis=1)
                x = WNConv(self.ch, (2 * self.u + 1,), padding="reflect",
                           compute_dtype=base.compute_dtype)(x)
            return ResidualStack(self.ch, base.res_dilations,
                                 compute_dtype=base.compute_dtype)(x)

    def profile(label, module, shape):
        x0 = jnp.zeros((B, *shape), jnp.float32)
        params = module.init(jax.random.fold_in(key, hash(label) % 2**31), x0)

        @functools.partial(jax.jit, static_argnums=0)
        def many(k, loop_key):
            def body(carry, i):
                x = jax.random.normal(jax.random.fold_in(loop_key, i),
                                      (B, *shape))
                return carry + jnp.sum(jnp.abs(module.apply(params, x))), None
            tot, _ = lax.scan(body, jnp.float32(0), jnp.arange(k))
            return tot

        def run(k, r):
            t0 = time.perf_counter()
            v = float(many(k, jax.random.fold_in(key, 1000 * k + r)))
            assert v >= 0
            return time.perf_counter() - t0

        run(1, 0)
        run(n + 1, 0)
        per = min((run(n + 1, r) - run(1, r)) / n for r in (1, 2))
        print(f"{label:40s} {per * 1e3:8.3f} ms", flush=True)
        return per

    ch = base.base_channels
    total = 0.0
    total += profile(f"conv_in {base.n_mels}->{ch} @T{T}",
                     WNConv(ch, (base.input_kernel,), padding="reflect",
                            compute_dtype=base.compute_dtype),
                     (T, base.n_mels))
    t = T
    for i, u in enumerate(base.upsample_factors):
        ch //= 2
        total += profile(f"up{i} ->{ch}ch x{u} +res @T{t}->{t * u}",
                         Up(ch, u), (t, ch * 2))
        t *= u
    total += profile(f"conv_out {ch}->1 @T{t}",
                     WNConv(1, (base.output_kernel,), padding="reflect",
                            compute_dtype=base.compute_dtype),
                     (t, ch))
    full = profile("FULL vocoder", Vocoder(base), (T, base.n_mels))
    print(f"{'sum of stages':40s} {total * 1e3:8.3f} ms "
          f"(fusion gain {100 * (1 - full / total):.0f}%)")


if __name__ == "__main__":
    main()
