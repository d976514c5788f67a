#!/usr/bin/env python
"""Sweep stage-2 train-step recipe variants on the real chip.

Times the fast recipe (bf16 G/D + reuse-real-feats) with the round-3 perf
knobs (MSDConfig.dense_groups_max_g, TrainConfig.concat_disc_batch) using
the device-loop methodology from bench.py (lax.scan over fresh on-device
batches, n=1 run subtracts fixed dispatch overhead).

  python scripts/bench_step_variants.py --variants 0,16,64,256 --concat both
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
    ap.add_argument("--variants", default="0,16,64,256",
                    help="comma list of dense_groups_max_g values")
    ap.add_argument("--concat", choices=["on", "off", "both"], default="both")
    ap.add_argument("--f-fold", type=int, default=0,
                    help="MRD F-fold factor (4 = production fast recipe)")
    ap.add_argument("--iters", type=int, default=11)
    args = ap.parse_args()

    import dataclasses
    import os

    import jax
    import jax.numpy as jnp
    from jax import lax

    from music_synthesis_tpu.config import PipelineConfig
    from music_synthesis_tpu.train import stage2

    base = PipelineConfig()
    fast = dataclasses.replace(
        base,
        msd=dataclasses.replace(base.msd, compute_dtype="bfloat16"),
        mrd=dataclasses.replace(base.mrd, compute_dtype="bfloat16",
                                f_fold=args.f_fold),
        vocoder=dataclasses.replace(base.vocoder, compute_dtype="bfloat16"),
        train=dataclasses.replace(base.train, reuse_real_features=True),
    )
    seed = int.from_bytes(os.urandom(4), "little")
    results = {}
    concats = {"on": [True], "off": [False], "both": [False, True]}[args.concat]
    for dg in [int(v) for v in args.variants.split(",")]:
        for cc in concats:
            cfg = dataclasses.replace(
                fast,
                msd=dataclasses.replace(fast.msd, dense_groups_max_g=dg),
                train=dataclasses.replace(
                    fast.train, concat_disc_batch=cc),
            )
            b, seg = cfg.train.batch_size, cfg.train.segment_length

            @functools.partial(jax.jit, static_argnums=0)
            def many(n: int, state, loop_key, _cfg=cfg, _b=b, _seg=seg):
                def body(st, i):
                    wav = 0.5 * jnp.tanh(jax.random.normal(
                        jax.random.fold_in(loop_key, i), (_b, _seg)))
                    st, m = stage2.train_step_impl(_cfg, st, wav)
                    return st, m["d_loss"]

                st, losses = lax.scan(body, state, jnp.arange(n))
                return jnp.sum(losses)

            def run(n, r):
                state = stage2.make_train_state(cfg, jax.random.PRNGKey(0))
                key = jax.random.fold_in(
                    jax.random.PRNGKey(seed), 31 * n + r)
                jax.block_until_ready(state.g_params)
                t0 = time.perf_counter()
                v = float(many(n, state, key))
                dt = time.perf_counter() - t0
                assert jnp.isfinite(v), "non-finite loss"
                return dt

            name = (f"dg{dg}_ff{args.f_fold}_"
                    f"{'concat' if cc else 'split'}")
            t0 = time.perf_counter()
            run(1, 0); run(args.iters, 0)
            compile_s = time.perf_counter() - t0
            per = []
            for r in (1, 2, 3):
                d = (run(args.iters, r) - run(1, r)) / (args.iters - 1)
                # Same per>0 dispatch-noise guard as bench.py.
                if d > 0:
                    per.append(d)
            assert per, f"{name}: all timing runs noise-dominated"
            ms = min(per) * 1e3
            results[name] = round(ms, 2)
            print(f"{name}: {ms:.2f} ms/step (compile+warm {compile_s:.0f}s, "
                  f"runs {[f'{p*1e3:.1f}' for p in per]})", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
