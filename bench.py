"""Benchmark harness (SURVEY.md §4.5, BASELINE.md).

Headline metric: real-time factor of the fused two-stage inference program
(spectrogram generator -> chunked vocoder -> overlap-add, one XLA program)
— generated-audio-seconds per wall-second per chip. Target >= 500x realtime
per v5e chip (BASELINE.json:5); ``vs_baseline`` is the ratio against that
target (no published reference numbers exist — BASELINE.md).

Methodology — this environment has two hazards that inflate naive numbers,
both defended against:
  1. The execution stack serves identical (program, input) pairs from a
     cache that persists across processes -> fresh latents derived on device
     from a per-run random seed.
  2. ``block_until_ready`` can return before async work completes, and a
     single synchronous dispatch pays a ~30 ms tunnel round trip that hides
     the chip -> the benchmark loop runs ON DEVICE (lax.scan over fresh
     latents, one 4-byte checksum out, so nothing can be elided), and the
     fixed dispatch overhead is subtracted via an n=1 run.

Prints exactly ONE JSON line to stdout (the driver contract); which metric
that line reports is selected with --metric (default: inference RTF). ALL
measured metrics — inference RTF for both presets and the stage-2 GAN
training step time (BASELINE.json:5) with a FLOP/MFU accounting — are
written to BENCH_FULL.json and logged to stderr.

Driver-contract hardening (round 5 — round 4's record was a timeout null,
rc=124 with the JSON line never printed):
  * The contract line is printed to stdout IMMEDIATELY after the selected
    headline metric is measured, and nothing else is ever written to
    stdout, so the driver's "last stdout line" read is satisfied even if
    a later auxiliary scenario stalls or the run is killed.
  * BENCH_FULL.json is rewritten incrementally after every scenario.
  * A persistent XLA compilation cache (.jax_cache/) amortizes the large
    stage-2 compile (~8 min cold in round 4) across runs and retries.
  * Backend-init retries carry a TOTAL wall budget across process
    re-execs, so a dead tunnel costs bounded time instead of eating the
    driver's whole capture window.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import threading
import time

# Persistent compile cache — must be configured before jax initializes.
# Keyed per backend automatically; safe to share with training scripts.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Backend acquisition must survive the environment's #1 hazard: the axon
# TPU tunnel stalling or refusing init (round 3's driver bench died with
# rc=1 on a single unguarded jax.devices() call — VERDICT round 3, item 1).
# Two failure modes, both handled:
#   * jax.devices() RAISES (UNAVAILABLE) — jax caches the failed backend,
#     so an in-process retry is useless; re-exec a FRESH process (fresh
#     dial, per the tunnel-stall recovery protocol) after a backoff.
#   * jax.devices() HANGS (tunnel stall mid-RPC) — a watchdog thread
#     deadline converts the hang into a retry; execv destroys the stuck
#     thread along with the rest of the process image.
_BENCH_ATTEMPTS = 10
_BENCH_BACKOFF_S = 60
_BENCH_INIT_DEADLINE_S = 240    # device enumeration RPC
_BENCH_LIGHT_DEADLINE_S = 300   # first-light compile RPC, on top of init
_BENCH_TOTAL_BUDGET_S = 1200    # across ALL re-exec retries (advisor r4:
                                # 10×(240+60)s of retries could eat ~50 min
                                # of the driver's capture window)


def acquire_device():
    attempt = int(os.environ.get("MSYNTH_BENCH_ATTEMPT", "0"))
    first_ts = float(os.environ.setdefault(
        "MSYNTH_BENCH_FIRST_TS", repr(time.time())))
    box: dict = {}

    def _probe():
        try:
            box["dev"] = jax.devices()[0]
            box["enum_s"] = time.perf_counter()
            # First light: one tiny compile+execute+readback proves the
            # FULL RPC path before the expensive benches start. Round 4
            # observed a degraded tunnel that served device enumeration
            # (so an init-only probe passes) while every compile RPC
            # stalled — exactly the state that would hang the first real
            # jit for the rest of the driver's capture window.
            box["light"] = float(
                jax.jit(lambda a: (a * 2.0).sum())(
                    jnp.ones((8, 128), jnp.float32)))
        except Exception as e:  # noqa: BLE001 — any init error retries
            box["err"] = e

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    # Two-phase deadline (advisor r4): enumeration gets INIT seconds; once
    # the device is visible the first-light compile gets LIGHT more, so a
    # healthy-but-slow compile through a degraded tunnel is not
    # misclassified as an init hang (and the retry log says which phase
    # stalled).
    t.join(_BENCH_INIT_DEADLINE_S)
    if "dev" in box and "light" not in box and "err" not in box:
        log("device enumeration OK; waiting on first-light compile "
            f"(+{_BENCH_LIGHT_DEADLINE_S}s)")
        t.join(_BENCH_LIGHT_DEADLINE_S)
    if "light" in box:
        return box["dev"]
    phase = ("first-light compile" if "dev" in box else "device enumeration")
    err = box.get("err", TimeoutError(
        f"{phase} hung past its deadline (tunnel stall?)"))
    spent = time.time() - first_ts
    if attempt + 1 >= _BENCH_ATTEMPTS or spent > _BENCH_TOTAL_BUDGET_S:
        log(f"backend init failed; giving up on final attempt "
            f"{attempt + 1}/{_BENCH_ATTEMPTS} after {spent:.0f}s total "
            f"(budget {_BENCH_TOTAL_BUDGET_S}s): {err!r}")
        # Hard exit: a failed axon init can leave non-daemon threads alive,
        # so a plain raise would HANG the process at interpreter shutdown
        # and the driver would never see the rc. os._exit guarantees rc=1.
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(1)
    log(f"backend init failed (attempt {attempt + 1}/{_BENCH_ATTEMPTS}, "
        f"{spent:.0f}s/{_BENCH_TOTAL_BUDGET_S}s budget spent): {err!r}; "
        f"retrying in {_BENCH_BACKOFF_S}s with a fresh process")
    time.sleep(_BENCH_BACKOFF_S)
    os.environ["MSYNTH_BENCH_ATTEMPT"] = str(attempt + 1)
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable] + sys.argv)


def bench_stage2_step(results: dict, variants: dict | None = None,
                      n_iters: int = 11) -> None:
    """Stage-2 GAN training step time at batch 16 x 8192 (BASELINE.json:5).

    Same device-loop methodology as the inference bench: n steps chained
    through lax.scan with fresh on-device batches per step (nothing
    cacheable/elidable), fixed dispatch overhead removed via an n=1 run.
    Measures the reference-faithful fp32 recipe and the validated fast
    recipe (bf16 discriminators + D(real) feature reuse).

    ``variants``/``n_iters`` are injectable so the full code path (incl.
    the FLOP accounting) can be driven at TINY scale on CPU in tests.
    """
    import dataclasses

    from music_synthesis_tpu.config import PipelineConfig
    from music_synthesis_tpu.train import stage2

    base = PipelineConfig()
    variants = variants if variants is not None else {
        "stage2_gan_step_ms": base,
        # Fast recipe: bf16 G/D + D(real)-feature reuse (round 2, quality-
        # validated at 50k steps) + the round-3 math-identical relayouts
        # (dense block-diagonal MSD groups <= 16, one-forward D step, MRD
        # F-fold; parity-tested in tests/test_round3.py, used by the 200k
        # training run). Cutoff 16 is the round-4 sweep winner: 31.8 ms vs
        # 34.2 (cutoff 64) / 57.5 (256) — bench_step_variants.py, on-chip.
        "stage2_gan_step_fast_ms": dataclasses.replace(
            base,
            msd=dataclasses.replace(
                base.msd, compute_dtype="bfloat16", dense_groups_max_g=16
            ),
            mrd=dataclasses.replace(
                base.mrd, compute_dtype="bfloat16", f_fold=4
            ),
            vocoder=dataclasses.replace(
                base.vocoder, compute_dtype="bfloat16"
            ),
            train=dataclasses.replace(
                base.train, reuse_real_features=True,
                concat_disc_batch=True,
            ),
        ),
    }
    seed = int.from_bytes(os.urandom(4), "little")
    for name, cfg in variants.items():
        b = cfg.train.batch_size
        seg = cfg.train.segment_length

        # No donate_argnums: the scan returns only a scalar checksum (not
        # the carried state), so donated param/opt buffers could never be
        # reused for outputs — donation here only produced the driver-
        # visible "donated buffers were not usable" warning (round-2 weak
        # item 6) without saving memory.
        @functools.partial(jax.jit, static_argnums=0)
        def many(n: int, state, loop_key, _cfg=cfg, _b=b, _seg=seg):
            def body(st, i):
                wav = 0.5 * jnp.tanh(jax.random.normal(
                    jax.random.fold_in(loop_key, i), (_b, _seg)))
                st, m = stage2.train_step_impl(_cfg, st, wav)
                return st, m["d_loss"]

            st, losses = lax.scan(body, state, jnp.arange(n))
            return jnp.sum(losses)

        def run(n: int, r: int) -> float:
            state = stage2.make_train_state(cfg, jax.random.PRNGKey(0))
            key = jax.random.fold_in(jax.random.PRNGKey(seed), 17 * n + r)
            jax.block_until_ready(state.g_params)
            t0 = time.perf_counter()
            v = float(many(n, state, key))
            dt = time.perf_counter() - t0
            assert jnp.isfinite(v), "non-finite training loss in bench"
            return dt

        t0 = time.perf_counter()
        run(1, 0)
        run(n_iters, 0)
        log(f"[{name}] compile+warm: {time.perf_counter() - t0:.1f}s")
        per = []
        for r in range(1, 4):
            t1 = run(1, r)
            tn = run(n_iters, r)
            per.append((tn - t1) / (n_iters - 1))
            log(f"[{name}] run {r}: n=1 {t1 * 1e3:.1f} ms, "
                f"n={n_iters} {tn * 1e3:.1f} ms -> {per[-1] * 1e3:.2f} ms/step")
        best = min(per)
        results[name] = round(best * 1e3, 2)

        # FLOP accounting for the MFU/roofline paragraph (DESIGN.md §2):
        # XLA's own cost model, via the already-compiled n=1 loop program
        # (one scan iteration = one step; avoids a third large compile).
        # The fast recipe's dense-groups relayout deliberately EXECUTES
        # extra FLOPs (zero off-blocks) to win dense MXU tiling, so the
        # sustained number from the compiled program is "executed"
        # throughput. The honest utilization figure discounts the padding:
        # the math-identical non-relayout twin (dense_groups_max_g=0) is
        # compiled too and its cost model gives the LOGICAL FLOPs at the
        # same optimization level. (Lowered.cost_analysis() — the cheap
        # unoptimized path — returns None under the axon TPU plugin, so
        # the twin pays a real compile; ~minutes, once per bench run.)
        try:
            state = stage2.make_train_state(cfg, jax.random.PRNGKey(0))
            lowered = many.lower(1, state, jax.random.PRNGKey(0))
            cost = lowered.compile().cost_analysis()
            flops = float(cost.get("flops", 0.0))
            results[name + "_tflops_per_s"] = round(
                flops / best / 1e12, 2
            )
            log(f"[{name}] XLA-estimated {flops / 1e9:.1f} GFLOP/step "
                f"(executed) -> {flops / best / 1e12:.1f} TFLOP/s sustained")
            if cfg.msd.dense_groups_max_g or cfg.mrd.f_fold:
                # The logical twin excludes BOTH padding relayouts: the
                # dense-groups block-diagonal MSD kernels AND the MRD
                # F-fold (whose folded kernels also execute padded FLOPs)
                # — advisor round 3: zeroing only the former understates
                # the inflation factor.
                twin = dataclasses.replace(
                    cfg,
                    msd=dataclasses.replace(cfg.msd, dense_groups_max_g=0),
                    mrd=dataclasses.replace(cfg.mrd, f_fold=0))

                @functools.partial(jax.jit, static_argnums=0)
                def many_twin(n: int, st, loop_key, _cfg=twin):
                    def body(st, i):
                        wav = 0.5 * jnp.tanh(jax.random.normal(
                            jax.random.fold_in(loop_key, i), (b, seg)))
                        st, m = stage2.train_step_impl(_cfg, st, wav)
                        return st, m["d_loss"]

                    st, losses = lax.scan(body, st, jnp.arange(n))
                    return jnp.sum(losses)

                # Param pytrees are identical (the relayout scatters grouped
                # kernels into a block-diagonal dense kernel at apply time;
                # ops/conv.py keeps the grouped param shape), so the same
                # state lowers the twin. Prefer the cheap unoptimized cost
                # when the backend provides it; fall back to compiling the
                # twin (ratios agree across levels: 1.063x vs 1.057x on
                # TINY).
                tl = many_twin.lower(1, state, jax.random.PRNGKey(0))
                fe_unopt_c = lowered.cost_analysis()
                fl_unopt_c = tl.cost_analysis()
                if fe_unopt_c is not None and fl_unopt_c is not None:
                    fe = float(fe_unopt_c.get("flops", 0.0))
                    fl = float(fl_unopt_c.get("flops", 0.0))
                    logical = flops * fl / fe if fe > 0 else 0.0
                else:
                    logical = float(
                        tl.compile().cost_analysis().get("flops", 0.0))
                if logical > 0:
                    inflation = flops / logical
                    results[name + "_logical_tflops_per_s"] = round(
                        logical / best / 1e12, 2)
                    results[name + "_executed_flop_inflation"] = round(
                        inflation, 3)
                    log(f"[{name}] logical {logical / 1e9:.1f} GFLOP/step "
                        f"-> {logical / best / 1e12:.2f} TFLOP/s useful "
                        f"({inflation:.3f}x executed-FLOP inflation from "
                        f"the dense-groups relayout)")
        except Exception as e:  # cost model is best-effort
            log(f"[{name}] cost_analysis unavailable: {e}")


def bench_frontend_cpu_clip(results: dict, n_iters: int = 21,
                            seconds: float = 30.0) -> None:
    """BASELINE config 1: log-mel extraction of one 22.05 kHz clip on CPU.

    Runs the pure-JAX oracle front-end on the host CPU backend (the config
    says CPU explicitly); timing is plain wall-clock around
    block_until_ready — there is no dispatch tunnel on the CPU path, but
    the 1-core host is shared, so take the min over enough repeats that
    at least one lands on a quiet core (the committed value doubled
    28.7 -> 57.9 ms across two round-4 runs under host load — advisor r4).
    """
    from music_synthesis_tpu.config import PipelineConfig
    from music_synthesis_tpu.ops import frontend

    fcfg = PipelineConfig().frontend
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        n = int(seconds * fcfg.sample_rate)
        wav = 0.1 * jnp.sin(
            2 * jnp.pi * 440.0 * jnp.arange(n, dtype=jnp.float32)
            / fcfg.sample_rate)[None, :]
        fn = jax.jit(functools.partial(frontend.log_mel, cfg=fcfg))
        out = jax.block_until_ready(fn(wav))  # compile
        assert bool(jnp.isfinite(out).all())
        times = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(wav))
            times.append(time.perf_counter() - t0)
    best = min(times)
    results["frontend_cpu_clip_ms"] = round(best * 1e3, 2)
    results["frontend_cpu_clip_x_realtime"] = round(seconds / best, 1)
    log(f"[frontend_cpu_clip] {seconds:.0f}s clip -> {best * 1e3:.2f} ms "
        f"({seconds / best:.0f}x realtime on host CPU)")


def bench_stage1_fwd_loss(results: dict, n_iters: int = 5001) -> None:
    """BASELINE config 2: stage-1 generator forward + hinge losses on one
    batch. Device-loop methodology (fresh latents per scan iteration,
    scalar checksum out, n=1 dispatch overhead subtracted). n_iters sized
    for the ±30 ms tunnel-RTT noise band: at ~0.012 ms/batch, 101
    iterations gave ~1 ms of signal and the committed value wandered
    0.011..0.038 across rounds (advisor r4); 5001 gives ~60 ms."""
    from music_synthesis_tpu.config import PipelineConfig
    from music_synthesis_tpu.train import stage1

    cfg = PipelineConfig()
    b = cfg.train.batch_size
    state = stage1.make_train_state(cfg, jax.random.PRNGKey(0))
    real = jax.random.uniform(
        jax.random.PRNGKey(1), (b, cfg.specgan.n_frames, cfg.specgan.n_mels),
        minval=-1.0, maxval=1.0)
    seed = int.from_bytes(os.urandom(4), "little")

    @functools.partial(jax.jit, static_argnums=0)
    def many(n: int, st, rm, loop_key):
        def body(carry, i):
            z = jax.random.normal(
                jax.random.fold_in(loop_key, i),
                (b, cfg.specgan.latent_dim))
            m = stage1.forward_and_loss(cfg, st, rm, z)
            return carry + m["d_loss"] + m["g_loss"], None

        total, _ = lax.scan(body, jnp.float32(0), jnp.arange(n))
        return total

    def run(n: int, r: int) -> float:
        key = jax.random.fold_in(jax.random.PRNGKey(seed), 31 * n + r)
        t0 = time.perf_counter()
        v = float(many(n, state, real, key))
        assert jnp.isfinite(v)
        return time.perf_counter() - t0

    run(1, 0)
    run(n_iters, 0)
    per = []
    for r in range(1, 4):
        t1 = run(1, r)
        tn = run(n_iters, r)
        d = (tn - t1) / (n_iters - 1)
        if d > 0:
            per.append(d)
        log(f"[stage1_fwd_loss] run {r}: n=1 {t1 * 1e3:.1f} ms, "
            f"n={n_iters} {tn * 1e3:.1f} ms -> {d * 1e3:.3f} ms")
    assert per, "stage1 fwd+loss timing noise-dominated"
    results["stage1_fwd_loss_ms"] = round(min(per) * 1e3, 3)
    log(f"[stage1_fwd_loss] best {min(per) * 1e3:.3f} ms/batch{b}")


def bench_frontend_ab(results: dict, n_iters: int = 2001) -> None:
    """Fused Pallas front-end vs the pure-JAX oracle, on-device, at the
    stage-2 training batch shape [16, 8192] (VERDICT r3 weak #5: the
    framework's signature claim needs one committed A/B number).

    Skipped automatically on CPU (the compiled Mosaic kernel is TPU-only;
    interpret mode would not be a performance statement). n_iters sized so
    the on-device signal clears the ±30 ms tunnel-RTT noise band: at 101
    iterations this A/B measured anywhere between 0.028 and 0.089 ms for
    the same kernel across runs (round-4's committed 0.571x "slowdown" was
    that noise — advisor r4 item 3).
    """
    if jax.devices()[0].platform == "cpu":
        log("[frontend_ab] skipped on CPU (no compiled Mosaic kernel)")
        return
    from music_synthesis_tpu.config import PipelineConfig
    from music_synthesis_tpu.ops import frontend as fe
    from music_synthesis_tpu.ops import pallas_frontend as pfe

    cfg = PipelineConfig()
    b, seg = cfg.train.batch_size, cfg.train.segment_length
    seed = int.from_bytes(os.urandom(4), "little")

    def make_many(f):
        @functools.partial(jax.jit, static_argnums=0)
        def many(n: int, loop_key):
            def body(carry, i):
                wav = 0.5 * jnp.tanh(jax.random.normal(
                    jax.random.fold_in(loop_key, i), (b, seg)))
                return carry + jnp.sum(f(wav)), None

            total, _ = lax.scan(body, jnp.float32(0), jnp.arange(n))
            return total

        return many

    for name, f in (
        ("frontend_pallas_ms",
         lambda w: pfe.pallas_log_mel_for_vocoder(w, cfg.frontend)),
        ("frontend_oracle_ms",
         lambda w: fe.log_mel_for_vocoder(w, cfg.frontend)),
    ):
        many = make_many(f)

        def run(n: int, r: int) -> float:
            key = jax.random.fold_in(jax.random.PRNGKey(seed), 13 * n + r)
            t0 = time.perf_counter()
            v = float(many(n, key))
            assert jnp.isfinite(v)
            return time.perf_counter() - t0

        run(1, 0)
        run(n_iters, 0)
        per = []
        for r in range(1, 4):
            d = (run(n_iters, r) - run(1, r)) / (n_iters - 1)
            if d > 0:
                per.append(d)
        assert per, f"{name} timing noise-dominated"
        results[name] = round(min(per) * 1e3, 3)
        log(f"[{name}] best {min(per) * 1e3:.3f} ms at [{b},{seg}]")
    if results.get("frontend_oracle_ms") and results.get("frontend_pallas_ms"):
        results["frontend_pallas_speedup"] = round(
            results["frontend_oracle_ms"] / results["frontend_pallas_ms"], 3)
        log(f"[frontend_ab] pallas speedup vs XLA-fused oracle: "
            f"{results['frontend_pallas_speedup']}x")


def main() -> None:
    from music_synthesis_tpu.config import E2E_INFERENCE, E2E_INFERENCE_FAST
    from music_synthesis_tpu.infer.generate import generate
    from music_synthesis_tpu.models.specgan import SpectrogramGenerator
    from music_synthesis_tpu.models.vocoder import Vocoder

    # Headline preset: the iSTFT-head vocoder — since round 4 this is a
    # TRAINED system (zoo/vocoder_istft: 50k-step stabilized run, held-out
    # copy-synthesis 1.762 ± 0.17, BETTER than the waveform head's 2.084;
    # docs/DESIGN.md §16), so the fast architecture and the
    # best-evaluated architecture are now the same one. The
    # reference-faithful waveform head (zoo/vocoder_rich) is reported
    # separately below.
    cfg = E2E_INFERENCE_FAST
    dev = acquire_device()
    log(f"device: {dev.platform} / {dev.device_kind}")

    seed = int.from_bytes(os.urandom(4), "little")
    log(f"bench seed: {seed}")
    key = jax.random.PRNGKey(seed)
    k1, k2, kz = jax.random.split(key, 3)
    z0 = jnp.zeros((1, cfg.specgan.latent_dim), jnp.float32)
    specgan_params = SpectrogramGenerator(cfg.specgan).init(k1, z0)["params"]
    mel0 = jnp.zeros((1, 8, cfg.vocoder.n_mels), jnp.float32)
    vocoder_params = Vocoder(cfg.vocoder).init(k2, mel0)["params"]

    batch = 16
    samples_per_call = batch * cfg.specgan.n_frames * cfg.vocoder.hop_length
    audio_sec_per_call = samples_per_call / cfg.frontend.sample_rate
    log(f"batch={batch} frames={cfg.specgan.n_frames} "
        f"-> {audio_sec_per_call:.2f} audio-seconds per call")

    @functools.partial(jax.jit, static_argnums=0)
    def many(n: int, loop_key):
        """n fused two-stage generations on device; checksum forces all."""

        def body(carry, i):
            zi = jax.random.normal(
                jax.random.fold_in(loop_key, i),
                (batch, cfg.specgan.latent_dim),
            )
            wav = generate(cfg, specgan_params, vocoder_params, zi)
            return carry + jnp.sum(jnp.abs(wav)), None

        total, _ = lax.scan(body, jnp.float32(0), jnp.arange(n))
        return total

    def run(n: int, r: int) -> float:
        t0 = time.perf_counter()
        v = float(many(n, jax.random.fold_in(kz, 100 * n + r)))
        assert v > 0, "degenerate output"
        return time.perf_counter() - t0

    # The istft-head program runs ~0.5 ms/call: with only 40 extra calls
    # the measured delta (~20 ms) sat below the dispatch-noise band
    # (~±30 ms tunnel RTT variance), which once produced a NEGATIVE rate.
    # 320 extra calls put the signal well above the noise for both
    # presets (waveform head: ~3 s of signal).
    n_iters = 321
    t0 = time.perf_counter()
    run(1, 0)
    run(n_iters, 0)
    log(f"compile+warm both sizes: {time.perf_counter() - t0:.1f}s")

    per_call = []
    for r in range(1, 4):
        t1 = run(1, r)
        tn = run(n_iters, r)
        per = (tn - t1) / (n_iters - 1)
        if per > 0:
            per_call.append(per)
        log(f"run {r}: n=1 {t1 * 1e3:.1f} ms, n={n_iters} {tn * 1e3:.1f} ms "
            f"-> {per * 1e3:.3f} ms/call")
    assert per_call, "all timing runs were noise-dominated"
    best = min(per_call)
    rtf = audio_sec_per_call / best
    log(f"best (istft-head headline, trained system): {best * 1e3:.2f} "
        f"ms/call -> RTF {rtf:.0f}x")

    results = {"fused_two_stage_inference_rtf": round(rtf, 1)}

    def save_results() -> None:
        # Incremental: rewritten after every scenario so a stalled or
        # killed run still leaves the scenarios that DID finish on disk
        # (round 4's timeout lost everything measured after the headline).
        with open(os.path.join(os.path.dirname(__file__) or ".",
                               "BENCH_FULL.json"), "w") as f:
            json.dump(results, f, indent=1)

    save_results()

    which = "rtf"
    if "--metric" in sys.argv:
        which = sys.argv[sys.argv.index("--metric") + 1]

    def emit_contract() -> None:
        # THE driver contract: exactly one JSON line on stdout, printed the
        # moment the selected headline metric exists. Everything else in
        # this file logs to stderr, so this stays the last (and only)
        # stdout line no matter which later scenario stalls or is killed.
        if which == "stage2_step":
            # vs_baseline: ratio of the 50 ms round-2 target to the
            # measured fast-recipe step (>1 = beating the target). The
            # 50 ms bar is SELF-SET (no reference GPU number exists —
            # BASELINE.md), so the JSON names its baseline explicitly.
            ms = results["stage2_gan_step_fast_ms"]
            line = {
                "metric": "stage2_gan_step_ms",
                "value": ms,
                "unit": "ms_per_step_b16x8192",
                "vs_baseline": round(50.0 / ms, 3),
                "baseline":
                    "self-target-50ms (no reference number available)",
            }
        else:
            line = {
                "metric": "fused_two_stage_inference_rtf",
                "value": round(rtf, 1),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf / 500.0, 3),
                "baseline": "driver-target-500x (BASELINE.json:5)",
            }
        print(json.dumps(line), flush=True)

    stage2_done = False
    if which == "rtf":
        emit_contract()
    else:
        # Selected metric is the training step: measure it FIRST so its
        # contract line lands before any auxiliary scenario can stall.
        bench_stage2_step(results)
        stage2_done = True
        save_results()
        emit_contract()

    def bench_waveform_head(res: dict) -> None:
        # Waveform-head preset, same methodology: the reference-faithful
        # architecture (zoo/vocoder_rich), kept as the parity point.
        wf = E2E_INFERENCE
        wf_voc = Vocoder(wf.vocoder).init(k2, mel0)["params"]

        @functools.partial(jax.jit, static_argnums=0)
        def many_wf(n: int, loop_key):
            def body(carry, i):
                zi = jax.random.normal(
                    jax.random.fold_in(loop_key, i),
                    (batch, wf.specgan.latent_dim),
                )
                wav = generate(wf, specgan_params, wf_voc, zi)
                return carry + jnp.sum(jnp.abs(wav)), None

            total, _ = lax.scan(body, jnp.float32(0), jnp.arange(n))
            return total

        def run_wf(n: int, r: int) -> float:
            t0 = time.perf_counter()
            v = float(many_wf(n, jax.random.fold_in(kz, 7000 * n + r)))
            assert v > 0
            return time.perf_counter() - t0

        run_wf(1, 0)
        run_wf(n_iters, 0)
        # Same per>0 noise filter as the headline loop: a dispatch-noise-
        # dominated pair can yield a negative delta, which must never
        # become a negative RTF in BENCH_FULL.json (advisor round 3).
        wf_per = []
        for r in (1, 2):
            t1 = run_wf(1, r)
            tn = run_wf(n_iters, r)
            per = (tn - t1) / (n_iters - 1)
            if per > 0:
                wf_per.append(per)
            log(f"waveform run {r}: n=1 {t1 * 1e3:.1f} ms, n={n_iters} "
                f"{tn * 1e3:.1f} ms -> {per * 1e3:.3f} ms/call")
        assert wf_per, "waveform-head timing runs were all noise-dominated"
        wf_best = min(wf_per)
        wf_rtf = audio_sec_per_call / wf_best
        log(f"waveform-head preset (reference-faithful): {wf_best * 1e3:.2f}"
            f" ms/call -> RTF {wf_rtf:.0f}x")
        res["fused_two_stage_inference_rtf_waveform_head"] = round(wf_rtf, 1)

    def bench_refined_rtf(res: dict, n_gl: int = 8) -> None:
        # Headline preset + warm-started GL consistency refinement
        # (ops/griffin_lim.py; DESIGN.md §19): prices the quality knob in
        # RTF terms. Same device-loop methodology and noise filter.
        from music_synthesis_tpu.infer.generate import generate_refined

        @functools.partial(jax.jit, static_argnums=0)
        def many_ref(n: int, loop_key):
            def body(carry, i):
                zi = jax.random.normal(
                    jax.random.fold_in(loop_key, i),
                    (batch, cfg.specgan.latent_dim),
                )
                wav = generate_refined(
                    cfg, specgan_params, vocoder_params, zi, n_gl)
                return carry + jnp.sum(jnp.abs(wav)), None

            total, _ = lax.scan(body, jnp.float32(0), jnp.arange(n))
            return total

        def run_ref(n: int, r: int) -> float:
            t0 = time.perf_counter()
            v = float(many_ref(n, jax.random.fold_in(kz, 31000 * n + r)))
            assert v > 0
            return time.perf_counter() - t0

        run_ref(1, 0)
        run_ref(n_iters, 0)
        ref_per = []
        for r in (1, 2):
            t1 = run_ref(1, r)
            tn = run_ref(n_iters, r)
            per = (tn - t1) / (n_iters - 1)
            if per > 0:
                ref_per.append(per)
            log(f"refined run {r}: n=1 {t1 * 1e3:.1f} ms, n={n_iters} "
                f"{tn * 1e3:.1f} ms -> {per * 1e3:.3f} ms/call")
        assert ref_per, "refined timing runs were all noise-dominated"
        ref_rtf = audio_sec_per_call / min(ref_per)
        log(f"refined preset (+{n_gl} GL projections): "
            f"{min(ref_per) * 1e3:.2f} ms/call -> RTF {ref_rtf:.0f}x")
        res["fused_two_stage_inference_rtf_gl_refined"] = round(ref_rtf, 1)
        res["gl_refine_n_iter"] = n_gl

    # Auxiliary scenarios — ALL best-effort after the contract line is out:
    # none of them may cost the headline artifact, and each one that
    # finishes lands in BENCH_FULL.json immediately.
    extras = [bench_waveform_head, bench_refined_rtf]
    if not stage2_done:
        extras.append(bench_stage2_step)
    extras += [bench_stage1_fwd_loss, bench_frontend_cpu_clip,
               bench_frontend_ab]
    for extra in extras:
        try:
            extra(results)
        except Exception as e:  # noqa: BLE001
            log(f"[{extra.__name__}] failed (non-fatal): {e!r}")
        save_results()
    log(f"all metrics: {results}")


if __name__ == "__main__":
    main()
