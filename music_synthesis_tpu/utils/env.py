"""Environment plumbing shared by the CLI scripts.

The experimental axon TPU PJRT plugin ignores a plain ``JAX_PLATFORMS=cpu``
environment variable, so CPU-only smoke runs (virtual 8-device mesh, CI) go
through ``jax.config`` instead. Setting ``MSYNTH_FORCE_CPU_DEVICES=N`` makes
any script run on N virtual CPU devices — the same mechanism the test
conftest and the driver's multichip dry-run use.
"""

from __future__ import annotations

import os

__all__ = ["maybe_force_cpu", "enable_persistent_compile_cache"]


def enable_persistent_compile_cache(path: str | None = None) -> None:
    """Point XLA's persistent compilation cache at the repo-local .jax_cache.

    The big programs here (stage-2 GAN step ~8 min cold on the tunnel,
    fused inference) dominate every script's startup; the cache amortizes
    them across train/eval/verify/bench processes and across --resume
    restarts. Keyed by backend + program, so CPU/TPU runs coexist. Must be
    called before the first compilation; env vars already set by a caller
    (e.g. bench.py) win.
    """
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))


def maybe_force_cpu() -> None:
    """Honor MSYNTH_FORCE_CPU_DEVICES=N before any jax backend is created."""
    n = os.environ.get("MSYNTH_FORCE_CPU_DEVICES")
    if not n:
        return
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
