"""Environment plumbing shared by the CLI scripts.

The experimental axon TPU PJRT plugin ignores a plain ``JAX_PLATFORMS=cpu``
environment variable, so CPU-only smoke runs (virtual 8-device mesh, CI) go
through ``jax.config`` instead. Setting ``MSYNTH_FORCE_CPU_DEVICES=N`` makes
any script run on N virtual CPU devices — the same mechanism the test
conftest and the driver's multichip dry-run use.
"""

from __future__ import annotations

import os

__all__ = ["maybe_force_cpu"]


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
