"""Test harness: force CPU with 8 virtual devices BEFORE jax is imported.

SURVEY.md §4.4: distributed tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count); the real v5e-8 config only changes
mesh construction. Bench/production code paths never import this.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU compilation cheap & deterministic on the 1-core test machine.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The experimental axon PJRT plugin ignores JAX_PLATFORMS from the
# environment; force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
