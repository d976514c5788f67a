"""Device mesh + sharding layer (SURVEY.md §2b, §5.8).

The reference is single-device; the TPU build *introduces* distribution:
data-parallel over an ICI mesh via NamedSharding annotations on jit — XLA
inserts the psum gradient all-reduce from sharding propagation (the batch
axis is sharded, parameters are replicated, so every ``mean`` over batch
becomes a cross-replica reduction on ICI).

On a v5e-8 the mesh is ``(8,) x ('data',)`` (config 5, BASELINE.json:11);
larger slices or multi-slice (DCN) reuse the same API with a bigger mesh.
Tensor/pipeline/expert axes are structurally inapplicable to this model
family (SURVEY.md §2b) but the axis-name plumbing below is axis-count
agnostic, so adding a 'model' axis is a mesh-shape change, not a rewrite.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "chunk_sharding",
    "replicated",
    "shard_batch",
    "shard_chunk",
    "replicate_state",
]


def make_mesh(
    shape: Sequence[int] = (8,),
    axes: Sequence[str] = ("data",),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a device mesh. Defaults to all visible devices in ICI order."""
    if devices is None:
        mesh_devices = mesh_utils.create_device_mesh(tuple(shape))
    else:
        mesh_devices = np.asarray(devices).reshape(tuple(shape))
    return Mesh(mesh_devices, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading (batch) dim sharded over ``axis``, rest replicated."""
    return NamedSharding(mesh, P(axis))


def chunk_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """``[K, B, ...]`` step-chunk: batch dim (axis 1) sharded, K replicated.

    The layout ``train_step_many``-style K-step dispatch chains use under
    data parallelism (scan over K inside the program, shard over B)."""
    return NamedSharding(mesh, P(None, axis))


def shard_chunk(chunk: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device_put a ``[K, B, ...]`` chunk with dim 1 sharded over ``axis``."""
    sh = chunk_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), chunk)


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer state, rng)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device_put every leaf with its leading dim sharded over ``axis``."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Fully replicate a parameter/optimizer pytree over the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)
