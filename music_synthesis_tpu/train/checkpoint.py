"""Checkpoint save/restore via orbax (SURVEY.md C16, §5.4).

One composite state {g_params, d_params, g_opt, d_opt, step, rng} per stage;
restore reproduces the next training step bitwise (tested in
tests/test_train.py). Async-capable: pass ``wait=False`` to overlap the save
with training and call ``checkpointer.wait_until_finished()`` later.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "abstract_state"]


def abstract_state(cfg, stage: int):
    """Shape/dtype-only GANState template for restore — no compute runs.

    Use when restoring on a machine/role that never trains (e.g. inference
    servers loading only generator weights).
    """
    import functools

    from music_synthesis_tpu.train import stage1 as s1, stage2 as s2

    make = s1.make_train_state if stage == 1 else s2.make_train_state
    # cfg is static (not an array); close over it for eval_shape.
    return jax.eval_shape(functools.partial(make, cfg), jax.random.PRNGKey(0))


class CheckpointManager:
    """Thin orbax wrapper: numbered step checkpoints under one directory."""

    def __init__(self, directory: str | os.PathLike, max_to_keep: int = 5):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        """Async-save ``state`` at ``step``; ``wait=True`` blocks until durable."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, state_like: Any, step: int | None = None) -> Any:
        """Restore into the structure of ``state_like`` (an abstract or
        concrete state pytree). Defaults to the latest step."""
        if step is None:
            step = self._mgr.latest_step()
        # eval_shape templates (abstract_state) carry no sharding; orbax
        # requires a concrete one — default to single-device placement.
        default = jax.sharding.SingleDeviceSharding(jax.devices()[0])

        def to_abstract(x):
            s = ocp.utils.to_shape_dtype_struct(x)
            if getattr(s, "sharding", None) is None:
                s = jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=default)
            return s

        abstract = jax.tree.map(to_abstract, state_like)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def latest_step(self) -> int | None:
        """Newest step on disk, or None if the directory holds no checkpoints."""
        return self._mgr.latest_step()

    def wait_until_finished(self) -> None:
        """Block until all pending async saves are durable."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        """Flush pending saves and release the underlying orbax manager."""
        self._mgr.close()
