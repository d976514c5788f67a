"""Data-parallel GAN training steps (config 5, BASELINE.json:11).

Wraps the single-device stage-1/stage-2 ``train_step``s with explicit
in/out shardings over a mesh: batch sharded on 'data', state replicated.
Losses are batch means, so XLA lowers the gradient reduction to a psum over
ICI automatically — DP step semantics are *identical* to a single-device
step on the concatenated batch (verified in tests/test_parallel.py).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.sharding import Mesh

from music_synthesis_tpu.config import PipelineConfig
from music_synthesis_tpu.parallel.mesh import batch_sharding, replicated
from music_synthesis_tpu.train import stage1, stage2

__all__ = ["make_dp_step", "make_dp_stage1_step", "make_dp_stage2_step"]


def make_dp_step(
    step_fn: Callable, cfg: PipelineConfig, mesh: Mesh
) -> Callable:
    """jit ``step_fn(cfg, state, batch)`` with DP shardings over ``mesh``."""
    repl = replicated(mesh)
    batch_sh = batch_sharding(mesh)
    return jax.jit(
        functools.partial(step_fn, cfg),
        in_shardings=(repl, batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=0,
    )


def make_dp_stage2_step(cfg: PipelineConfig, mesh: Mesh) -> Callable:
    """(state, wav[B, L]) -> (state, metrics); B sharded over 'data'."""
    return make_dp_step(stage2.train_step_impl, cfg, mesh)


def make_dp_stage1_step(cfg: PipelineConfig, mesh: Mesh) -> Callable:
    """(state, mel[B, T, M]) -> (state, metrics); B sharded over 'data'."""
    return make_dp_step(stage1.train_step_impl, cfg, mesh)
