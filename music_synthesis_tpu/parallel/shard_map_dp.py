"""Explicit-collective data parallelism via shard_map (SURVEY.md §5.8).

Alternative to ``parallel.dp`` (jit + sharding annotations): the train step
runs per-device on the local batch shard inside ``jax.shard_map``, with
gradient/metric averaging as explicit ``lax.pmean`` over the 'data' axis
(lowered to a psum on ICI). Two reasons to use this path:

* Pallas kernels (the fused front-end) execute per-device inside shard_map
  without needing a custom-call partitioning rule, so
  ``use_pallas_frontend`` works in the DP step here.
* The collective schedule is explicit and auditable in the HLO.

For stage 2 (no rng in the step) this is numerically equivalent to the
jit-sharded DP step and the single-device step (tested): batch-mean losses
are exact under grad-pmean, and the nonlinear spectral-convergence term is
computed from psum'd squared norms with a gradient-scale correction
(losses/stft_loss.py) so it is the exact global-batch value too. For stage 1
the latent draw is decorrelated per device via axis-index folding, which is
the *better* sampling scheme but not bit-identical to single-device batches.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P

from music_synthesis_tpu.config import PipelineConfig
from music_synthesis_tpu.train import stage1, stage2

try:  # JAX >= 0.4.35 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["make_shardmap_stage2_step", "make_shardmap_stage1_step",
           "make_shardmap_stage2_many"]


def _make(step_impl: Callable, cfg: PipelineConfig, mesh: Mesh,
          axis: str = "data") -> Callable:
    per_device = functools.partial(step_impl, cfg, axis_name=axis)

    def body(state, batch):
        return per_device(state, batch)

    sm = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sm, donate_argnums=0)


def make_shardmap_stage2_step(cfg: PipelineConfig, mesh: Mesh) -> Callable:
    """(state, wav[B, L]) -> (state, metrics); per-device + explicit pmean."""
    return _make(stage2.train_step_impl, cfg, mesh)


def make_shardmap_stage1_step(cfg: PipelineConfig, mesh: Mesh) -> Callable:
    """Stage-1 twin of :func:`make_shardmap_stage2_step` (mel-batch input)."""
    return _make(stage1.train_step_impl, cfg, mesh)


def make_shardmap_stage2_many(cfg: PipelineConfig, mesh: Mesh,
                              axis: str = "data") -> Callable:
    """(state, wavs[K, B, L]) -> (state, last-step metrics): K exact
    training steps scanned INSIDE the shard_map program, batch dim sharded.

    The distributed twin of ``stage2.train_step_many``: on a real pod the
    per-step host dispatch costs the same round trip the single-chip dev
    tunnel made visible (DESIGN.md §22), so the K-step chain belongs in
    the DP path too. Shard the chunk with ``parallel.mesh.shard_chunk``
    (``P(None, 'data')`` — K replicated, B sharded).
    """
    per_device = functools.partial(stage2.train_step_impl, cfg,
                                   axis_name=axis)

    def body(state, wavs):
        def one(st, wav):
            return per_device(st, wav)

        state, ms = jax.lax.scan(one, state, wavs)
        return state, jax.tree.map(lambda x: x[-1], ms)

    sm = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sm, donate_argnums=0)
