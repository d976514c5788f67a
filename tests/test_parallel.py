"""Distributed tests without a cluster (SURVEY.md §4.4).

8 virtual CPU devices (conftest). The invariant: a data-parallel step over
the mesh is numerically equivalent to the single-device step on the
concatenated batch, because losses are batch means and XLA's inserted psum
implements exactly that mean.
"""

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.config import TINY, PipelineConfig, TrainConfig
from music_synthesis_tpu.parallel.dp import make_dp_stage1_step, make_dp_stage2_step
from music_synthesis_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from music_synthesis_tpu.train import stage1, stage2

KEY = jax.random.PRNGKey(7)

CFG = PipelineConfig(
    frontend=TINY.frontend,
    specgan=TINY.specgan,
    vocoder=TINY.vocoder,
    msd=TINY.msd,
    mrd=TINY.mrd,
    stft_loss=TINY.stft_loss,
    infer=TINY.infer,
    train=TrainConfig(
        batch_size=8, segment_length=2048, mesh_shape=(8,), mesh_axes=("data",)
    ),
)


def test_mesh_has_8_devices():
    mesh = make_mesh((8,), ("data",))
    assert mesh.devices.size == 8


def test_dp_stage2_matches_single_device():
    mesh = make_mesh((8,), ("data",))
    wav = 0.5 * jnp.tanh(jax.random.normal(jax.random.PRNGKey(1), (8, 2048)))

    ref_state = stage2.make_train_state(CFG, KEY)
    ref_state, ref_metrics = stage2.train_step(CFG, ref_state, wav)

    dp_state = replicate_state(stage2.make_train_state(CFG, KEY), mesh)
    dp_step = make_dp_stage2_step(CFG, mesh)
    dp_state, dp_metrics = dp_step(dp_state, shard_batch(wav, mesh))

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(ref_metrics[k]), float(dp_metrics[k]), rtol=2e-4, atol=1e-5
        )
    ref_leaves = jax.tree.leaves(ref_state.g_params)
    dp_leaves = jax.tree.leaves(dp_state.g_params)
    for a, b in zip(ref_leaves, dp_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )


def test_dp_stage1_matches_single_device():
    mesh = make_mesh((8,), ("data",))
    mel = jax.random.uniform(
        jax.random.PRNGKey(2),
        (8, CFG.specgan.n_frames, CFG.specgan.n_mels),
        minval=-1.0, maxval=1.0,
    )
    ref_state = stage1.make_train_state(CFG, KEY)
    ref_state, ref_metrics = stage1.train_step(CFG, ref_state, mel)

    dp_state = replicate_state(stage1.make_train_state(CFG, KEY), mesh)
    dp_step = make_dp_stage1_step(CFG, mesh)
    dp_state, dp_metrics = dp_step(dp_state, shard_batch(mel, mesh))

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(ref_metrics[k]), float(dp_metrics[k]), rtol=2e-4, atol=1e-5
        )
