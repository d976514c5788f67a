"""shard_map DP + sequence-sharded vocoding tests (SURVEY.md §5.7, §5.8)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.config import TINY, PipelineConfig, TrainConfig
from music_synthesis_tpu.models.vocoder import Vocoder
from music_synthesis_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from music_synthesis_tpu.parallel.seqshard import (
    make_seqshard_vocode,
    receptive_field_frames,
)
from music_synthesis_tpu.parallel.shard_map_dp import (
    make_shardmap_stage1_step,
    make_shardmap_stage2_step,
)
from music_synthesis_tpu.train import stage1, stage2

KEY = jax.random.PRNGKey(3)

CFG = PipelineConfig(
    frontend=TINY.frontend,
    specgan=TINY.specgan,
    vocoder=TINY.vocoder,
    msd=TINY.msd,
    mrd=TINY.mrd,
    stft_loss=TINY.stft_loss,
    infer=TINY.infer,
    train=TrainConfig(batch_size=8, segment_length=2048, mesh_shape=(8,)),
)


@pytest.mark.slow
def test_shardmap_stage2_matches_single_device():
    """Explicit-pmean DP == single-device step (stage 2 has no rng)."""
    mesh = make_mesh((8,), ("data",))
    wav = 0.5 * jnp.tanh(jax.random.normal(jax.random.PRNGKey(1), (8, 2048)))

    ref_state = stage2.make_train_state(CFG, KEY)
    ref_state, ref_metrics = stage2.train_step(CFG, ref_state, wav)

    sm_state = replicate_state(stage2.make_train_state(CFG, KEY), mesh)
    sm_step = make_shardmap_stage2_step(CFG, mesh)
    sm_state, sm_metrics = sm_step(sm_state, shard_batch(wav, mesh))

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(ref_metrics[k]), float(sm_metrics[k]), rtol=2e-4, atol=1e-5
        )
    for a, b in zip(
        jax.tree.leaves(ref_state.g_params), jax.tree.leaves(sm_state.g_params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )


def test_shardmap_stage1_runs_decorrelated():
    """Stage-1 shard_map step executes; per-device z decorrelated by design."""
    mesh = make_mesh((8,), ("data",))
    mel = jax.random.uniform(
        jax.random.PRNGKey(2), (8, CFG.specgan.n_frames, CFG.specgan.n_mels),
        minval=-1.0, maxval=1.0,
    )
    state = replicate_state(stage1.make_train_state(CFG, KEY), mesh)
    step = make_shardmap_stage1_step(CFG, mesh)
    state, metrics = step(state, shard_batch(mel, mesh))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert int(state.step) == 1


def test_shardmap_stage1_instance_noise_decorrelated():
    """With d_input_noise > 0 the noise key must fold in the device index
    (state.rng is replicated under shard_map), exactly like the latent key
    — regression for the advisor round-3 finding. Structural check: the
    traced program folds axis_index twice (latents AND noise), and the step
    still runs finite."""
    import dataclasses

    noisy = dataclasses.replace(
        CFG, train=dataclasses.replace(
            CFG.train, d_input_noise=0.2, d_noise_decay_steps=0))
    mesh = make_mesh((8,), ("data",))
    mel = jax.random.uniform(
        jax.random.PRNGKey(2), (8, CFG.specgan.n_frames, CFG.specgan.n_mels),
        minval=-1.0, maxval=1.0,
    )
    state = replicate_state(stage1.make_train_state(noisy, KEY), mesh)
    step = make_shardmap_stage1_step(noisy, mesh)
    jaxpr_text = str(jax.make_jaxpr(step)(state, shard_batch(mel, mesh)))
    assert jaxpr_text.count("axis_index") >= 2, (
        "instance-noise key not decorrelated per device")
    state, metrics = step(state, shard_batch(mel, mesh))
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_shardmap_stage1_latents_decorrelated_semantics():
    """The per-device latent draw really is decorrelated AND reproducible:
    each device's z matches the manual fold_in(axis_index) reference and all
    device shards are pairwise distinct."""
    from music_synthesis_tpu.parallel.shard_map_dp import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh((8,), ("data",))
    rng = jax.random.PRNGKey(7)

    def body(r):
        _, z = stage1.draw_latents(r, 1, CFG, axis_name="data")
        return z

    sm = shard_map(body, mesh=mesh, in_specs=P(), out_specs=P("data"))
    z = np.asarray(sm(rng))  # [8, latent_dim], one row per device
    # Exact reference: split once, fold in the device index.
    _, zk = jax.random.split(rng)
    for i in range(8):
        ref = jax.random.normal(
            jax.random.fold_in(zk, i), (1, CFG.specgan.latent_dim)
        )
        np.testing.assert_array_equal(z[i], np.asarray(ref)[0])
    # Pairwise distinct across devices.
    for i in range(8):
        for j in range(i + 1, 8):
            assert np.abs(z[i] - z[j]).max() > 1e-3, (i, j)


def test_receptive_field_reasonable():
    rf = receptive_field_frames(TINY.vocoder)
    assert 4 <= rf <= 16


def test_seqshard_vocode_matches_direct_interior():
    """Halo-exchange sharded vocoding == full vocoding in the interior."""
    mesh = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    voc = Vocoder(TINY.vocoder)
    mel = jax.random.normal(KEY, (2, 64, TINY.vocoder.n_mels))
    params = voc.init(jax.random.PRNGKey(0), mel)["params"]
    direct = np.asarray(voc.apply({"params": params}, mel))

    fn = make_seqshard_vocode(voc, mesh)
    sharded = np.asarray(fn(params, mel))
    assert sharded.shape == direct.shape
    hop = TINY.vocoder.hop_length
    rf = receptive_field_frames(TINY.vocoder) + 2
    # Interior: away from the two global edges by one halo.
    mid = slice(rf * hop, -rf * hop)
    np.testing.assert_allclose(sharded[:, mid], direct[:, mid], atol=2e-5)

@pytest.mark.slow
def test_shardmap_stage2_many_matches_chained_single_device():
    """K-step dispatch chain under shard_map DP: the scanned program must
    reproduce the per-step shard_map trajectory exactly, and the
    single-device trajectory up to the known DP grad-norm diagnostic
    deviation (DESIGN.md §22).

    Measured while writing this test: at step 2 BOTH shard_map paths
    (per-step and scanned) report g_grad_norm 2.3% off the single-device
    value — the documented DP spectral-convergence gradient-scale
    approximation; losses match to 4e-7 and params to 5e-7. Grad/update
    norms are therefore compared between the two shard_map paths (same
    approximation, must agree), not against single-device.
    """
    from music_synthesis_tpu.parallel.mesh import shard_chunk
    from music_synthesis_tpu.parallel.shard_map_dp import (
        make_shardmap_stage2_many,
    )

    mesh = make_mesh((8,), ("data",))
    k = 2
    wavs = 0.5 * jnp.tanh(
        jax.random.normal(jax.random.PRNGKey(1), (k, 8, 2048)))

    ref_state = stage2.make_train_state(CFG, KEY)
    for i in range(k):
        ref_state, ref_metrics = stage2.train_step(CFG, ref_state, wavs[i])

    ps_state = replicate_state(stage2.make_train_state(CFG, KEY), mesh)
    ps_step = make_shardmap_stage2_step(CFG, mesh)
    for i in range(k):
        ps_state, ps_metrics = ps_step(ps_state, shard_batch(wavs[i], mesh))

    sm_state = replicate_state(stage2.make_train_state(CFG, KEY), mesh)
    sm_step = make_shardmap_stage2_many(CFG, mesh)
    sm_state, sm_metrics = sm_step(sm_state, shard_chunk(wavs, mesh))

    norms = {"d_grad_norm", "g_grad_norm", "d_update_norm", "g_update_norm"}
    for key in ref_metrics:
        # scanned DP == per-step DP (same program semantics, all metrics)
        np.testing.assert_allclose(
            float(ps_metrics[key]), float(sm_metrics[key]),
            rtol=2e-4, atol=1e-5, err_msg=key)
        if key not in norms:
            # DP == single-device on every loss/ratio metric
            np.testing.assert_allclose(
                float(ref_metrics[key]), float(sm_metrics[key]),
                rtol=2e-4, atol=1e-5, err_msg=key)
    for a, b in zip(
        jax.tree.leaves(ref_state.g_params),
        jax.tree.leaves(sm_state.g_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)
