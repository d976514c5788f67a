"""Hinge + feature-matching loss unit tests (SURVEY.md C11, C12)."""

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.losses.gan import (
    feature_matching_loss,
    hinge_d_loss,
    hinge_g_loss,
)


def test_hinge_d_values():
    # Perfect D: real logits >> 1, fake << -1 -> zero loss.
    real = jnp.full((2, 5, 1), 3.0)
    fake = jnp.full((2, 5, 1), -3.0)
    assert float(hinge_d_loss(real, fake)) == 0.0
    # Confused D at 0 logits: relu(1-0) + relu(1+0) = 2.
    zero = jnp.zeros((2, 5, 1))
    np.testing.assert_allclose(float(hinge_d_loss(zero, zero)), 2.0)
    # Multi-head sums.
    np.testing.assert_allclose(
        float(hinge_d_loss([zero, zero], [zero, zero])), 4.0
    )


def test_hinge_g_values():
    fake = jnp.full((2, 5, 1), 2.5)
    np.testing.assert_allclose(float(hinge_g_loss(fake)), -2.5)
    np.testing.assert_allclose(float(hinge_g_loss([fake, fake])), -5.0)


def test_hinge_d_gradient_saturation():
    """No gradient once the margin is satisfied (hinge, not BCE)."""
    g = jax.grad(lambda r: hinge_d_loss(r, -r))(jnp.full((4,), 5.0))
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_feature_matching_is_l1_and_stops_real_grad():
    real = [[jnp.ones((2, 4)), jnp.zeros((2, 4))]]
    fake = [[jnp.zeros((2, 4)), jnp.ones((2, 4))]]
    np.testing.assert_allclose(float(feature_matching_loss(real, fake)), 1.0)

    # Gradient flows to fake, not to real.
    def loss_wrt_real(r):
        return feature_matching_loss([[r]], [[jnp.zeros((2, 4))]])

    g = jax.grad(loss_wrt_real)(jnp.ones((2, 4)))
    np.testing.assert_allclose(np.asarray(g), 0.0)

    def loss_wrt_fake(f):
        return feature_matching_loss([[jnp.ones((2, 4))]], [[f]])

    g = jax.grad(loss_wrt_fake)(jnp.zeros((2, 4)))
    assert np.abs(np.asarray(g)).max() > 0


def test_multihost_batch_slice():
    from music_synthesis_tpu.parallel.multihost import local_batch_slice

    sl = local_batch_slice(64)  # single process -> whole batch
    assert sl == slice(0, 64)


def test_abstract_state_shapes():
    from music_synthesis_tpu.config import TINY
    from music_synthesis_tpu.train import stage2
    from music_synthesis_tpu.train.checkpoint import abstract_state

    abs_state = abstract_state(TINY, stage=2)
    real_state = stage2.make_train_state(TINY, jax.random.PRNGKey(0))
    abs_leaves = jax.tree.leaves(abs_state)
    real_leaves = jax.tree.leaves(real_state)
    assert len(abs_leaves) == len(real_leaves)
    for a, r in zip(abs_leaves, real_leaves):
        assert a.shape == r.shape and a.dtype == r.dtype
