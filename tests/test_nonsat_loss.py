"""Non-saturating logistic GAN loss (TrainConfig.gan_loss='nonsat'):
value/gradient sanity and the no-flat-region property that motivated it
(hinge froze stage-1 completely — losses/gan.py nonsat_d_loss)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.config import TINY
from music_synthesis_tpu.losses.gan import (
    hinge_d_loss,
    nonsat_d_loss,
    nonsat_g_loss,
)
from music_synthesis_tpu.train import stage1

KEY = jax.random.PRNGKey(0)


def test_nonsat_never_flat():
    """Where hinge's gradient is exactly zero (all margins satisfied),
    nonsat still provides gradient to both players."""
    real = jnp.full((4, 1), 5.0)   # D(real) >> 1
    fake = jnp.full((4, 1), -5.0)  # D(fake) << -1
    g_hinge = jax.grad(lambda r: hinge_d_loss(r, fake))(real)
    assert float(jnp.abs(g_hinge).max()) == 0.0  # the freeze mechanism
    g_nonsat = jax.grad(lambda r: nonsat_d_loss(r, fake))(real)
    assert float(jnp.abs(g_nonsat).max()) > 0.0
    g_gen = jax.grad(nonsat_g_loss)(fake)
    assert float(jnp.abs(g_gen).max()) > 0.0


def test_nonsat_values():
    z = jnp.zeros((2, 1))
    # softplus(0) = log 2 per term.
    np.testing.assert_allclose(float(nonsat_d_loss(z, z)),
                               2 * np.log(2), rtol=1e-6)
    np.testing.assert_allclose(float(nonsat_g_loss(z)), np.log(2), rtol=1e-6)
    # Multi-head lists sum.
    np.testing.assert_allclose(float(nonsat_g_loss([z, z])),
                               2 * np.log(2), rtol=1e-6)


def test_stage1_nonsat_trains():
    cfg = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, gan_loss="nonsat")
    )
    state = stage1.make_train_state(cfg, KEY)
    mel = jnp.clip(
        0.5 * jax.random.normal(
            jax.random.fold_in(KEY, 2),
            (cfg.train.batch_size, cfg.specgan.n_frames, cfg.specgan.n_mels),
        ), -1, 1,
    )
    for _ in range(3):
        state, m = stage1.train_step(cfg, state, mel)
    assert np.isfinite(m["d_loss"]) and np.isfinite(m["g_adv"])
    # Neither player is frozen.
    assert m["d_update_norm"] > 0 and m["g_update_norm"] > 0


def test_stage1_instance_noise_path():
    """d_input_noise: step runs, is rng-deterministic, and differs from the
    noiseless step (the noise really reaches D's inputs)."""
    base = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, gan_loss="nonsat")
    )
    noisy = dataclasses.replace(
        base, train=dataclasses.replace(base.train, d_input_noise=0.2)
    )
    mel = jnp.clip(
        0.5 * jax.random.normal(
            jax.random.fold_in(KEY, 3),
            (base.train.batch_size, base.specgan.n_frames, base.specgan.n_mels),
        ), -1, 1,
    )
    s_a = stage1.make_train_state(noisy, KEY)
    s_b = stage1.make_train_state(noisy, KEY)
    s_a, m_a = stage1.train_step(noisy, s_a, mel)
    s_b, m_b = stage1.train_step(noisy, s_b, mel)
    # Deterministic: same state + same batch -> identical metrics.
    assert float(m_a["d_loss"]) == float(m_b["d_loss"])
    s_c = stage1.make_train_state(base, KEY)
    s_c, m_c = stage1.train_step(base, s_c, mel)
    # The noise changes the D objective value.
    assert float(m_a["d_loss"]) != float(m_c["d_loss"])
    assert np.isfinite(m_a["d_loss"])
