"""Latent-path helpers (infer/latent.py): geometry + shape contracts."""

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.infer.latent import latent_path, latent_walk, slerp

KEY = jax.random.PRNGKey(5)


def test_slerp_endpoints_and_norm():
    a = jax.random.normal(KEY, (3, 64))
    b = jax.random.normal(jax.random.PRNGKey(6), (3, 64))
    np.testing.assert_allclose(slerp(a, b, 0.0), a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(slerp(a, b, 1.0), b, rtol=1e-5, atol=1e-6)
    # Midpoint stays on-shell: norm is the mean of the endpoint norms,
    # NOT the collapsed norm a lerp midpoint would have.
    mid = slerp(a, b, 0.5)
    expect = 0.5 * (jnp.linalg.norm(a, axis=-1)
                    + jnp.linalg.norm(b, axis=-1))
    np.testing.assert_allclose(
        jnp.linalg.norm(mid, axis=-1), expect, rtol=1e-4)
    lerp_norm = jnp.linalg.norm(0.5 * (a + b), axis=-1)
    assert (np.asarray(jnp.linalg.norm(mid, axis=-1))
            > np.asarray(lerp_norm)).all()


def test_slerp_parallel_fallback():
    a = jax.random.normal(KEY, (2, 16))
    out = slerp(a, 2.0 * a, 0.5)
    np.testing.assert_allclose(out, 1.5 * a, rtol=1e-4, atol=1e-5)


def test_latent_path_shape_and_monotonic_progress():
    a = jax.random.normal(KEY, (2, 32))
    b = jax.random.normal(jax.random.PRNGKey(7), (2, 32))
    path = latent_path(a, b, 6)
    assert path.shape == (2, 6, 32)
    # Distance to the destination decreases monotonically.
    d = np.linalg.norm(np.asarray(path - b[:, None, :]), axis=-1)
    assert (np.diff(d, axis=1) < 1e-4).all()


def test_latent_walk_smooth_and_on_shell():
    z = latent_walk(KEY, batch=2, n=8, latent_dim=64, step=0.3)
    assert z.shape == (2, 8, 64)
    z = np.asarray(z)
    # Consecutive patches are closer than i.i.d. draws would be
    # (E||g1 - g2|| ~ sqrt(2 * 64) ~ 11.3).
    step_d = np.linalg.norm(np.diff(z, axis=1), axis=-1)
    assert step_d.mean() < 0.7 * np.sqrt(2 * 64)
    assert step_d.mean() > 0.5  # ...but the walk does move
    # Norms stay near the Gaussian shell sqrt(64) = 8.
    norms = np.linalg.norm(z, axis=-1)
    assert 5.0 < norms.mean() < 11.0
