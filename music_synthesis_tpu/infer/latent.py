"""Latent-space paths for long-form composition (SURVEY.md §1 L5 demo
surface: the reference's notebooks explore the composer's latent space;
this makes the exploration a first-class API).

``generate_long``/``StreamingSynth`` take an arbitrary latent sequence
``[B, N, Z]``; these helpers construct musically-useful sequences:

- ``latent_path(a, b, n)`` — spherical interpolation between two latent
  draws. Gaussian latents live near the radius-sqrt(Z) shell, so slerp
  keeps every intermediate patch on-distribution where lerp would pass
  through a low-norm region the generator never saw.
- ``latent_walk(key, n, step)`` — a smooth random walk: each patch's
  latent is a slerp step toward a fresh draw, giving long-form audio
  that evolves gradually instead of jumping at every patch boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["slerp", "latent_path", "latent_walk"]


def slerp(a: jax.Array, b: jax.Array, t) -> jax.Array:
    """Spherical interpolation along the last axis. ``t`` may be a scalar
    or broadcastable array in [0, 1]."""
    an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    dot = jnp.clip(jnp.sum(an * bn, axis=-1, keepdims=True), -1.0, 1.0)
    omega = jnp.arccos(dot)
    so = jnp.sin(omega)
    t = jnp.asarray(t)
    # Fall back to lerp when the endpoints are (anti)parallel.
    safe = jnp.abs(so) > 1e-6
    w_a = jnp.where(safe, jnp.sin((1.0 - t) * omega) / jnp.where(
        safe, so, 1.0), 1.0 - t)
    w_b = jnp.where(safe, jnp.sin(t * omega) / jnp.where(safe, so, 1.0), t)
    # Interpolate the radius linearly (draws concentrate near sqrt(Z)).
    r_a = jnp.linalg.norm(a, axis=-1, keepdims=True)
    r_b = jnp.linalg.norm(b, axis=-1, keepdims=True)
    r = (1.0 - t) * r_a + t * r_b
    return (w_a * an + w_b * bn) * r


def latent_path(a: jax.Array, b: jax.Array, n: int) -> jax.Array:
    """``[B, Z] x [B, Z] -> [B, n, Z]``: n slerp waypoints from a to b
    inclusive, ready for ``generate_long``."""
    assert n >= 2, "a path needs at least its two endpoints"
    ts = jnp.linspace(0.0, 1.0, n)[None, :, None]
    return slerp(a[:, None, :], b[:, None, :], ts)


def latent_walk(
    key: jax.Array, batch: int, n: int, latent_dim: int,
    step: float = 0.35,
) -> jax.Array:
    """``[B, n, Z]`` smooth random walk: patch i+1 is a ``step``-sized
    slerp from patch i toward a fresh Gaussian draw. step=1 degenerates
    to i.i.d. patches (the default generate_long behavior); small steps
    drift slowly through the space."""
    keys = jax.random.split(key, n)
    z0 = jax.random.normal(keys[0], (batch, latent_dim))

    def body(z, k):
        target = jax.random.normal(k, (batch, latent_dim))
        nxt = slerp(z, target, step)
        return nxt, nxt

    _, rest = jax.lax.scan(body, z0, keys[1:])
    # rest: [n-1, B, Z] -> [B, n-1, Z]
    return jnp.concatenate(
        [z0[:, None, :], jnp.moveaxis(rest, 0, 1)], axis=1)
