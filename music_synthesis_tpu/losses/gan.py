"""Hinge GAN + feature-matching losses (SURVEY.md C11, C12).

Discriminators in this framework return ``(logits, features)`` per head where
``features`` is the list of intermediate activations; multi-head
discriminators return lists of those. These losses consume that pytree shape
directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "hinge_d_loss",
    "hinge_g_loss",
    "nonsat_d_loss",
    "nonsat_g_loss",
    "d_loss_fn",
    "g_loss_fn",
    "feature_matching_loss",
]


def hinge_d_loss(real_logits, fake_logits) -> jax.Array:
    """Discriminator hinge loss summed over heads.

    D: mean(relu(1 - D(x))) + mean(relu(1 + D(G(z)))) per head.
    Accepts a single logit array or a list of them.
    """
    if not isinstance(real_logits, (list, tuple)):
        real_logits, fake_logits = [real_logits], [fake_logits]
    loss = 0.0
    for r, f in zip(real_logits, fake_logits):
        loss = loss + jnp.mean(jax.nn.relu(1.0 - r)) + jnp.mean(jax.nn.relu(1.0 + f))
    return loss


def hinge_g_loss(fake_logits) -> jax.Array:
    """Generator hinge loss: -mean(D(G(z))) summed over heads."""
    if not isinstance(fake_logits, (list, tuple)):
        fake_logits = [fake_logits]
    loss = 0.0
    for f in fake_logits:
        loss = loss - jnp.mean(f)
    return loss


def nonsat_d_loss(real_logits, fake_logits) -> jax.Array:
    """Non-saturating logistic D loss (StyleGAN family), summed over heads:
    ``mean(softplus(-D(x))) + mean(softplus(D(G(z))))``.

    Unlike hinge, softplus has no flat region — D keeps a nonzero gradient
    even when it classifies every sample with margin. Measured motivation:
    a 50k-step stage-1 hinge run froze COMPLETELY at ~2.4k steps (both
    update norms exactly 0 — D satisfied every margin while G's saturated
    tanh zeroed its own gradients; runs/stage1_frozen_aborted)."""
    if not isinstance(real_logits, (list, tuple)):
        real_logits, fake_logits = [real_logits], [fake_logits]
    loss = 0.0
    for r, f in zip(real_logits, fake_logits):
        loss = loss + jnp.mean(jax.nn.softplus(-r)) + jnp.mean(
            jax.nn.softplus(f)
        )
    return loss


def nonsat_g_loss(fake_logits) -> jax.Array:
    """Non-saturating logistic G loss: ``mean(softplus(-D(G(z))))``."""
    if not isinstance(fake_logits, (list, tuple)):
        fake_logits = [fake_logits]
    loss = 0.0
    for f in fake_logits:
        loss = loss + jnp.mean(jax.nn.softplus(-f))
    return loss


def d_loss_fn(kind: str):
    """'hinge' (MelGAN-family default) or 'nonsat' (logistic, no flat
    regions)."""
    return {"hinge": hinge_d_loss, "nonsat": nonsat_d_loss}[kind]


def g_loss_fn(kind: str):
    """Generator-loss selector matching :func:`d_loss_fn`'s ``kind``."""
    return {"hinge": hinge_g_loss, "nonsat": nonsat_g_loss}[kind]


def feature_matching_loss(real_features, fake_features) -> jax.Array:
    """L1 between D's intermediate features on real vs fake, per layer/head.

    ``real_features``/``fake_features``: list (heads) of list (layers) of
    arrays, or a single list of arrays. Real features carry stop_gradient so
    this loss trains only the generator (SURVEY.md §7 hard part #3).
    """
    if real_features and not isinstance(real_features[0], (list, tuple)):
        real_features, fake_features = [real_features], [fake_features]
    loss = 0.0
    n = 0
    for r_head, f_head in zip(real_features, fake_features):
        for r, f in zip(r_head, f_head):
            loss = loss + jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
            n += 1
    return loss / max(n, 1)
