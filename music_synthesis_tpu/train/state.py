"""GAN training state (SURVEY.md C14-C16).

One pytree holds both players' parameters and optimizer states plus step and
rng — the composite orbax checkpoints persist (SURVEY.md §5.4). Model/opt
*definitions* stay outside the pytree (static), so the whole state threads
through a single jitted step with no recompilation.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

from music_synthesis_tpu.config import TrainConfig

__all__ = ["GANState", "make_optimizer"]


class GANState(flax.struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    rng: jax.Array
    # Exponential moving average of g_params (SURVEY.md §5.6, P:5 family
    # practice): None when cfg.train.ema_decay == 0, else a g_params-shaped
    # pytree updated every step and used for inference/audio dumps.
    g_ema: Any = None


def make_optimizer(lr: float, cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam with GAN-friendly betas (0.5, 0.9) — MelGAN-family settings.

    Optional global-norm gradient clipping (cfg.grad_clip_norm > 0) and
    exponential lr decay (cfg.lr_decay_rate < 1, HiFi-GAN-style): measured
    motivation is the constant-lr fidelity drift past ~50k steps
    (docs/DESIGN.md §9 / ROADMAP perf lead 3). The schedule reads the Adam
    step count, so `--resume` continues the decay where it left off.
    """
    if cfg.lr_decay_rate < 1.0:
        sched = optax.exponential_decay(
            init_value=lr,
            transition_steps=max(cfg.lr_decay_every, 1),
            decay_rate=cfg.lr_decay_rate,
        )
        adam = optax.adam(sched, b1=cfg.adam_b1, b2=cfg.adam_b2)
    else:
        adam = optax.adam(lr, b1=cfg.adam_b1, b2=cfg.adam_b2)
    if cfg.grad_clip_norm > 0:
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm), adam
        )
    return adam
