"""Stage-1 spectrogram GAN training (SURVEY.md C14, §3.3; BASELINE.json:8).

Alternating hinge-loss updates for the low-resolution spectrogram generator
("composer") against the spectrogram discriminator, over real normalized
log-mel patches. Same one-jit two-optimizer structure as stage 2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from music_synthesis_tpu.config import PipelineConfig
from music_synthesis_tpu.losses.gan import (
    feature_matching_loss,
    d_loss_fn as _d_loss_fn,
    g_loss_fn as _g_loss_fn,
    hinge_d_loss,
    hinge_g_loss,
)
from music_synthesis_tpu.models.specgan import (
    SpectrogramDiscriminator,
    SpectrogramGenerator,
)
from music_synthesis_tpu.train.state import GANState, make_optimizer

__all__ = [
    "make_models", "make_train_state", "train_step", "train_step_impl",
    "forward_and_loss", "draw_latents",
]


def make_models(cfg: PipelineConfig):
    """Instantiate the stage-1 composer G/D pair from config (C6, C7)."""
    return SpectrogramGenerator(cfg.specgan), SpectrogramDiscriminator(cfg.specgan)


def make_train_state(cfg: PipelineConfig, rng: jax.Array) -> GANState:
    """Initialize params + both Adam optimizer states for stage 1."""
    gen, disc = make_models(cfg)
    s = cfg.specgan
    rng, gk, dk = jax.random.split(rng, 3)
    z = jnp.zeros((1, s.latent_dim), jnp.float32)
    g_params = gen.init(gk, z)["params"]
    mel = jnp.zeros((1, s.n_frames, s.n_mels), jnp.float32)
    d_params = disc.init(dk, mel)["params"]
    t = cfg.train
    g_tx = make_optimizer(t.g_lr, t)
    d_tx = make_optimizer(t.d_lr, t)
    return GANState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        rng=rng,
        # Fresh buffers, not aliases: the jitted step donates the state, and
        # aliased g_params/g_ema leaves would be donated twice.
        g_ema=jax.tree.map(jnp.copy, g_params) if t.ema_decay > 0 else None,
    )


def draw_latents(
    rng: jax.Array,
    n: int,
    cfg: PipelineConfig,
    axis_name: str | None = None,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """(new_rng, z ``[n, latent_dim]``) for one step's generator draw.

    Under shard_map (``axis_name`` set) the device's mesh index is folded
    into the key, so each device draws an independent latent shard — the
    global batch sees B distinct latents, not N copies of the same B/N
    (tested in tests/test_shard_map.py).
    """
    rng, zk = jax.random.split(rng)
    if axis_name:
        zk = jax.random.fold_in(zk, jax.lax.axis_index(axis_name))
    z = jax.random.normal(zk, (n, cfg.specgan.latent_dim), dtype)
    return rng, z


@functools.partial(jax.jit, static_argnums=0)
def forward_and_loss(
    cfg: PipelineConfig, state: GANState, real_mel: jax.Array, z: jax.Array
) -> dict[str, jax.Array]:
    """Judged scenario 2 (BASELINE.json:8): G forward + hinge losses, no update."""
    gen, disc = make_models(cfg)
    fake = gen.apply({"params": state.g_params}, z)
    real_logit, _ = disc.apply({"params": state.d_params}, real_mel)
    fake_logit, _ = disc.apply({"params": state.d_params}, fake)
    return {
        "d_loss": hinge_d_loss(real_logit, fake_logit),
        "g_loss": hinge_g_loss(fake_logit),
    }


def train_step_impl(
    cfg: PipelineConfig,
    state: GANState,
    real_mel: jax.Array,
    axis_name: str | None = None,
) -> tuple[GANState, dict[str, jax.Array]]:
    """One alternating D/G update on normalized log-mel patches ``[B, T, M]``.

    ``axis_name``: mesh axis for explicit DP collectives under shard_map
    (grad/metric pmean; the latent draw is decorrelated per device by
    folding the axis index into the rng). None under plain jit / pjit.
    """
    gen, disc = make_models(cfg)
    t = cfg.train
    g_tx = make_optimizer(t.g_lr, t)
    d_tx = make_optimizer(t.d_lr, t)

    def pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name else x

    rng, z = draw_latents(
        state.rng, real_mel.shape[0], cfg, axis_name, real_mel.dtype
    )
    with jax.named_scope("generator_fwd"):
        fake = gen.apply({"params": state.g_params}, z)
    fake_sg = jax.lax.stop_gradient(fake)

    # Instance noise (see TrainConfig.d_input_noise). Fresh draws per step;
    # state.rng is replicated under shard_map, so the noise key must fold
    # in the axis index itself (mirrors stage2.py) — each device then adds
    # an independent noise realization to its batch shard.
    # Optional linear decay traced on state.step (one compiled program).
    d_real_in, d_fake_in, d_fake_g_in = real_mel, fake_sg, None
    if t.d_input_noise > 0:
        rng, nk = jax.random.split(rng)
        if axis_name:
            nk = jax.random.fold_in(nk, jax.lax.axis_index(axis_name))
        k1, k2, k3 = jax.random.split(nk, 3)
        s_ = jnp.asarray(t.d_input_noise, real_mel.dtype)
        if t.d_noise_decay_steps > 0:
            frac = state.step.astype(real_mel.dtype) / t.d_noise_decay_steps
            s_ = s_ * jnp.maximum(0.0, 1.0 - frac)
        d_real_in = real_mel + s_ * jax.random.normal(
            k1, real_mel.shape, real_mel.dtype)
        d_fake_in = fake_sg + s_ * jax.random.normal(
            k2, fake_sg.shape, fake_sg.dtype)
        d_fake_g_in = s_ * jax.random.normal(k3, fake_sg.shape, fake_sg.dtype)

    def d_loss_fn(d_params):
        with jax.named_scope("disc_real"):
            real_logit, real_feats = disc.apply({"params": d_params}, d_real_in)
        with jax.named_scope("disc_fake"):
            fake_logit, _ = disc.apply({"params": d_params}, d_fake_in)
        loss = _d_loss_fn(t.gan_loss)(real_logit, fake_logit)
        r1 = jnp.zeros((), jnp.float32)
        if t.r1_gamma > 0:
            # R1 gradient penalty (TrainConfig.r1_gamma): penalize
            # ||grad_x D(x)||^2 on the real batch. Batch elements are
            # independent, so grad of the summed logits gives per-sample
            # input gradients in one backward pass; the double backprop
            # through D is plain JAX higher-order AD inside the same jit.
            with jax.named_scope("r1_penalty"):
                def logit_sum(x):
                    logit, _ = disc.apply({"params": d_params}, x)
                    return jnp.sum(logit)

                gx = jax.grad(logit_sum)(d_real_in)
                per_sample = jnp.sum(
                    jnp.square(gx.astype(jnp.float32)),
                    axis=tuple(range(1, gx.ndim)),
                )
                r1 = 0.5 * t.r1_gamma * jnp.mean(per_sample)
            loss = loss + r1
        return loss, (real_feats, r1)

    with jax.named_scope("d_step"):
        (d_loss, (real_feats_d, r1_val)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params)
        d_grads = pmean(d_grads)
        d_grad_norm = optax.global_norm(d_grads)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_update_norm = optax.global_norm(d_updates)
        d_params = optax.apply_updates(state.d_params, d_updates)
    real_feats_d = jax.lax.stop_gradient(real_feats_d)

    def g_loss_fn(g_params):
        with jax.named_scope("generator_fwd_g"):
            fake_g = gen.apply({"params": g_params}, z)
        if d_fake_g_in is not None:
            fake_g_in = fake_g + d_fake_g_in  # same noise realization; grads flow
        else:
            fake_g_in = fake_g
        with jax.named_scope("disc_fake_g"):
            fake_logit, fake_feats = disc.apply({"params": d_params}, fake_g_in)
        if t.reuse_real_features and t.d_input_noise == 0:
            real_feats = real_feats_d
        else:
            # Feature-matching target uses CLEAN real features: classic
            # instance noise perturbs only the classification pathway, and a
            # noised FM target would add an irreducible noise floor scaled
            # by lambda_feature_matching (round-2 advisor finding). With
            # noise on, the reuse path is also bypassed (its cached features
            # were computed on the noised batch).
            with jax.named_scope("disc_real_g"):
                _, real_feats = disc.apply({"params": d_params}, real_mel)
        with jax.named_scope("losses"):
            adv = _g_loss_fn(t.gan_loss)(fake_logit)
            fm = feature_matching_loss(real_feats, fake_feats)
            loss = adv + t.lambda_feature_matching * fm
            aux = {"g_adv": adv, "g_fm": fm}
            if t.lambda_flux > 0:
                # Temporal-texture matching (TrainConfig.lambda_flux).
                # Profiles are pmean'd under DP before the L1, so the term
                # equals the global-batch computation exactly (pmean is
                # linear; its gradient under shard_map is pmean).
                def flux_profile(x):
                    return jnp.mean(jnp.abs(jnp.diff(x, axis=1)), axis=(0, 1))

                pf = pmean(flux_profile(fake_g))
                pr = pmean(flux_profile(
                    jax.lax.stop_gradient(real_mel)))
                flux = jnp.mean(jnp.abs(pf - pr))
                loss = loss + t.lambda_flux * flux
                aux["g_flux"] = flux
        return loss, aux

    with jax.named_scope("g_step"):
        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params
        )
        g_grads = pmean(g_grads)
        g_grad_norm = optax.global_norm(g_grads)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_update_norm = optax.global_norm(g_updates)
        g_params = optax.apply_updates(state.g_params, g_updates)

    g_ema = state.g_ema
    if t.ema_decay > 0:
        with jax.named_scope("ema"):
            g_ema = jax.tree.map(
                lambda e, p: t.ema_decay * e + (1.0 - t.ema_decay) * p,
                state.g_ema, g_params,
            )

    new_state = GANState(
        step=state.step + 1,
        g_params=g_params,
        d_params=d_params,
        g_opt=g_opt,
        d_opt=d_opt,
        rng=rng,
        g_ema=g_ema,
    )
    # Amplitude health in normalized mel space (docs/DESIGN.md §8).
    rms_ratio = jnp.sqrt(
        (jnp.mean(jnp.square(fake)) + 1e-12)
        / (jnp.mean(jnp.square(real_mel)) + 1e-12)
    )
    metrics = pmean(
        {"d_loss": d_loss, "g_loss": g_loss, "g_rms_ratio": rms_ratio, **aux}
    )
    if t.r1_gamma > 0:
        metrics["d_r1"] = pmean(r1_val)
    metrics["d_grad_norm"] = d_grad_norm
    metrics["g_grad_norm"] = g_grad_norm
    metrics["d_update_norm"] = d_update_norm
    metrics["g_update_norm"] = g_update_norm
    return new_state, metrics


train_step = jax.jit(train_step_impl, static_argnums=0, donate_argnums=1)
