"""Stage-2 vocoder GAN training (SURVEY.md C15, §3.2; BASELINE.json:9,11).

One jitted ``train_step`` holds both optimizers: D updates on
stop_gradient(fake) with hinge loss, then G updates against the *updated* D
with hinge + feature-matching + multi-res STFT objectives — alternating G/D
expressed as two grad computations inside a single XLA program (SURVEY.md §7
step 5), so there is exactly one dispatch and one host<->device crossing per
step.

The mel conditioning is computed from the raw waveform batch *inside* the
step by the front-end, so the whole pipeline (features -> G -> D -> losses ->
both optimizers) fuses into one program.
"""

from __future__ import annotations

import functools
from typing import Any

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
from music_synthesis_tpu.losses.phase_loss import phase_coherence_loss
from music_synthesis_tpu.losses.stft_loss import multires_stft_loss
from music_synthesis_tpu.models.discriminators import CombinedDiscriminator
from music_synthesis_tpu.models.vocoder import Vocoder
from music_synthesis_tpu.ops.frontend import log_mel_for_vocoder
from music_synthesis_tpu.train.state import GANState, make_optimizer

__all__ = ["make_models", "make_train_state", "train_step", "train_step_impl",
           "train_step_many", "conditioning_mel"]


def make_models(cfg: PipelineConfig):
    """Instantiate the vocoder G and combined MSD+MRD D from config (C8-C10)."""
    return Vocoder(cfg.vocoder), CombinedDiscriminator(cfg.msd, cfg.mrd)


def conditioning_mel(wav: jax.Array, cfg: PipelineConfig) -> jax.Array:
    """Normalized log-mel conditioning, one frame per hop of audio.

    With cfg.train.use_pallas_frontend (TPU), the fused Pallas kernel
    computes the features; otherwise the pure-JAX oracle. No gradient flows
    into the conditioning, so the kernel needs no VJP here.
    """
    if cfg.train.use_pallas_frontend:
        from music_synthesis_tpu.ops.pallas_frontend import (
            pallas_log_mel_for_vocoder,
        )

        # Mosaic compiles only on TPU; everywhere else (CPU tests, the
        # virtual-mesh dryrun) the kernel runs in interpret mode.
        interpret = jax.default_backend() != "tpu"
        mel = pallas_log_mel_for_vocoder(wav, cfg.frontend, interpret=interpret)
    else:
        mel = log_mel_for_vocoder(wav, cfg.frontend)
    return (mel - cfg.mel_scaler.shift) / cfg.mel_scaler.scale


def make_train_state(cfg: PipelineConfig, rng: jax.Array) -> GANState:
    """Initialize params + both Adam optimizer states for stage 2."""
    gen, disc = make_models(cfg)
    rng, gk, dk = jax.random.split(rng, 3)
    t = cfg.train
    mel = jnp.zeros(
        (1, cfg.train.segment_length // cfg.frontend.hop_length,
         cfg.vocoder.n_mels),
        jnp.float32,
    )
    g_params = gen.init(gk, mel)["params"]
    wav = jnp.zeros((1, cfg.train.segment_length), jnp.float32)
    d_params = disc.init(dk, wav)["params"]
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


def train_step_impl(
    cfg: PipelineConfig,
    state: GANState,
    wav: jax.Array,
    axis_name: str | None = None,
) -> tuple[GANState, dict[str, jax.Array]]:
    """One alternating D/G update on a waveform batch ``[B, L]``.

    ``axis_name``: when running per-device under shard_map, the mesh axis to
    pmean gradients/metrics over (explicit DP collective). Under plain jit or
    jit-with-shardings leave None — XLA derives the reduction from the batch
    sharding.
    """
    gen, disc = make_models(cfg)
    t = cfg.train
    g_tx = make_optimizer(t.g_lr, t)
    d_tx = make_optimizer(t.d_lr, t)

    def pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name else x

    with jax.named_scope("frontend"):
        mel = conditioning_mel(wav, cfg)
    with jax.named_scope("generator_fwd"):
        fake = gen.apply({"params": state.g_params}, mel)
    fake_sg = jax.lax.stop_gradient(fake)

    # Instance noise on D's waveform inputs (TrainConfig.d_input_noise,
    # same schedule as stage 1). Motivated by the iSTFT-head collapse
    # (DESIGN.md §13): noise blurs the head's hop-boundary fingerprint so
    # D cannot reach the perfect-separation boundary. Per-device
    # decorrelation under shard_map via the axis index.
    rng = state.rng
    d_real_in, d_fake_in, d_fake_g_noise = wav, fake_sg, None
    if t.d_input_noise > 0:
        rng, nk = jax.random.split(rng)
        if axis_name:
            nk = jax.random.fold_in(nk, jax.lax.axis_index(axis_name))
        k1, k2, k3 = jax.random.split(nk, 3)
        s_ = jnp.asarray(t.d_input_noise, wav.dtype)
        if t.d_noise_decay_steps > 0:
            frac = state.step.astype(wav.dtype) / t.d_noise_decay_steps
            s_ = s_ * jnp.maximum(0.0, 1.0 - frac)
        d_real_in = wav + s_ * jax.random.normal(k1, wav.shape, wav.dtype)
        d_fake_in = fake_sg + s_ * jax.random.normal(
            k2, fake_sg.shape, fake_sg.dtype)
        d_fake_g_noise = s_ * jax.random.normal(
            k3, fake_sg.shape, fake_sg.dtype)

    # --- D step (on detached fake) ---
    def d_loss_fn(d_params):
        if t.concat_disc_batch:
            # One D forward on [real; fake] (TrainConfig.concat_disc_batch):
            # per-sample math is unchanged, the MXU sees 2B-row GEMMs.
            b = wav.shape[0]
            with jax.named_scope("disc_both"):
                logits, feats = disc.apply(
                    {"params": d_params},
                    jnp.concatenate([d_real_in, d_fake_in], axis=0),
                )
            real_logits = [l[:b] for l in logits]
            fake_logits = [l[b:] for l in logits]
            real_feats = [[f[:b] for f in head] for head in feats]
        else:
            with jax.named_scope("disc_real"):
                real_logits, real_feats = disc.apply(
                    {"params": d_params}, d_real_in)
            with jax.named_scope("disc_fake"):
                fake_logits, _ = disc.apply({"params": d_params}, d_fake_in)
        loss = _d_loss_fn(t.gan_loss)(real_logits, fake_logits)
        r1 = jnp.zeros((), jnp.float32)
        if t.r1_gamma > 0:
            # R1 gradient penalty on D(real) (TrainConfig.r1_gamma), as in
            # stage 1: one extra backward through the full discriminator
            # ensemble; per-sample input gradients via grad of the summed
            # logits (batch elements are independent).
            with jax.named_scope("r1_penalty"):
                def logit_sum(x):
                    ls, _ = disc.apply({"params": d_params}, x)
                    return sum(
                        jnp.sum(l.astype(jnp.float32)) for l in ls)

                gx = jax.grad(logit_sum)(d_real_in)
                per_sample = jnp.sum(
                    jnp.square(gx.astype(jnp.float32)),
                    axis=tuple(range(1, gx.ndim)),
                )
                r1 = 0.5 * t.r1_gamma * jnp.mean(per_sample)
            loss = loss + r1
        return loss, (real_feats, r1)

    # Generator-warmup gate: 1.0 once the adversarial game is on. Traced on
    # state.step so both phases share one compiled program.
    adv_on = (
        (state.step >= t.g_warmup_steps).astype(jnp.float32)
        if t.g_warmup_steps > 0 else None
    )

    with jax.named_scope("d_step"):
        (d_loss, (real_feats_d, r1_val)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params)
        d_grads = pmean(d_grads)
        d_grad_norm = optax.global_norm(d_grads)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        if adv_on is not None:
            # Freeze D during warmup: mask the update and keep the optimizer
            # state, so D's Adam statistics start clean at warmup end.
            d_updates = jax.tree.map(lambda u: adv_on * u, d_updates)
            d_opt = jax.tree.map(
                lambda new, old: jnp.where(adv_on > 0, new, old),
                d_opt, state.d_opt,
            )
        d_update_norm = optax.global_norm(d_updates)  # applied (post-mask)
        d_params = optax.apply_updates(state.d_params, d_updates)
    real_feats_d = jax.lax.stop_gradient(real_feats_d)

    # --- G step (against updated D) ---
    gen_fwd = gen.apply
    if t.remat_generator:
        gen_fwd = jax.checkpoint(gen.apply, static_argnums=())

    def g_loss_fn(g_params):
        with jax.named_scope("generator_fwd_g"):
            fake_g = gen_fwd({"params": g_params}, mel)
        if d_fake_g_noise is not None:
            fake_g_in = fake_g + d_fake_g_noise  # same realization; grads flow
        else:
            fake_g_in = fake_g
        with jax.named_scope("disc_fake_g"):
            fake_logits, fake_feats = disc.apply(
                {"params": d_params}, fake_g_in)
        if t.reuse_real_features and t.d_input_noise == 0:
            # FM target = D(real) taps already computed in the D step
            # (pre-update D). Saves one full D forward per step.
            real_feats = real_feats_d
        else:
            # With instance noise on, the cached taps were computed on the
            # noised batch; the FM target must come from CLEAN real
            # features (round-2 advisor rule, same as stage 1).
            with jax.named_scope("disc_real_g"):
                _, real_feats = disc.apply({"params": d_params}, wav)
        with jax.named_scope("losses"):
            adv = _g_loss_fn(t.gan_loss)(fake_logits)
            fm = feature_matching_loss(real_feats, fake_feats)
            stft = multires_stft_loss(fake_g, wav, cfg.stft_loss, axis_name)
            adv_w = adv_on if adv_on is not None else 1.0
            total = (
                adv_w * (adv + t.lambda_feature_matching * fm)
                + t.lambda_stft * stft
            )
            aux = {"g_adv": adv, "g_fm": fm, "g_stft": stft}
            if t.lambda_energy > 0:
                # Frame-energy L1 (TrainConfig.lambda_energy): hop-sized
                # frame rms in linear amplitude — a direct pull against the
                # measured amplitude sag.
                hop = cfg.frontend.hop_length
                b = wav.shape[0]

                def frame_rms(x):
                    f = x[:, : (x.shape[1] // hop) * hop]
                    f = f.reshape(b, -1, hop)
                    return jnp.sqrt(jnp.mean(jnp.square(f), -1) + 1e-8)

                energy = jnp.mean(
                    jnp.abs(frame_rms(fake_g) - frame_rms(wav)))
                total = total + t.lambda_energy * energy
                aux["g_energy"] = energy
            if t.lambda_phase > 0:
                # Anti-wrapping IF+GD phase pull toward the real batch's
                # phase derivatives (TrainConfig.lambda_phase) — the judged
                # magnitude metric is blind to phase; this term is not.
                ph = phase_coherence_loss(
                    fake_g, wav, t.phase_n_fft, t.phase_hop,
                    axis_name=axis_name,
                )
                total = total + t.lambda_phase * ph
                aux["g_phase"] = ph
        return total, aux

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
    # Amplitude health: a collapsing ratio flags the silent-generator trap
    # (docs/DESIGN.md §8) long before audio dumps would.
    rms_ratio = jnp.sqrt(
        (jnp.mean(jnp.square(fake)) + 1e-12)
        / (jnp.mean(jnp.square(wav)) + 1e-12)
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


def train_step_many_impl(cfg: PipelineConfig, state: GANState, wavs):
    """K chained training steps in ONE dispatch: ``wavs [K, B, L]``.

    Numerically identical to K sequential ``train_step`` calls — every
    schedule (instance-noise decay, G warmup, EMA) reads ``state.step``
    inside the scanned body. Exists because the per-step dispatch through
    the axon tunnel costs ~40 ms of RTT that the chip never sees: the
    round-5 400k flagship run measured 75 ms/wall-step with per-step
    dispatch vs the 32 ms/step the same program sustains inside a scan
    (bench.py methodology). Returns the LAST step's metrics — what a
    per-step loop would log at the same boundary.
    """
    def body(st, wav):
        return train_step_impl(cfg, st, wav)

    state, ms = jax.lax.scan(body, state, wavs)
    return state, jax.tree.map(lambda x: x[-1], ms)


train_step_many = jax.jit(
    train_step_many_impl, static_argnums=0, donate_argnums=1)
