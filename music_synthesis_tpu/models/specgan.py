"""Stage-1 low-resolution spectrogram GAN (SURVEY.md C6, C7).

The "composer": a generator that synthesizes novel low-resolution log-mel
spectrogram patches from latent noise, plus the spectrogram discriminator it
trains against (hinge loss, BASELINE.json:8).

Spectrograms are treated as 1-D sequences over frames with n_mels channels —
``[B, T, M]`` — so the same MXU-friendly conv machinery as the vocoder
applies; the generator upsamples a short latent sequence in time. Outputs are
tanh-bounded in the normalized mel space (config.MelScaler maps to/from real
log-mel units).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from music_synthesis_tpu.config import SpecGANConfig
from music_synthesis_tpu.models.vocoder import ResidualStack
from music_synthesis_tpu.ops.conv import WNConv, WNConvTranspose1d

__all__ = ["SpectrogramGenerator", "SpectrogramDiscriminator"]


class SpectrogramGenerator(nn.Module):
    """z ``[B, latent_dim]`` -> normalized log-mel ``[B, n_frames, n_mels]``."""

    cfg: SpecGANConfig = SpecGANConfig()

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.cfg
        up_total = 1
        for u in cfg.upsample_factors:
            up_total *= u
        assert cfg.initial_frames * up_total == cfg.n_frames, (
            "initial_frames * prod(upsample_factors) must equal n_frames"
        )
        # Latent projection follows the conv init scheme: 'he' =
        # variance_scaling(2, fan_in) so the trunk starts at gain ~1 (the
        # stage-1 saturation cure, docs/DESIGN.md §10); 'dcgan' = N(0, 0.02).
        latent_init = (
            nn.initializers.variance_scaling(2.0, "fan_in", "normal")
            if cfg.init_scheme == "he"
            else nn.initializers.normal(0.02)
        )
        x = nn.Dense(
            cfg.initial_frames * cfg.base_channels,
            kernel_init=latent_init, name="latent_in",
        )(z)
        x = x.reshape(z.shape[0], cfg.initial_frames, cfg.base_channels)
        channels = cfg.base_channels
        for i, u in enumerate(cfg.upsample_factors):
            channels = max(channels // 2, cfg.n_mels)
            x = nn.leaky_relu(x, cfg.leaky_slope)
            x = WNConvTranspose1d(
                channels, kernel_size=2 * u, stride=u,
                use_weight_norm=cfg.use_weight_norm,
                compute_dtype=cfg.compute_dtype,
                init_scheme=cfg.init_scheme, name=f"upsample_{i}",
            )(x)
            x = ResidualStack(
                channels, cfg.res_dilations,
                leaky_slope=cfg.leaky_slope,
                use_weight_norm=cfg.use_weight_norm,
                compute_dtype=cfg.compute_dtype,
                init_scheme=cfg.init_scheme,
                res_init_gain=cfg.res_init_gain, name=f"res_{i}",
            )(x)
        x = nn.leaky_relu(x, cfg.leaky_slope)
        x = WNConv(
            cfg.n_mels, (7,), padding="reflect",
            use_weight_norm=cfg.use_weight_norm,
            compute_dtype=cfg.compute_dtype,
            init_scheme=cfg.init_scheme,
            init_gain=cfg.out_init_gain, name="conv_out",
        )(x)
        return jnp.tanh(cfg.out_temperature * x.astype(jnp.float32))


class SpectrogramDiscriminator(nn.Module):
    """Normalized log-mel ``[B, T, M]`` -> (logit ``[B, T', 1]``, features)."""

    cfg: SpecGANConfig = SpecGANConfig()

    @nn.compact
    def __call__(self, mel: jax.Array):
        cfg = self.cfg
        x = mel
        feats = []
        for i, (ch, s) in enumerate(zip(cfg.disc_channels, cfg.disc_strides)):
            x = WNConv(
                ch, (cfg.disc_kernel,), strides=(s,), padding="same",
                use_weight_norm=cfg.use_weight_norm,
                compute_dtype=cfg.compute_dtype,
                init_scheme=cfg.init_scheme, name=f"down_{i}",
            )(x)
            x = nn.leaky_relu(x, cfg.leaky_slope)
            feats.append(x)
        logit = WNConv(
            1, (3,), padding="same", use_weight_norm=cfg.use_weight_norm,
            compute_dtype=cfg.compute_dtype,
            init_scheme=cfg.init_scheme, name="conv_out",
        )(x)
        return logit.astype(jnp.float32), feats
