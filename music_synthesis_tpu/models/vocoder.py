"""Stage-2 conditioned waveform vocoder (SURVEY.md C8, P:5-9).

MelGAN-family generator: mel ``[B, T, M]`` -> waveform ``[B, T*256]`` via a
transposed-conv1d upsampling stack (factors 8-8-2-2 = 256 = front-end hop)
with dilated residual blocks (dilations 1, 3, 9) between upsampling stages,
weight norm throughout, tanh output.

TPU notes: channel-last layout so every conv lowers onto the MXU; fully
convolutional, so the model is length-polymorphic — chunked inference picks a
static chunk length per compiled program (SURVEY.md §5.7).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from music_synthesis_tpu.config import VocoderConfig
from music_synthesis_tpu.ops.conv import WNConv, WNConvTranspose1d

__all__ = ["ResidualStack", "Vocoder"]


class ResidualBlock(nn.Module):
    """leaky -> dilated 3x conv -> leaky -> 1x conv, plus 1x-conv shortcut."""

    channels: int
    dilation: int
    kernel: int = 3
    leaky_slope: float = 0.2
    use_weight_norm: bool = True
    compute_dtype: str = "float32"
    init_scheme: str = "dcgan"
    res_init_gain: float = 1.0  # init-std multiplier on the branch output

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.leaky_relu(x, self.leaky_slope)
        y = WNConv(
            self.channels, (self.kernel,), dilations=(self.dilation,),
            padding="reflect", use_weight_norm=self.use_weight_norm,
            compute_dtype=self.compute_dtype,
            init_scheme=self.init_scheme, name="dilated",
        )(y)
        y = nn.leaky_relu(y, self.leaky_slope)
        y = WNConv(
            self.channels, (1,), use_weight_norm=self.use_weight_norm,
            compute_dtype=self.compute_dtype,
            init_scheme=self.init_scheme,
            init_gain=self.res_init_gain, name="pointwise",
        )(y)
        shortcut = WNConv(
            self.channels, (1,), use_weight_norm=self.use_weight_norm,
            compute_dtype=self.compute_dtype,
            init_scheme=self.init_scheme, name="shortcut",
        )(x)
        return shortcut + y


class ResidualStack(nn.Module):
    """Stack of residual blocks with increasing dilation (1, 3, 9, ...)."""

    channels: int
    dilations: tuple[int, ...] = (1, 3, 9)
    kernel: int = 3
    leaky_slope: float = 0.2
    use_weight_norm: bool = True
    compute_dtype: str = "float32"
    init_scheme: str = "dcgan"
    res_init_gain: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for d in self.dilations:
            x = ResidualBlock(
                self.channels, d, self.kernel, self.leaky_slope,
                self.use_weight_norm, self.compute_dtype,
                self.init_scheme, self.res_init_gain, name=f"block_d{d}",
            )(x)
        return x


class Vocoder(nn.Module):
    """mel ``[B, T, n_mels]`` -> waveform ``[B, T * prod(upsample_factors)]``."""

    cfg: VocoderConfig = VocoderConfig()

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        cfg = self.cfg
        x = WNConv(
            cfg.base_channels, (cfg.input_kernel,), padding="reflect",
            use_weight_norm=cfg.use_weight_norm,
            compute_dtype=cfg.compute_dtype,
            init_scheme=cfg.init_scheme, name="conv_in",
        )(mel)
        channels = cfg.base_channels
        for i, u in enumerate(cfg.upsample_factors):
            channels //= 2
            x = nn.leaky_relu(x, cfg.leaky_slope)
            if cfg.upsample_mode == "transpose":
                x = WNConvTranspose1d(
                    channels, kernel_size=2 * u, stride=u,
                    use_weight_norm=cfg.use_weight_norm,
                    compute_dtype=cfg.compute_dtype,
                    init_scheme=cfg.init_scheme, name=f"upsample_{i}",
                )(x)
            elif cfg.upsample_mode == "repeat":
                x = jnp.repeat(x, u, axis=1)
                x = WNConv(
                    channels, (2 * u + 1,), padding="reflect",
                    use_weight_norm=cfg.use_weight_norm,
                    compute_dtype=cfg.compute_dtype,
                    init_scheme=cfg.init_scheme, name=f"upsample_{i}",
                )(x)
            else:
                raise ValueError(f"unknown upsample_mode {cfg.upsample_mode}")
            x = ResidualStack(
                channels, cfg.res_dilations, cfg.res_kernel,
                cfg.leaky_slope, cfg.use_weight_norm, cfg.compute_dtype,
                cfg.init_scheme, cfg.res_init_gain, name=f"res_{i}",
            )(x)
        x = nn.leaky_relu(x, cfg.leaky_slope)
        if cfg.head == "istft":
            # iSTFTNet-style head (PAPERS.md): predict log-magnitude and
            # phase at the pre-upsampled rate, synthesize via inverse STFT
            # expressed as a GEMM. Avoids the lane-starved final upsampling
            # stages entirely.
            from music_synthesis_tpu.ops.istft import istft_synthesis

            n_bins = cfg.istft_n_fft // 2 + 1
            spec = WNConv(
                2 * n_bins, (cfg.output_kernel,), padding="reflect",
                use_weight_norm=cfg.use_weight_norm,
                compute_dtype=cfg.compute_dtype,
                init_scheme=cfg.init_scheme,
                init_gain=cfg.out_init_gain, name="conv_out",
            )(x).astype(jnp.float32)
            log_mag, phase = spec[..., :n_bins], spec[..., n_bins:]
            # Soft-bounded magnitude: exp saturating at e^2 per bin keeps the
            # head expressive while preventing early-training blow-ups.
            mag = jnp.exp(2.0 * jnp.tanh(log_mag))
            wav = istft_synthesis(
                mag * jnp.cos(phase), mag * jnp.sin(phase),
                cfg.istft_n_fft, cfg.istft_hop,
            )
            # tanh, not clip: a hard clip zeroes gradients once saturated
            # (observed killing the generator mid-training); tanh matches the
            # waveform head's output bound and keeps gradients alive.
            return jnp.tanh(wav)
        x = WNConv(
            1, (cfg.output_kernel,), padding="reflect",
            use_weight_norm=cfg.use_weight_norm,
            compute_dtype=cfg.compute_dtype,
            init_scheme=cfg.init_scheme,
            init_gain=cfg.out_init_gain, name="conv_out",
        )(x)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]
