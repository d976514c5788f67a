"""Adversarial heads for stage-2 vocoder training (SURVEY.md C9, C10).

* MultiScaleDiscriminator: K structurally identical raw-audio heads at 1x,
  2x, 4x average-pooled rates; grouped strided conv1d stacks exposing every
  intermediate feature map for feature matching (C12).
* MultiResSTFTDiscriminator: 2-D conv heads over log-magnitude STFTs at
  several (n_fft, hop, win) resolutions.

Every head returns ``(logit, features)``; the multi-head wrappers return
parallel lists. Layout is channel-last throughout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.config import MRDConfig, MSDConfig
from music_synthesis_tpu.ops.conv import WNConv, avg_pool1d
from music_synthesis_tpu.ops.frontend import magnitude_stft, stft

__all__ = [
    "ScaleDiscriminator",
    "MultiScaleDiscriminator",
    "STFTDiscriminator",
    "MultiResSTFTDiscriminator",
]


class ScaleDiscriminator(nn.Module):
    """One raw-audio head: wav ``[B, L]`` -> (logit ``[B, L', 1]``, features)."""

    cfg: MSDConfig = MSDConfig()

    @nn.compact
    def __call__(self, wav: jax.Array):
        cfg = self.cfg
        x = wav[..., None]  # [B, L, 1]
        feats = []
        x = WNConv(
            cfg.channels[0], (cfg.input_kernel,), padding="reflect",
            use_weight_norm=cfg.use_weight_norm,
            compute_dtype=cfg.compute_dtype, name="conv_in",
        )(x)
        x = nn.leaky_relu(x, cfg.leaky_slope)
        feats.append(x)
        for i, (ch, s, grp) in enumerate(
            zip(cfg.channels[1:], cfg.strides, cfg.groups)
        ):
            g = min(grp, x.shape[-1])
            x = WNConv(
                ch, (cfg.kernel,), strides=(s,), groups=g,
                dense_groups=(1 < g <= cfg.dense_groups_max_g),
                padding="same", use_weight_norm=cfg.use_weight_norm,
                compute_dtype=cfg.compute_dtype, name=f"down_{i}",
            )(x)
            x = nn.leaky_relu(x, cfg.leaky_slope)
            feats.append(x)
        x = WNConv(
            cfg.channels[-1], (cfg.post_kernel,), padding="same",
            use_weight_norm=cfg.use_weight_norm,
            compute_dtype=cfg.compute_dtype, name="conv_post",
        )(x)
        x = nn.leaky_relu(x, cfg.leaky_slope)
        feats.append(x)
        logit = WNConv(
            1, (cfg.output_kernel,), padding="same",
            use_weight_norm=cfg.use_weight_norm,
            compute_dtype=cfg.compute_dtype, name="conv_out",
        )(x)
        return logit, feats


class MultiScaleDiscriminator(nn.Module):
    """K heads on progressively average-pooled audio (C9)."""

    cfg: MSDConfig = MSDConfig()

    @nn.compact
    def __call__(self, wav: jax.Array):
        logits, features = [], []
        x = wav
        for s in range(self.cfg.n_scales):
            logit, feats = ScaleDiscriminator(self.cfg, name=f"scale_{s}")(x)
            logits.append(logit)
            features.append(feats)
            if s + 1 < self.cfg.n_scales:
                x = avg_pool1d(
                    x[..., None], window=4,
                    stride=self.cfg.downsample_factor, pad=1,
                )[..., 0]
        return logits, features


class STFTDiscriminator(nn.Module):
    """One spectral head: wav ``[B, L]`` -> 2-D convs on log|STFT|.

    ``f_fold > 1`` runs the conv stack in F-space-to-depth form
    (ops/conv.py FFoldedWNConv2d): same parameters and same math as the
    unfolded path (parity-tested), but the MXU sees ``f_fold *
    channels``-lane contractions instead of 32. Features and logits are
    unfolded back to logical ``[B, T, F', C]`` so every consumer (hinge,
    feature matching) is lowering-agnostic.
    """

    n_fft: int
    hop: int
    win: int
    channels: int = 32
    leaky_slope: float = 0.2
    use_weight_norm: bool = True
    compute_dtype: str = "float32"
    f_fold: int = 0
    input_mode: str = "logmag"
    compression: float = 0.3

    @nn.compact
    def __call__(self, wav: jax.Array):
        if self.input_mode == "complex":
            # Phase-aware input (MRDConfig.input_mode docs): the power-law-
            # compressed complex STFT |S|^p * e^{i phi} as [Re, Im] channels.
            # Computed as S * |S|^(p-1); the smooth eps floor in |S| bounds
            # the compression factor, and d/dS stays finite everywhere.
            s_c = stft(wav, self.n_fft, self.hop, self.win)
            mag = jnp.sqrt(jnp.real(s_c) ** 2 + jnp.imag(s_c) ** 2 + 1e-7)
            scale = mag ** (self.compression - 1.0)
            x = jnp.stack(
                [jnp.real(s_c) * scale, jnp.imag(s_c) * scale], axis=-1
            )  # [B, T, F, 2]
        elif self.input_mode == "logmag":
            spec = magnitude_stft(wav, self.n_fft, self.hop, self.win)
            x = jnp.log(spec)[..., None]  # [B, T, F, 1]
        else:
            raise ValueError(f"unknown input_mode {self.input_mode!r}")
        feats = []
        layer_specs = [
            ((3, 9), (1, 1)),
            ((3, 9), (1, 2)),
            ((3, 9), (1, 2)),
            ((3, 9), (1, 2)),
            ((3, 3), (1, 1)),
        ]
        s = self.f_fold
        if s > 1:
            from music_synthesis_tpu.ops.conv import FFoldedWNConv2d

            b, t, f_log, c_in = x.shape
            fb = -(-f_log // s)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, fb * s - f_log), (0, 0)))
            # fold: f = s*fb + fp, folded channel fp*c_in + c (the layout
            # FFoldedWNConv2d expects; c_in = 1 logmag, 2 complex).
            x = x.reshape(b, t, fb, s * c_in)

            def unfold(y, f_valid):
                bb, tt, fbb, sc = y.shape
                return y.reshape(bb, tt, fbb * s, sc // s)[:, :, :f_valid, :]

            for i, (k, (st, sf)) in enumerate(layer_specs):
                x = FFoldedWNConv2d(
                    self.channels, k, f_stride=sf, fold=s,
                    use_weight_norm=self.use_weight_norm,
                    compute_dtype=self.compute_dtype, name=f"conv_{i}",
                )(x)
                x = nn.leaky_relu(x, self.leaky_slope)
                f_log = -(-f_log // sf)
                # Re-zero logical positions >= f_log so the next layer sees
                # exact 'same'-padding semantics.
                fbo = x.shape[2]
                mask = np.repeat(
                    (np.arange(fbo * s).reshape(fbo, s) < f_log),
                    x.shape[-1] // s, axis=-1,
                ).astype(np.float32)
                x = x * jnp.asarray(mask, x.dtype)
                feats.append(unfold(x, f_log))
            logit = FFoldedWNConv2d(
                1, (3, 3), f_stride=1, fold=s,
                use_weight_norm=self.use_weight_norm,
                compute_dtype=self.compute_dtype, name="conv_out",
            )(x)
            return unfold(logit, f_log), feats
        for i, (k, st) in enumerate(layer_specs):
            x = WNConv(
                self.channels, k, strides=st, padding="same",
                use_weight_norm=self.use_weight_norm,
                compute_dtype=self.compute_dtype, name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, self.leaky_slope)
            feats.append(x)
        logit = WNConv(
            1, (3, 3), padding="same",
            use_weight_norm=self.use_weight_norm,
            compute_dtype=self.compute_dtype, name="conv_out",
        )(x)
        return logit, feats


class MultiResSTFTDiscriminator(nn.Module):
    """Heads at several STFT resolutions (C10)."""

    cfg: MRDConfig = MRDConfig()

    @nn.compact
    def __call__(self, wav: jax.Array):
        logits, features = [], []
        for n_fft, hop, win in self.cfg.resolutions:
            logit, feats = STFTDiscriminator(
                n_fft, hop, win, self.cfg.channels, self.cfg.leaky_slope,
                self.cfg.use_weight_norm, self.cfg.compute_dtype,
                self.cfg.f_fold, input_mode=self.cfg.input_mode,
                compression=self.cfg.complex_compression,
                name=f"res_{n_fft}",
            )(wav)
            logits.append(logit)
            features.append(feats)
        return logits, features


class CombinedDiscriminator(nn.Module):
    """MSD + MRD under one parameter tree — the full stage-2 ``D``."""

    msd: MSDConfig = MSDConfig()
    mrd: MRDConfig = MRDConfig()

    @nn.compact
    def __call__(self, wav: jax.Array):
        msd_logits, msd_feats = MultiScaleDiscriminator(self.msd, name="msd")(wav)
        mrd_logits, mrd_feats = MultiResSTFTDiscriminator(self.mrd, name="mrd")(wav)
        return msd_logits + mrd_logits, msd_feats + mrd_feats
