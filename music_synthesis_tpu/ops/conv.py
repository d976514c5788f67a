"""Weight-normalized convolution primitives in TPU-friendly layout.

SURVEY.md C20: MelGAN-family generators/discriminators use weight-norm
reparametrization. Flax has no built-in; here it is explicit ``(g, v)``
parameters with ``kernel = g * v / ||v||`` so optimizers see the
reparametrized space, exactly like torch.nn.utils.weight_norm.

Layout: activations are ``[B, L, C]`` (1-D) / ``[B, H, W, C]`` (2-D) — the
channel-last layout XLA:TPU tiles onto the MXU. Kernels are ``[*K, Cin/g,
Cout]`` (HIO/HWIO).

All padding is explicit (reflect or zeros) followed by a VALID conv, so the
numerics match the reference family's ReflectionPad1d + Conv1d convention and
never depend on XLA's SAME-padding placement.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["WNConv", "WNConvTranspose1d", "FFoldedWNConv2d", "avg_pool1d"]


def _init_std(
    scheme: str, init_scale: float, fan_in: int, gain: float = 1.0
) -> float:
    """Weight std for the ``v`` parameter.

    'dcgan': fixed N(0, init_scale) — the MelGAN-family recipe. Gives an
    end-to-end generator gain of ~1e-5 at default widths (measured), i.e. a
    near-silent start (docs/DESIGN.md §8).
    'he': N(0, sqrt(2/fan_in)) — per-layer gain ~1, so the generator starts
    at healthy output amplitude and both the adversarial and spectral losses
    see informative gradients from step 0.
    """
    if scheme == "he":
        return float(gain * (2.0 / max(fan_in, 1)) ** 0.5)
    assert scheme == "dcgan", scheme
    return gain * init_scale


def _normalize(v: jax.Array, g: jax.Array) -> jax.Array:
    """kernel = g * v / ||v||, norm over all axes except the last (Cout)."""
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True) + 1e-12)
    return v * (g / norm.reshape(-1))


class WNConv(nn.Module):
    """N-D convolution with optional weight norm, explicit padding.

    kernel_size: ints per spatial dim. padding: 'same' (torch-style
    symmetric, zeros), 'reflect' (symmetric reflect), 'valid', or explicit
    ((lo, hi), ...) zero padding.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    dilations: Sequence[int] | None = None
    groups: int = 1
    # Run a grouped conv as ONE dense conv with a block-diagonal kernel.
    # Bit-identical math (off-block weights are constant zeros; gradients
    # flow only to the real blocks), but the MXU sees a single dense
    # [Cin, Cout] contraction instead of G fragmented Cin/G-channel convs.
    # Measured motivation (runs/trace_stage2): XLA lowers the MSD's grouped
    # kernel-41 convs to 4-channel units that leave 97% of the MXU lanes
    # idle — 39% of the whole stage-2 GAN step. Trades G x more FLOPs for
    # dense tiling; profitable for small/medium G (see MSDConfig).
    dense_groups: bool = False
    padding: str | Sequence[tuple[int, int]] = "same"
    use_weight_norm: bool = True
    use_bias: bool = True
    init_scale: float = 0.02
    init_scheme: str = "dcgan"  # see _init_std
    init_gain: float = 1.0  # extra multiplier on the init std (any scheme)
    # Mixed precision: params/weight-norm stay float32; inputs and kernels
    # are cast to this dtype for the conv (bf16 hits the MXU's native path)
    # and activations flow onward in this dtype.
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ndim = len(self.kernel_size)
        strides = tuple(self.strides or (1,) * ndim)
        dilations = tuple(self.dilations or (1,) * ndim)
        cin = x.shape[-1]
        assert cin % self.groups == 0, (cin, self.groups)
        kshape = (*self.kernel_size, cin // self.groups, self.features)

        fan_in = (cin // self.groups) * int(np.prod(self.kernel_size))
        std = _init_std(
            self.init_scheme, self.init_scale, fan_in, self.init_gain
        )
        v = self.param(
            "v", nn.initializers.normal(std), kshape, jnp.float32
        )
        if self.use_weight_norm:
            g = self.param(
                "g",
                lambda _key: jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=tuple(range(v.ndim - 1)))
                    + 1e-12
                ),
            )
            kernel = _normalize(v, g)
        else:
            kernel = v

        # Explicit padding.
        if self.padding == "valid":
            pads = ((0, 0),) * ndim
        elif self.padding in ("same", "reflect"):
            pads = []
            for k, d in zip(self.kernel_size, dilations):
                total = d * (k - 1)
                pads.append((total // 2, total - total // 2))
            pads = tuple(pads)
        else:
            pads = tuple(self.padding)
        if any(p != (0, 0) for p in pads):
            mode = "reflect" if self.padding == "reflect" else "constant"
            x = jnp.pad(x, ((0, 0), *pads, (0, 0)), mode=mode)

        cdt = jnp.dtype(self.compute_dtype)
        spatial = "".join("HWD"[i] for i in range(ndim))
        dn = lax.conv_dimension_numbers(
            x.shape, kernel.shape,
            (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"),
        )
        groups = self.groups
        if groups > 1 and self.dense_groups:
            # Block-diagonal dense kernel: dense[*K, h*Ci_g+c, g*Co_g+o] =
            # kernel[*K, c, g*Co_g+o] iff h == g, else 0.
            ci_g = cin // groups
            co_g = self.features // groups
            kr = kernel.reshape(*self.kernel_size, ci_g, groups, co_g)
            eye = jnp.eye(groups, dtype=kernel.dtype)
            kernel = jnp.einsum("...cgo,hg->...hcgo", kr, eye).reshape(
                *self.kernel_size, cin, self.features
            )
            groups = 1
        # Activations flow in compute_dtype between layers; the MXU still
        # accumulates bf16 products in f32 internally. (Requesting
        # preferred_element_type=f32 here would make the AD cotangent f32
        # against bf16 residuals and break the transpose conv.)
        out = lax.conv_general_dilated(
            x.astype(cdt), kernel.astype(cdt),
            window_strides=strides,
            padding="VALID",
            rhs_dilation=dilations,
            dimension_numbers=dn,
            feature_group_count=groups,
        )
        if self.use_bias:
            b = self.param(
                "b", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + b.astype(cdt)
        return out


class WNConvTranspose1d(nn.Module):
    """1-D transposed conv, stride ``u``, kernel ``2u`` -> exact ``u``x upsample.

    Output length is exactly ``L * stride`` (pad total = kernel - stride,
    split symmetrically), mirroring the MelGAN family's
    ConvTranspose1d(k=2u, stride=u, padding=ceil(u/2), output_padding=u%2).
    """

    features: int
    kernel_size: int
    stride: int
    use_weight_norm: bool = True
    use_bias: bool = True
    init_scale: float = 0.02
    init_scheme: str = "dcgan"  # see _init_std
    init_gain: float = 1.0  # extra multiplier on the init std (any scheme)
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kshape = (self.kernel_size, cin, self.features)
        # Each output sample sees kernel/stride real (non-zero-stuffed)
        # inputs, so that is the effective fan-in of a transposed conv.
        fan_in = cin * max(self.kernel_size // self.stride, 1)
        std = _init_std(
            self.init_scheme, self.init_scale, fan_in, self.init_gain
        )
        v = self.param(
            "v", nn.initializers.normal(std), kshape, jnp.float32
        )
        if self.use_weight_norm:
            g = self.param(
                "g",
                lambda _key: jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=(0, 1)) + 1e-12
                ),
            )
            kernel = _normalize(v, g)
        else:
            kernel = v

        assert self.kernel_size >= self.stride, "kernel must be >= stride"
        cdt = jnp.dtype(self.compute_dtype)
        # SAME padding on the stride-dilated input yields exactly L * stride
        # output samples (verified against lax.conv_transpose semantics).
        out = lax.conv_transpose(
            x.astype(cdt), kernel.astype(cdt),
            strides=(self.stride,),
            padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            b = self.param(
                "b", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + b.astype(cdt)
        return out


class FFoldedWNConv2d(nn.Module):
    """2-D WNConv over ``[B, T, F, C]`` computed in F-space-to-depth form.

    TPU motivation (runs/trace_stage2, docs/DESIGN.md §11): the MRD's 2-D
    convs run at 32 channels — a quarter of the MXU's 128 lanes — and are
    37% of the stage-2 step. Folding the frequency axis by ``fold`` (input
    arrives as ``[B, T, F/fold, fold*C]``; logical ``f = fold*fb + fp``,
    folded channel ``fp*C + c``) turns a ``(kt, kf)`` stride ``(1, sf)``
    conv into a ``(kt, kfb)`` stride ``(1, sf)`` conv at ``fold*C`` in/out
    channels — MXU-shaped — with the folded kernel built from the LOGICAL
    kernel by a constant scatter. Same parameters (``v``/``g``/``b`` shapes
    identical to :class:`WNConv`), same math: checkpoints interchange with
    the unfolded path bit-for-bit.

    The caller tracks logical F sizes, pads F to a multiple of ``fold``
    before folding, and masks logical positions ``>= F_out`` after each
    layer (see STFTDiscriminator) so zero-padding semantics stay exact.
    """

    features: int  # logical output channels
    kernel_size: tuple[int, int]  # (kt, kf) over (time, freq)
    f_stride: int = 1
    fold: int = 4
    use_weight_norm: bool = True
    use_bias: bool = True
    init_scale: float = 0.02
    init_scheme: str = "dcgan"
    init_gain: float = 1.0
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: ``[B, T, Fb, fold*Cin]`` -> ``[B, T', F'b, fold*features]``.

        ``T`` uses torch-style 'same' zero padding (stride 1); the folded F
        geometry reproduces logical 'same' padding exactly.
        """
        kt, kf = self.kernel_size
        s, sf = self.fold, self.f_stride
        cin_f = x.shape[-1]
        assert cin_f % s == 0, (cin_f, s)
        cin = cin_f // s
        fb = x.shape[2]

        # Logical params — identical to WNConv([kt, kf], cin, features).
        kshape = (kt, kf, cin, self.features)
        fan_in = cin * kt * kf
        std = _init_std(self.init_scheme, self.init_scale, fan_in,
                        self.init_gain)
        v = self.param("v", nn.initializers.normal(std), kshape, jnp.float32)
        if self.use_weight_norm:
            g = self.param(
                "g",
                lambda _key: jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=(0, 1, 2)) + 1e-12
                ),
            )
            kernel = _normalize(v, g)
        else:
            kernel = v

        # Fold the logical kernel: for each (fop, df), the logical input tap
        # f = sf*(s*fob + fop) + df - pf_lo lands at folded position
        # fb_off = floor(m/s), phase fip = m mod s, with m = sf*fop + df -
        # pf_lo (torch-'same' pf_lo = (kf-1)//2).
        pf_lo = (kf - 1) // 2
        taps = {}
        for fop in range(s):
            for df in range(kf):
                m = sf * fop + df - pf_lo
                taps[(fop, df)] = (m // s, m % s)
        dfb_min = min(t[0] for t in taps.values())
        dfb_max = max(t[0] for t in taps.values())
        kfb = dfb_max - dfb_min + 1
        wf = jnp.zeros((kt, kfb, s * cin, s * self.features), kernel.dtype)
        for (fop, df), (dfb, fip) in taps.items():
            wf = wf.at[
                :, dfb - dfb_min,
                fip * cin:(fip + 1) * cin,
                fop * self.features:(fop + 1) * self.features,
            ].set(kernel[:, df])

        # Folded output length: enough fb positions to cover the logical
        # 'same' output ceil(F_in/sf); the caller slices/masks the tail.
        fb_out = -(-fb // sf) if sf > 1 else fb
        pad_lo = -dfb_min
        pad_hi = max(0, sf * (fb_out - 1) + dfb_max - (fb - 1))
        pt = (kt - 1) // 2
        xp = jnp.pad(
            x, ((0, 0), (pt, kt - 1 - pt), (pad_lo, pad_hi), (0, 0))
        )
        cdt = jnp.dtype(self.compute_dtype)
        dn = lax.conv_dimension_numbers(
            xp.shape, wf.shape, ("NHWC", "HWIO", "NHWC")
        )
        out = lax.conv_general_dilated(
            xp.astype(cdt), wf.astype(cdt),
            window_strides=(1, sf),
            padding="VALID",
            dimension_numbers=dn,
        )
        if self.use_bias:
            b = self.param(
                "b", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + jnp.tile(b, s).astype(cdt)
        return out


def avg_pool1d(x: jax.Array, window: int, stride: int, pad: int) -> jax.Array:
    """Average pool over the length axis of ``[B, L, C]``.

    Zero-padded but normalized by the true (unpadded) window overlap —
    torch AvgPool1d(count_include_pad=False) semantics, as used between
    multi-scale discriminator heads.
    """
    sums = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, window, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (pad, pad), (0, 0)),
    )
    ones = jnp.ones((1, x.shape[1], 1), x.dtype)
    counts = lax.reduce_window(
        ones, 0.0, lax.add,
        window_dimensions=(1, window, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (pad, pad), (0, 0)),
    )
    return sums / counts
