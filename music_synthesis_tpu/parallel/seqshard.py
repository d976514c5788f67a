"""Sequence-sharded vocoding with halo exchange (SURVEY.md §5.7).

The convolutional analogue of context parallelism: when a single audio
sequence is too long for one chip, shard the mel-frame axis over the mesh,
exchange receptive-field-sized halos between neighbors with ``lax.ppermute``
(one hop over ICI), vocode each shard locally, and trim the halo-derived
samples. The interior of the result is identical to vocoding the full mel on
one device (tested on the virtual CPU mesh); only the two global edges see
the same taper any chunked method has.

There is no attention in this model family, so ring-attention/Ulysses do not
apply — halo exchange on the conv receptive field is the exact sequence-
scaling mechanism the architecture calls for.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from music_synthesis_tpu.config import VocoderConfig
from music_synthesis_tpu.models.vocoder import Vocoder

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["receptive_field_frames", "make_seqshard_vocode"]


def receptive_field_frames(cfg: VocoderConfig) -> int:
    """One-sided receptive field of the vocoder in input mel frames (ceil).

    conv_in spans (k-1)/2 frames; each upsample stage's residual stack spans
    sum_d d*(k_res-1)/2 + k1 samples at its own rate, which divides down by
    the remaining upsampling factor; the transposed convs add (k/u) frames at
    their input rate. Computed exactly, then ceil'd.
    """
    rf = (cfg.input_kernel - 1) / 2  # in mel frames
    remaining = 1
    for u in cfg.upsample_factors:
        remaining *= u
    rate = 1.0  # output samples of this stage per mel frame
    for u in cfg.upsample_factors:
        rate *= u
        # transposed conv: kernel 2u, stride u -> reach (2u-1-u//2)/u < 2
        # input frames; bound by 2 at the stage input rate (rate/u per frame).
        rf += 2.0 / (rate / u)
        stack = sum(d * (cfg.res_kernel - 1) // 2 for d in cfg.res_dilations)
        rf += stack / rate
    rf += (cfg.output_kernel - 1) / 2 / rate
    return int(-(-rf // 1))


def make_seqshard_vocode(
    vocoder: Vocoder, mesh: Mesh, axis: str = "data", halo: int | None = None
):
    """Build ``fn(params, mel[B, T, M]) -> wav[B, T*hop]`` with T sharded.

    T must divide the mesh axis size. ``halo`` defaults to the computed
    receptive field (+ padding margin).
    """
    cfg = vocoder.cfg
    hop = cfg.hop_length
    h = halo if halo is not None else receptive_field_frames(cfg) + 2

    def local(params, mel):  # mel: [B, T_local, M] on each device
        n_dev = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        t_loc = mel.shape[1]
        assert t_loc >= h, (
            f"local shard of {t_loc} frames must cover the {h}-frame halo; "
            "use fewer devices or shorter halo"
        )
        # Neighbor halo exchange over ICI (one ppermute hop each way).
        right_edge = mel[:, -h:, :]  # send right: becomes left halo there
        left_edge = mel[:, :h, :]  # send left: becomes right halo there
        left_halo = jax.lax.ppermute(
            right_edge, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        right_halo = jax.lax.ppermute(
            left_edge, axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
        )
        # Global edges: zero the wrapped halos (device 0's left, last's right).
        left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)
        right_halo = jnp.where(
            idx == n_dev - 1, jnp.zeros_like(right_halo), right_halo
        )
        padded = jnp.concatenate([left_halo, mel, right_halo], axis=1)
        wav = vocoder.apply({"params": params}, padded)
        return wav[:, h * hop : -h * hop]

    sm = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return jax.jit(sm)
