"""Fused two-stage inference (SURVEY.md C17/C18, §3.4; BASELINE.json:10).

``z -> stage-1 mel -> overlapping chunks -> vocoder -> windowed overlap-add
-> waveform`` as ONE jitted XLA program (the reference notebooks' public
API). Chunks are embarrassingly parallel, so they are folded into the batch
axis and vocoded as a single conv batch — the MXU sees one big convolution
workload instead of a Python loop (SURVEY.md §5.7).

Chunking requires ``(n_frames - chunk_frames) % hop_frames == 0`` so shapes
stay static; the edge taper is COLA-normalized for unity gain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from music_synthesis_tpu.config import PipelineConfig
from music_synthesis_tpu.models.specgan import SpectrogramGenerator
from music_synthesis_tpu.models.vocoder import Vocoder
from music_synthesis_tpu.ops.overlap_add import (
    ola_normalizer,
    ola_window,
    overlap_add,
)

__all__ = [
    "chunk_frames",
    "vocode_chunked",
    "generate",
    "generate_direct",
    "generate_long",
    "generate_long_refined",
    "generate_refined",
    "stitch_long_mel",
]


def chunk_frames(mel: jax.Array, chunk: int, hop: int) -> jax.Array:
    """``[B, T, M] -> [B, N, chunk, M]`` overlapping frame chunks.

    N = 1 + (T - chunk) // hop; (T - chunk) must divide hop exactly.
    """
    t = mel.shape[-2]
    assert (t - chunk) % hop == 0, (
        f"n_frames={t} incompatible with chunk={chunk}, hop={hop}"
    )
    n = 1 + (t - chunk) // hop
    parts = [
        jax.lax.slice_in_dim(mel, i * hop, i * hop + chunk, axis=-2)
        for i in range(n)
    ]
    return jnp.stack(parts, axis=-3)


def vocode_chunked(
    vocoder: Vocoder, g_params, mel: jax.Array, cfg: PipelineConfig
) -> jax.Array:
    """Chunked vocoding + windowed OLA: ``[B, T, M] -> [B, T * hop_audio]``."""
    ic = cfg.infer
    hop_audio = cfg.vocoder.hop_length
    chunks = chunk_frames(mel, ic.chunk_frames, ic.hop_frames)
    b, n, c, m = chunks.shape
    wav_chunks = vocoder.apply(
        {"params": g_params}, chunks.reshape(b * n, c, m)
    ).reshape(b, n, c * hop_audio)
    window = ola_window(c * hop_audio, ic.hop_frames * hop_audio)
    out = overlap_add(wav_chunks * window, ic.hop_frames * hop_audio)
    norm = ola_normalizer(window, n, ic.hop_frames * hop_audio)
    return out / norm


def generate(
    cfg: PipelineConfig, specgan_params, vocoder_params, z: jax.Array
) -> jax.Array:
    """Two-stage synthesis: latent ``[B, Z]`` -> waveform ``[B, L]``.

    Jit this (cfg static): the spectrogram generator, chunking, batched
    vocoder and OLA all fuse into one XLA program.
    """
    mel = SpectrogramGenerator(cfg.specgan).apply({"params": specgan_params}, z)
    return vocode_chunked(Vocoder(cfg.vocoder), vocoder_params, mel, cfg)


generate_jit = jax.jit(generate, static_argnums=0)


def generate_refined(
    cfg: PipelineConfig,
    specgan_params,
    vocoder_params,
    z: jax.Array,
    n_iter: int = 8,
) -> jax.Array:
    """``generate`` + warm-started Griffin-Lim consistency refinement.

    The vocoded waveform's phase seeds a few STFT-consistency projections
    against the stage-1 mel's own pinv magnitude (ops/griffin_lim.py::
    griffin_lim_refine) — enforcing the magnitude/consistency constraint
    the adversarial objective only approximates, at a measured handful of
    GEMM round-trips per clip. Still one jitted XLA program (jit with
    static cfg and n_iter).
    """
    from music_synthesis_tpu.ops.griffin_lim import refine_with_log_mel

    mel = SpectrogramGenerator(cfg.specgan).apply({"params": specgan_params}, z)
    wav = vocode_chunked(Vocoder(cfg.vocoder), vocoder_params, mel, cfg)
    # Stage-1 output lives in the GAN's normalized mel space; the mel
    # pseudo-inverse needs the raw log-mel (config.py MelScaler).
    logmel = mel * cfg.mel_scaler.scale + cfg.mel_scaler.shift
    return refine_with_log_mel(wav, logmel, cfg.frontend, n_iter=n_iter)


def generate_direct(
    cfg: PipelineConfig, specgan_params, vocoder_params, z: jax.Array
) -> jax.Array:
    """Unchunked variant (whole mel vocoded at once) — the numeric baseline
    the chunked path is validated against and a perf comparison point."""
    mel = SpectrogramGenerator(cfg.specgan).apply({"params": specgan_params}, z)
    return Vocoder(cfg.vocoder).apply({"params": vocoder_params}, mel)


def generate_long(
    cfg: PipelineConfig,
    specgan_params,
    vocoder_params,
    z: jax.Array,
    crossfade_frames: int = 8,
) -> jax.Array:
    """Arbitrary-duration synthesis: ``z[B, N, Z] -> wav[B, L]``.

    N latent draws each produce an n_frames mel patch; patches are stitched
    into one long spectrogram by mel-domain crossfade (COLA overlap-add over
    the frame axis with hop = n_frames - crossfade_frames), then the whole
    long mel goes through the chunked vocoder + waveform OLA. Duration is
    selected by N: seconds ~= (N * (n_frames - crossfade_frames) +
    crossfade_frames) * hop / sample_rate. Still one jitted XLA program.
    """
    mel_long = stitch_long_mel(cfg, specgan_params, z, crossfade_frames)
    return vocode_chunked(Vocoder(cfg.vocoder), vocoder_params, mel_long, cfg)


def stitch_long_mel(
    cfg: PipelineConfig, specgan_params, z: jax.Array, crossfade_frames: int
) -> jax.Array:
    """``z[B, N, Z] -> mel[B, T_long, M]``: the stage-1/crossfade half of
    ``generate_long``, shared with its refined variant."""
    b, n, zdim = z.shape
    t = cfg.specgan.n_frames
    hop_t = t - crossfade_frames
    gen = SpectrogramGenerator(cfg.specgan)
    mel = gen.apply({"params": specgan_params}, z.reshape(b * n, zdim))
    mel = mel.reshape(b, n, t, cfg.specgan.n_mels)
    if crossfade_frames > 0:
        window = ola_window(t, hop_t)[:, None]  # over frames, all mel bins
        # OLA over the frame axis: move mel bins ahead of the chunk axis so
        # chunks sit at [..., N, T] as overlap_add expects.
        stacked = jnp.moveaxis(mel * window, -1, 1)  # [B, M, N, T]
        stitched = overlap_add(stacked, hop_t)  # [B, M, T_long]
        norm = ola_normalizer(ola_window(t, hop_t), n, hop_t)
        mel_long = jnp.moveaxis(stitched / norm, 1, -1)  # [B, T_long, M]
    else:
        mel_long = mel.reshape(b, n * t, cfg.specgan.n_mels)
    # Trim so chunking stays compatible: (T - chunk) % hop_frames == 0.
    ic = cfg.infer
    t_long = mel_long.shape[1]
    usable = t_long - (t_long - ic.chunk_frames) % ic.hop_frames
    return mel_long[:, :usable]


def generate_long_refined(
    cfg: PipelineConfig,
    specgan_params,
    vocoder_params,
    z: jax.Array,
    crossfade_frames: int = 8,
    n_iter: int = 8,
) -> jax.Array:
    """``generate_long`` + warm-started GL consistency refinement (see
    ``generate_refined``). cfg, crossfade_frames and n_iter are static."""
    from music_synthesis_tpu.ops.griffin_lim import refine_with_log_mel

    mel_long = stitch_long_mel(cfg, specgan_params, z, crossfade_frames)
    wav = vocode_chunked(Vocoder(cfg.vocoder), vocoder_params, mel_long, cfg)
    logmel = mel_long * cfg.mel_scaler.scale + cfg.mel_scaler.shift
    return refine_with_log_mel(wav, logmel, cfg.frontend, n_iter=n_iter)
