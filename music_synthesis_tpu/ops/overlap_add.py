"""Overlap-add reconstruction of long waveforms from chunked vocoder outputs.

SURVEY.md C18 / §3.4: the reference synthesizes long audio by vocoding
overlapping mel chunks and overlap-adding the waveform windows. Here OLA is a
static-shape, fully-vectorized op that fuses into the single XLA inference
program (BASELINE.json north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["overlap_add", "ola_window", "ola_normalizer"]


def overlap_add(chunks: jax.Array, hop: int) -> jax.Array:
    """Sum overlapping chunks: ``[..., N, C] -> [..., (N-1)*hop + C]``.

    Pure scatter-add expressed as r = ceil(C/hop) shifted static slices, so
    XLA fuses it instead of emitting a gather/scatter kernel. ``hop`` and all
    shapes must be static.
    """
    *lead, n_chunks, chunk_len = chunks.shape
    r = -(-chunk_len // hop)  # ceil
    padded_len = r * hop
    if padded_len != chunk_len:
        pad = [(0, 0)] * (chunks.ndim - 1) + [(0, padded_len - chunk_len)]
        chunks = jnp.pad(chunks, pad)
    # [..., N, r, hop]
    x = chunks.reshape(*lead, n_chunks, r, hop)
    # Accumulator over N + r - 1 hop-slots; slice j of every chunk lands at
    # slot (chunk_index + j).
    acc = jnp.zeros((*lead, n_chunks + r - 1, hop), dtype=chunks.dtype)
    for j in range(r):
        sl = (Ellipsis, slice(j, j + n_chunks), slice(None))
        acc = acc.at[sl].add(x[..., :, j, :])
    out = acc.reshape(*lead, (n_chunks + r - 1) * hop)
    return out[..., : (n_chunks - 1) * hop + chunk_len]


def ola_window(chunk_len: int, hop: int, dtype=jnp.float32) -> jax.Array:
    """Tapered crossfade window for chunked synthesis.

    Flat in the middle, raised-cosine ramps of length (chunk_len - hop) at the
    edges, so that shifted copies at stride ``hop`` sum to exactly 1 in the
    interior (COLA). With hop == chunk_len this degenerates to all-ones.
    """
    overlap = chunk_len - hop
    if overlap <= 0:
        return jnp.ones((chunk_len,), dtype)
    n = jnp.arange(overlap, dtype=dtype)
    ramp = 0.5 - 0.5 * jnp.cos(jnp.pi * (n + 0.5) / overlap)
    mid = jnp.ones((chunk_len - 2 * overlap,), dtype)
    return jnp.concatenate([ramp, mid, ramp[::-1]])


def ola_normalizer(window: jax.Array, n_chunks: int, hop: int) -> jax.Array:
    """Sum of shifted windows — divide an OLA output by this for unity gain.

    Returns ``[(n_chunks-1)*hop + len(window)]`` clipped away from zero.
    """
    tiled = jnp.broadcast_to(window, (n_chunks, window.shape[0]))
    norm = overlap_add(tiled, hop)
    return jnp.maximum(norm, 1e-8)
