"""Overlap-add unit tests (SURVEY.md §4.2): perfect reconstruction / COLA."""

import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.ops.overlap_add import (
    ola_normalizer,
    ola_window,
    overlap_add,
)


def _np_ola(chunks, hop):
    n, c = chunks.shape[-2:]
    out = np.zeros(chunks.shape[:-2] + ((n - 1) * hop + c,), chunks.dtype)
    for i in range(n):
        out[..., i * hop : i * hop + c] += chunks[..., i, :]
    return out


def test_overlap_add_matches_numpy(rng):
    for hop, chunk in [(64, 256), (100, 256), (128, 128), (48, 64)]:
        chunks = rng.standard_normal((2, 5, chunk)).astype(np.float32)
        got = np.asarray(overlap_add(jnp.asarray(chunks), hop))
        np.testing.assert_allclose(got, _np_ola(chunks, hop), rtol=1e-6, atol=1e-6)


def test_ola_window_cola():
    """Shifted windows sum to exactly 1 in the interior (COLA)."""
    for chunk, hop in [(256, 192), (64, 48), (128, 64)]:
        w = np.asarray(ola_window(chunk, hop))
        n = 6
        total = _np_ola(np.broadcast_to(w, (n, chunk)).copy(), hop)
        interior = total[chunk - hop : (n - 1) * hop]
        np.testing.assert_allclose(interior, 1.0, rtol=1e-5)


def test_perfect_reconstruction(rng):
    """Windowed chunks of a signal OLA back to the signal (with edge norm)."""
    chunk, hop, n = 256, 192, 8
    total = (n - 1) * hop + chunk
    x = rng.standard_normal(total).astype(np.float32)
    chunks = np.stack([x[i * hop : i * hop + chunk] for i in range(n)])
    w = np.asarray(ola_window(chunk, hop))
    rec = np.asarray(overlap_add(jnp.asarray(chunks * w), hop))
    norm = np.asarray(ola_normalizer(jnp.asarray(w), n, hop))
    np.testing.assert_allclose(rec / norm, x, rtol=1e-4, atol=1e-5)
