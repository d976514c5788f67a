"""Anti-wrapping phase-coherence loss (the §15/§16 open quality frontier).

Why this exists (round 4). Every trained vocoder in this repo — waveform
head and iSTFT head alike — carries ~1.8x the phase jitter of real audio
(ops/phase.py, docs/DESIGN.md §15/§16), and the judged multi-res STFT
distance cannot see it: that metric compares magnitudes only. The iSTFT
head made the artifact *directly optimizable* — the generator emits explicit
phase channels — but nothing in the training objective ever pulls phase
toward the real signal's. This module is that pull.

Design. Raw phase L1 is useless: phase is only defined mod 2*pi and a
constant time offset shifts every bin's phase linearly in k. Phase
DERIVATIVES are offset-invariant, which is exactly the anti-wrapping trick
of APNet's instantaneous-frequency / group-delay losses (PAPERS.md; Ai &
Ling 2023). For complex STFTs S of the generated (x) and real (y) signals:

    IF direction:  Px[t,k] = S[t+1,k] * conj(S[t,k])   (phase advance)
    GD direction:  Qx[t,k] = S[t,k+1] * conj(S[t,k])   (group delay)

The wrapped difference of phase advances is angle(Px * conj(Py)); instead
of |angle(.)| (atan2 gradient blows up as |S| -> 0) the penalty is the
smooth, bounded

    1 - cos(delta) = 1 - Re(Px * conj(Py)) / (|Px| |Py| + eps)

magnitude-weighted by the REAL pair magnitude |Py| (stop-gradient): quiet
cells carry numerically meaningless phase, and weighting by the generated
magnitude would let the generator mute bins to dodge the penalty. The loss
needs time-aligned pairs — stage 2 copy-synthesis has them by construction
(the generator vocodes the real batch's own mel).

TPU notes: two rFFTs + elementwise complex products — fuses into the
existing multi-res STFT loss pipeline; no new memory-bound pass. Under
shard_map DP the weighted mean is a nonlinear num/den ratio, so the psum'd
num/den + N-times gradient correction follow losses/stft_loss.py's
spectral-convergence pattern exactly.

Reference citation: the reference mount is empty (SURVEY.md §0); the
reference has no phase term either (MelGAN-family losses are magnitude +
adversarial) — this is a deliberate capability EXTENSION, off by default
(TrainConfig.lambda_phase = 0) to keep the reference-faithful recipe exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from music_synthesis_tpu.ops.frontend import stft

__all__ = ["phase_coherence_loss"]


def _shifted_product(re: jax.Array, im: jax.Array, axis: int):
    """(re, im) of S_shifted * conj(S) along ``axis``, in real arithmetic.

    Real-only on purpose: complex cotangents through shard_map's manual
    axes trip jax's varying-spec check (measured in this repo's CI), and
    the MXU has no complex type anyway.
    """
    a0 = jax.lax.slice_in_dim(re, 0, re.shape[axis] - 1, axis=axis)
    a1 = jax.lax.slice_in_dim(re, 1, re.shape[axis], axis=axis)
    b0 = jax.lax.slice_in_dim(im, 0, im.shape[axis] - 1, axis=axis)
    b1 = jax.lax.slice_in_dim(im, 1, im.shape[axis], axis=axis)
    return a1 * a0 + b1 * b0, b1 * a0 - a1 * b0


def _weighted_antiwrap(px, py, eps: float):
    """sum(w * (1 - cos(angle(px) - angle(py)))), sum(w) with w=|py| (sg).

    ``px``/``py``: (re, im) tuples of the phase-derivative products."""
    rx, ix = px
    ry, iy = py
    mx = jnp.sqrt(rx * rx + ix * ix + eps * eps)
    my = jnp.sqrt(ry * ry + iy * iy + eps * eps)
    cos_d = (rx * ry + ix * iy) / (mx * my + eps)
    w = jax.lax.stop_gradient(my)
    return jnp.sum(w * (1.0 - cos_d)), jnp.sum(w)


def phase_coherence_loss(
    x: jax.Array,
    y: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    eps: float = 1e-8,
    axis_name: str | None = None,
) -> jax.Array:
    """Magnitude-weighted anti-wrapping IF + GD phase loss, scalar.

    ``x``: generated waveform(s) ``[..., L]``; ``y``: time-aligned real
    waveform(s), same shape. Returns (IF term + GD term), each a weighted
    mean of ``1 - cos(phase-derivative difference)`` in ``[0, 2]``.

    ``axis_name``: under shard_map DP, the mesh axis holding batch shards;
    numerator/denominator are psum'd so every device computes the exact
    global-batch value, with the same N-times gradient pre-scale as
    ``stft_distance``'s sc term (value unchanged) so the caller's grad-pmean
    reproduces the single-device gradient.
    """
    sx = stft(x, n_fft=n_fft, hop_length=hop_length)
    sy = stft(y, n_fft=n_fft, hop_length=hop_length)
    rex, imx = jnp.real(sx), jnp.imag(sx)
    rey, imy = jnp.real(sy), jnp.imag(sy)

    # Instantaneous-frequency direction: phase advance frame -> frame.
    num_if, den_if = _weighted_antiwrap(
        _shifted_product(rex, imx, axis=-2),
        _shifted_product(rey, imy, axis=-2), eps)

    # Group-delay direction: phase slope across adjacent frequency bins.
    num_gd, den_gd = _weighted_antiwrap(
        _shifted_product(rex, imx, axis=-1),
        _shifted_product(rey, imy, axis=-1), eps)

    if axis_name:
        num_if = jax.lax.psum(num_if, axis_name)
        den_if = jax.lax.psum(den_if, axis_name)
        num_gd = jax.lax.psum(num_gd, axis_name)
        den_gd = jax.lax.psum(den_gd, axis_name)
    loss = num_if / jnp.maximum(den_if, eps) + num_gd / jnp.maximum(
        den_gd, eps
    )
    if axis_name:
        # Caller pmean-of-grads divides the (already global) gradient by N
        # once more than a single-device step would; pre-scale the gradient
        # by N, value untouched (stft_loss.py sc pattern).
        n = jax.lax.psum(1, axis_name)
        loss = n * loss - jax.lax.stop_gradient((n - 1) * loss)
    return loss
