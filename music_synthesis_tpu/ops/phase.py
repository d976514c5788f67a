"""Phase-coherence metric: magnitude-weighted inter-frame phase jitter.

Why this exists (round-4): the judged fidelity metric — multi-res STFT
distance (losses/stft_loss.py, BASELINE.json:2) — compares MAGNITUDES only,
so any phase-incoherent synthesis is invisible to it (proven in
tests/test_phase.py: a random-phase resynth with the exact real magnitude
barely moves the judged metric but scores > 3x here). This module scores
that artifact class. Measured on the committed runs (DESIGN.md §15):
48-iteration Griffin-Lim is nearly phase-coherent on the synthetic corpus
(ratio 1.13 — the "GL hides phase smear" hypothesis is falsified at
convergence), while the trained waveform head carries ~1.8x natural jitter
and the collapsed iSTFT run 2.37x — the metric's real job is ranking
vocoder phase health.

Definition. For the complex STFT S[t, k] of a signal, let

    d1[t, k] = wrap(phase(S[t+1, k]) - phase(S[t, k]))     (phase advance)
    d2[t, k] = wrap(d1[t+1, k] - d1[t, k])                 (advance jitter)

A steady partial in bin k advances its phase by a CONSTANT 2*pi*hop*f/sr
per frame, whatever f is — so d1 is constant in t and d2 == 0 without
needing to know or unwrap the expected advance. Transients and noise give
large |d2|, but they do so equally for real audio and a faithful resynth;
phase-incoherent synthesis (Griffin-Lim with too few iterations, vocoders
with hop-boundary artifacts) inflates |d2| on the cells that should be
steady. The statistic is the magnitude-weighted mean of |d2| (weights from
the signal's own |S|, aligned to the d2 grid), and the reported quantity is
the RATIO jitter(generated)/jitter(real) on time-aligned copy-synthesis
pairs — the same normalize-by-real design as stage-1's flux_ratio
(scripts/eval_stage1.py): ~1.0 is phase-healthy, >> 1 is smeared.

Reference citation: the reference repo's mount is empty (SURVEY.md §0); the
reference judges phase health by listening. This is the build's measurable
stand-in, kept out of the training objective (eval-only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from music_synthesis_tpu.ops.frontend import stft

__all__ = ["phase_jitter", "phase_jitter_ratio"]


def _wrap(theta: jax.Array) -> jax.Array:
    """Map angles to (-pi, pi] without trig round-tripping at the scale of
    the inputs (atan2(sin, cos) is exact enough at fp32 for a metric)."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def phase_jitter(
    x: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    eps: float = 1e-8,
) -> jax.Array:
    """Magnitude-weighted mean |d2 phase| in radians, scalar per call.

    ``x``: ``[..., L]`` waveform(s); the statistic pools over every leading
    axis. Needs at least 3 STFT frames (L >= n_fft + 2*hop).
    """
    s = stft(x, n_fft=n_fft, hop_length=hop_length)
    phi = jnp.angle(s)
    mag = jnp.abs(s)
    d1 = _wrap(phi[..., 1:, :] - phi[..., :-1, :])
    d2 = _wrap(d1[..., 1:, :] - d1[..., :-1, :])
    # Weight each jitter cell by the magnitude at its CENTER frame (t+1 of
    # the original grid): quiet cells carry numerically meaningless phase.
    w = mag[..., 1:-1, :]
    return jnp.sum(w * jnp.abs(d2)) / jnp.maximum(jnp.sum(w), eps)


def phase_jitter_ratio(
    generated: jax.Array,
    real: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
) -> jax.Array:
    """jitter(generated) / jitter(real) for time-aligned pairs (~1 is good)."""
    return phase_jitter(generated, n_fft, hop_length) / jnp.maximum(
        phase_jitter(real, n_fft, hop_length), 1e-8
    )
