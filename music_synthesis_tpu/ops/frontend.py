"""Audio feature front-end, pure-JAX oracle (SURVEY.md C2-C5, §3.1).

framing -> Hann window -> real STFT -> mel filterbank -> log compression at
22.05 kHz, n_fft=1024, hop=256 (BASELINE.json:7). This implementation is the
numerical oracle for the fused Pallas kernel in ``ops/pallas_frontend.py`` and
the CPU fallback path. All functions are jit-friendly: static shapes, no
Python control flow on traced values.

Layout convention: waveforms are ``[..., samples]`` float32; spectrogram
outputs are ``[..., frames, bins]`` (time-major so the frame axis feeds the
MXU-efficient ``[B, T, C]`` conv layout downstream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.config import FrontendConfig

__all__ = [
    "hann_window",
    "frame",
    "stft",
    "magnitude_stft",
    "mel_matrix",
    "log_mel",
    "log_mel_for_vocoder",
    "dft_matrices",
]


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (matches torch.hann_window / scipy periodic)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def frame(x: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """Slice ``x[..., L]`` into overlapping frames ``[..., T, frame_length]``.

    T = 1 + (L - frame_length) // hop_length. No padding is applied here;
    callers control padding policy (see ``log_mel`` / ``log_mel_for_vocoder``).

    Implemented as a reshape+static-slice stack rather than gather: with
    hop 256 / win 1024 every sample is reused 4x, and XLA turns the stacked
    static slices into cheap strided views instead of a gather kernel.
    """
    *lead, length = x.shape
    n_frames = 1 + (length - frame_length) // hop_length
    if n_frames <= 0:
        raise ValueError(
            f"signal length {length} shorter than frame_length {frame_length}"
        )
    # Trim tail samples that don't fill a frame.
    needed = (n_frames - 1) * hop_length + frame_length
    x = x[..., :needed]

    if frame_length % hop_length == 0:
        # Overlapping frames as concatenation of shifted non-overlapping
        # block views: frame[t] = blocks[t : t + r] flattened, where
        # r = frame_length // hop_length.
        r = frame_length // hop_length
        n_blocks = n_frames - 1 + r
        blocks = x[..., : n_blocks * hop_length].reshape(
            *lead, n_blocks, hop_length
        )
        parts = [
            jax.lax.slice_in_dim(blocks, j, j + n_frames, axis=len(lead))
            for j in range(r)
        ]
        return jnp.concatenate(parts, axis=-1)

    # General case: gather by frame start indices.
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return x[..., idx]


def stft(
    x: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    window: jax.Array | None = None,
) -> jax.Array:
    """Hann-windowed real STFT: ``[..., L] -> [..., T, n_fft//2+1]`` complex.

    No centering/padding — pad before calling if needed.
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, x.dtype)
    frames = frame(x, win_length, hop_length) * window
    if win_length < n_fft:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - win_length)]
        frames = jnp.pad(frames, pad)
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def magnitude_stft(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    eps: float = 1e-7,
) -> jax.Array:
    """|STFT| with a numerical floor, used by losses and discriminators.

    The floor is the SMOOTH ``sqrt(power + eps)``, not ``sqrt(max(power,
    eps))``: a hard max zeroes the gradient wherever the signal's spectral
    power is below eps, which silences the multi-res STFT loss exactly when
    the generator is quiet — the regime where its amplitude gradient matters
    most (a near-silent generator would otherwise learn loudness only through
    the discriminator pathway). Values differ from the hard floor by at most
    ~(sqrt(2)-1)*sqrt(eps) ≈ 1.3e-4 absolute, well inside fp32 fixture
    tolerance.
    """
    s = stft(x, n_fft=n_fft, hop_length=hop_length, win_length=win_length)
    return jnp.sqrt(jnp.real(s) ** 2 + jnp.imag(s) ** 2 + eps)


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    log_region = f >= min_log_hz
    mel = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
        mel,
    )
    return mel


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    log_region = m >= min_log_mel
    f = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
    return f


@functools.lru_cache(maxsize=16)
def mel_matrix(
    sample_rate: int = 22_050,
    n_fft: int = 1024,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank ``[n_fft//2+1, n_mels]``.

    Hand-rolled (librosa is not available in this environment — SURVEY.md §7);
    matches librosa.filters.mel(htk=False, norm='slaney') transposed.
    """
    fmax = fmax if fmax is not None else sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    weights = np.zeros((n_mels, n_freqs), dtype=np.float64)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney-style energy normalization.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # [n_freqs, n_mels]


def log_mel(x: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """Full front-end: ``[..., L] -> [..., T, n_mels]`` log-mel features.

    With cfg.center=True, reflect-pads by n_fft//2 each side (librosa-style
    centering, T = L//hop + 1); otherwise no padding (T = 1 + (L-n_fft)//hop).
    """
    if cfg.center:
        pad = [(0, 0)] * (x.ndim - 1) + [(cfg.n_fft // 2, cfg.n_fft // 2)]
        x = jnp.pad(x, pad, mode=cfg.pad_mode)
    s = stft(x, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
             win_length=cfg.win_length)
    power = jnp.real(s) ** 2 + jnp.imag(s) ** 2
    if cfg.power == 2.0:
        spec = power
    elif cfg.power == 1.0:
        spec = jnp.sqrt(jnp.maximum(power, 0.0))
    else:
        spec = jnp.power(jnp.maximum(power, 0.0), cfg.power / 2.0)
    mel = spec @ jnp.asarray(
        mel_matrix(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin,
                   cfg.fmax_resolved)
    )
    return jnp.log(cfg.log_epsilon + mel)


def log_mel_for_vocoder(x: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """Vocoder-conditioning variant: pads so T == L // hop exactly.

    Pads (n_fft - hop) // 2 reflect on each side, then frames without
    centering, giving one mel frame per hop of audio — the alignment the
    vocoder's 256x upsampling stack requires (SURVEY.md §3.2).
    """
    pad_amt = (cfg.n_fft - cfg.hop_length) // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(pad_amt, pad_amt)]
    padded = jnp.pad(x, pad, mode=cfg.pad_mode)
    cfg_nc = FrontendConfig(
        sample_rate=cfg.sample_rate, n_fft=cfg.n_fft,
        win_length=cfg.win_length, hop_length=cfg.hop_length,
        n_mels=cfg.n_mels, fmin=cfg.fmin, fmax=cfg.fmax, power=cfg.power,
        log_epsilon=cfg.log_epsilon, center=False, pad_mode=cfg.pad_mode,
    )
    out = log_mel(padded, cfg_nc)
    n_frames = x.shape[-1] // cfg.hop_length
    return out[..., :n_frames, :]


@functools.lru_cache(maxsize=8)
def dft_matrices(n_fft: int = 1024, padded_bins: int | None = None):
    """Windowed real-DFT bases as two GEMM operands (SURVEY.md §3.5).

    Returns (C, S): ``[n_fft, padded_bins]`` float32 with the periodic Hann
    window folded in, zero-padded from n_fft//2+1 bins up to ``padded_bins``
    (lane-aligned for the MXU). ``frames @ C`` and ``frames @ S`` give the
    real/imag parts of the windowed rFFT.
    """
    n_bins = n_fft // 2 + 1
    if padded_bins is None:
        padded_bins = ((n_bins + 127) // 128) * 128
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_bins, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)
    C = np.zeros((n_fft, padded_bins), dtype=np.float32)
    S = np.zeros((n_fft, padded_bins), dtype=np.float32)
    C[:, :n_bins] = (np.cos(ang) * w[:, None]).astype(np.float32)
    S[:, :n_bins] = (-np.sin(ang) * w[:, None]).astype(np.float32)
    return C, S
