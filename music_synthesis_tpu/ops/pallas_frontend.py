"""Fused log-mel front-end as a single Pallas (Mosaic) TPU kernel.

SURVEY.md §3.5 / BASELINE.json north star: framing + Hann window + real DFT +
mel projection + log compression over batched HBM-resident waveforms in ONE
kernel. The 1024-point rDFT is expressed as a GEMM against windowed cos/sin
bases (two bases packed into one ``[1024, 2*640]`` operand -> one MXU op per
tile) instead of an FFT butterfly: at n_fft=1024 the DFT-as-matmul is tiny,
MXU-shaped, and fuses with the mel GEMM, where a butterfly would serialize on
the VPU.

Data flow per grid step t (batch and frame-time fused into ONE tile axis —
every hop-block row of every batch element is a candidate frame start, so
the GEMM M dimension stays at the full 128-row tile even when each clip has
only ~32 frames; the few frames that straddle a batch boundary compute
garbage and are sliced away on output):
  HBM wav tile [(TT+3)*256] --DMA--> VMEM
    -> overlapping frames [TT, 1024] (4x reuse via shifted static slices)
    -> frames @ bases [1024, 1280]            (MXU)   re | im
    -> power = re^2 + im^2 [TT, 640]          (VPU)
    -> power @ mel [640, n_mels~128]          (MXU)
    -> log(eps + .) -> out[t*TT:(t+1)*TT]     (VPU)

The pure-JAX oracle (ops.frontend.log_mel) remains the permanent reference;
parity is enforced in tests/test_pallas_frontend.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from music_synthesis_tpu.config import FrontendConfig
from music_synthesis_tpu.ops.frontend import dft_matrices, mel_matrix

__all__ = ["pallas_log_mel", "pallas_log_mel_for_vocoder"]

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(wav_hbm, bases_ref, mel_ref, out_ref, wav_vmem, sem, *,
            tile_frames: int, hop: int, n_fft: int, padded_bins: int,
            magnitude: bool, log_eps: float):
    t = pl.program_id(0)
    blocks_per_frame = n_fft // hop  # 4 for 1024/256

    # DMA the overlapping waveform tile for TT frames: rows
    # [t*TT, t*TT + TT + pad) of the flat [R, hop] block view (batch and
    # time fused on the row axis), row count rounded up to the sublane
    # tile (8) — Mosaic requires tiling-aligned slice shapes.
    n_rows = _round_up(tile_frames + blocks_per_frame - 1, 8)
    dma = pltpu.make_async_copy(
        wav_hbm.at[pl.ds(t * tile_frames, n_rows)],
        wav_vmem,
        sem,
    )
    dma.start()
    dma.wait()

    # Windowed rDFT without materializing the overlapping frame matrix:
    # frame i is hop-blocks i..i+3 concatenated, so
    #   frames @ bases == sum_j wav_blocks[j : j+TT] @ bases[j*hop:(j+1)*hop].
    # Four accumulated [TT, hop] x [hop, 2*bins] GEMMs — same FLOPs, and the
    # shifted operands feed the MXU directly (Mosaic cannot concatenate
    # sublane-offset slices).
    spec = jnp.zeros(
        (tile_frames, bases_ref.shape[1]), dtype=jnp.float32
    )
    for j in range(blocks_per_frame):
        spec = spec + jnp.dot(
            wav_vmem[j : j + tile_frames, :],
            bases_ref[j * hop : (j + 1) * hop, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    re = spec[:, :padded_bins]
    im = spec[:, padded_bins:]
    power = re * re + im * im
    if magnitude:
        power = jnp.sqrt(power)

    # Mel projection GEMM + log compression.
    mel = jnp.dot(
        power, mel_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] = jnp.log(log_eps + mel)


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "n_mels", "sample_rate", "fmin", "fmax",
                     "magnitude", "log_eps", "tile_frames", "interpret"),
)
def _pallas_log_mel_core(
    wav: jax.Array,
    *,
    n_fft: int,
    hop: int,
    n_mels: int,
    sample_rate: int,
    fmin: float,
    fmax: float,
    magnitude: bool,
    log_eps: float,
    tile_frames: int,
    interpret: bool,
) -> jax.Array:
    """wav ``[B, L]`` (unpadded, center=False) -> log-mel ``[B, T, n_mels]``."""
    assert wav.ndim == 2, "kernel expects [B, L]"
    assert n_fft % hop == 0, "kernel requires hop | n_fft"
    b, length = wav.shape
    n_frames = 1 + (length - n_fft) // hop
    assert n_frames >= 1, "signal shorter than one frame"
    blocks_per_frame = n_fft // hop

    # Fuse batch and frame-time into ONE row axis: each batch element
    # contributes n_blocks sublane-aligned hop-block rows, and every row is
    # treated as a frame start. Rows whose frame window crosses into the
    # next batch element produce garbage that the final slice discards;
    # in exchange the GEMM M dimension stays at the full tile (128) even
    # for short training segments (T≈32), where per-batch tiling left the
    # MXU 4x row-underutilized (measured 0.856x vs the XLA oracle at
    # [16, 8192] — this relayout is the fix).
    n_blocks = _round_up(n_frames + blocks_per_frame - 1, 8)
    needed = n_blocks * hop
    if needed > length:
        wav = jnp.pad(wav, ((0, 0), (0, needed - length)))
    flat = wav[:, :needed].reshape(b * n_blocks, hop)

    total_rows = b * n_blocks
    tt = min(tile_frames, _round_up(total_rows, 8))
    t_pad = _round_up(total_rows, tt)
    # Extra rows so the last tile's sublane-aligned DMA stays in bounds.
    r_need = (t_pad - tt) + _round_up(tt + blocks_per_frame - 1, 8)
    if r_need > total_rows:
        flat = jnp.pad(flat, ((0, r_need - total_rows), (0, 0)))

    padded_bins = _round_up(n_fft // 2 + 1, _LANES)
    c_m, s_m = dft_matrices(n_fft, padded_bins)
    bases = jnp.asarray(np.concatenate([c_m, s_m], axis=1))  # [n_fft, 2*pb]
    m_pad = _round_up(n_mels, _LANES)
    mel_m = np.zeros((padded_bins, m_pad), np.float32)
    mel_m[: n_fft // 2 + 1, :n_mels] = mel_matrix(
        sample_rate, n_fft, n_mels, fmin, fmax
    )
    mel_m = jnp.asarray(mel_m)

    kernel = functools.partial(
        _kernel,
        tile_frames=tt,
        hop=hop,
        n_fft=n_fft,
        padded_bins=padded_bins,
        magnitude=magnitude,
        log_eps=log_eps,
    )
    flops_per_tile = 2 * tt * n_fft * 2 * padded_bins + 2 * tt * padded_bins * m_pad
    out = pl.pallas_call(
        kernel,
        grid=(t_pad // tt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # wav blocks stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # DFT bases
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mel matrix
        ],
        out_specs=pl.BlockSpec(
            (tt, m_pad), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, m_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(
                (_round_up(tt + blocks_per_frame - 1, 8), hop), jnp.float32
            ),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(t_pad // tt) * flops_per_tile,
            bytes_accessed=r_need * hop * 4 + t_pad * m_pad * 4,
            transcendentals=t_pad * m_pad,
        ),
        interpret=interpret,
    )(flat, bases, mel_m)
    # Un-fuse: rows [i*n_blocks, i*n_blocks + n_frames) are batch i's frames.
    return out[: b * n_blocks].reshape(b, n_blocks, m_pad)[:, :n_frames, :n_mels]


def pallas_log_mel(
    wav: jax.Array,
    cfg: FrontendConfig,
    tile_frames: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused-kernel equivalent of ``ops.frontend.log_mel`` for ``[B, L]``.

    Matches the oracle to float32 tolerance (enforced by tests). cfg.center
    is honored by host-side reflect padding; cfg.power must be 1.0 or 2.0.
    """
    assert cfg.power in (1.0, 2.0), "kernel supports power 1.0 / 2.0"
    assert cfg.win_length == cfg.n_fft, "kernel assumes win_length == n_fft"
    if cfg.center:
        wav = jnp.pad(
            wav, ((0, 0), (cfg.n_fft // 2, cfg.n_fft // 2)), mode=cfg.pad_mode
        )
    return _pallas_log_mel_core(
        wav,
        n_fft=cfg.n_fft,
        hop=cfg.hop_length,
        n_mels=cfg.n_mels,
        sample_rate=cfg.sample_rate,
        fmin=cfg.fmin,
        fmax=cfg.fmax_resolved,
        magnitude=(cfg.power == 1.0),
        log_eps=cfg.log_epsilon,
        tile_frames=tile_frames,
        interpret=interpret,
    )


def pallas_log_mel_for_vocoder(
    wav: jax.Array,
    cfg: FrontendConfig,
    tile_frames: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused-kernel equivalent of ``ops.frontend.log_mel_for_vocoder``:
    one mel frame per hop of audio (T = L // hop)."""
    pad_amt = (cfg.n_fft - cfg.hop_length) // 2
    padded = jnp.pad(wav, ((0, 0), (pad_amt, pad_amt)), mode=cfg.pad_mode)
    n_frames = wav.shape[-1] // cfg.hop_length
    out = _pallas_log_mel_core(
        padded,
        n_fft=cfg.n_fft,
        hop=cfg.hop_length,
        n_mels=cfg.n_mels,
        sample_rate=cfg.sample_rate,
        fmin=cfg.fmin,
        fmax=cfg.fmax_resolved,
        magnitude=(cfg.power == 1.0),
        log_eps=cfg.log_epsilon,
        tile_frames=tile_frames,
        interpret=interpret,
    )
    return out[:, :n_frames, :]
