"""Streaming long-form synthesis: unbounded duration, constant latency.

``generate_long`` (infer/generate.py) synthesizes N latent patches as ONE
XLA program — ideal for bounded requests, but the program shape (and its
compile) grows with N, and no audio exists until the whole program
finishes. Streaming inverts the trade for interactive / very-long-form
use (SURVEY.md §5.7): two FIXED-shape jitted programs (one specgan patch,
one vocoder chunk) are reused forever, and every ``feed(z)`` call emits
the audio that became final, a patch at a time.

Exactness: the emitted stream is the same audio ``generate_long``
produces for the same latent sequence (tested to float tolerance in
tests/test_stream.py). Both OLA levels — the mel-domain patch crossfade
and the waveform-domain chunk taper — are reproduced with the identical
windows/normalizers (ops/overlap_add.py), maintained incrementally as
(accumulator, window-sum) buffer pairs on the host:

- a mel frame is final once the next patch can no longer touch it
  (patch i finalizes frames ``< (i+1) * (t - cf)``);
- a vocoder chunk runs once its ``chunk_frames`` are final;
- a waveform sample is final once the next chunk can no longer touch it.

The host holds only the unfinalized tails (O(patch + chunk), independent
of stream length); the device only ever sees the two warm programs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.config import PipelineConfig
from music_synthesis_tpu.models.specgan import SpectrogramGenerator
from music_synthesis_tpu.models.vocoder import Vocoder
from music_synthesis_tpu.ops.overlap_add import ola_window

__all__ = ["StreamingSynth", "make_stream_fns"]


def make_stream_fns(cfg: PipelineConfig) -> tuple:
    """The two fixed-shape jitted programs every stream reuses:
    ``patch_fn(sg_params, z[B, Z]) -> mel`` and
    ``chunk_fn(voc_params, mel[B, chunk, M]) -> wav``."""
    gen = SpectrogramGenerator(cfg.specgan)
    voc = Vocoder(cfg.vocoder)
    return (
        jax.jit(lambda p, z: gen.apply({"params": p}, z)),
        jax.jit(lambda p, mel: voc.apply({"params": p}, mel)),
    )


class StreamingSynth:
    """Feed latents ``[B, Z]`` one patch at a time; receive final audio.

    Usage::

        s = StreamingSynth(cfg, sg_params, voc_params, crossfade_frames=8)
        for z in latent_patches:          # [B, latent_dim] each
            emit = s.feed(z)              # [B, n_new_samples] (may be 0)
            ...
        emit = s.finish()                 # the remaining tail
    """

    def __init__(
        self,
        cfg: PipelineConfig,
        specgan_params,
        vocoder_params,
        crossfade_frames: int = 8,
        fns: tuple | None = None,
    ):
        if crossfade_frames >= cfg.specgan.n_frames:
            raise ValueError("crossfade_frames must be < specgan.n_frames")
        self.cfg = cfg
        self.cf = crossfade_frames
        self.t = cfg.specgan.n_frames
        self.hop_t = self.t - self.cf
        ic = cfg.infer
        self.chunk_f, self.hop_f = ic.chunk_frames, ic.hop_frames
        self.ha = cfg.vocoder.hop_length
        self._sg_params = specgan_params
        self._voc_params = vocoder_params

        if fns is not None:
            # Shared pre-jitted (patch_fn, chunk_fn) — lets a server reuse
            # ONE compiled pair across every stream (make_stream_fns).
            self._patch_fn, self._chunk_fn = fns
        else:
            self._patch_fn, self._chunk_fn = make_stream_fns(cfg)

        # Host-side windows (identical to generate_long's).
        self._w_mel = np.asarray(
            ola_window(self.t, self.hop_t))[:, None]  # [t, 1]
        wl = self.chunk_f * self.ha
        self._w_wav = np.asarray(ola_window(wl, self.hop_f * self.ha))

        self._reset()

    def _reset(self) -> None:
        self._n_patches = 0
        # Mel OLA state: acc/wsum cover frames [mel_base, mel_base+len).
        self._mel_base = 0
        self._mel_acc: np.ndarray | None = None   # [B, L, M]
        self._mel_wsum: np.ndarray | None = None  # [L, 1]
        # Final (normalized) mel frames awaiting vocoding, starting at
        # absolute frame index vocoded up to self._next_chunk * hop_f.
        self._final_base = 0
        self._final_mel: np.ndarray | None = None
        self._next_chunk = 0
        # Waveform OLA state: acc/wsum cover samples [wav_base, ...).
        self._wav_base = 0
        self._wav_acc: np.ndarray | None = None
        self._wav_wsum: np.ndarray | None = None
        self._finished = False

    # -- internals -----------------------------------------------------------

    def _mel_append(self, mel: np.ndarray) -> None:
        """OLA the windowed patch into the (acc, wsum) pair."""
        b, t, m = mel.shape
        start = self._n_patches * self.hop_t
        end = start + t
        if self._mel_acc is None:
            self._mel_acc = np.zeros((b, 0, m), np.float32)
            self._mel_wsum = np.zeros((0, 1), np.float32)
        have = self._mel_base + self._mel_acc.shape[1]
        if end > have:
            grow = end - have
            self._mel_acc = np.concatenate(
                [self._mel_acc,
                 np.zeros((b, grow, m), np.float32)], axis=1)
            self._mel_wsum = np.concatenate(
                [self._mel_wsum, np.zeros((grow, 1), np.float32)], axis=0)
        lo = start - self._mel_base
        self._mel_acc[:, lo:lo + t] += mel * self._w_mel
        self._mel_wsum[lo:lo + t] += self._w_mel
        self._n_patches += 1

    def _finalize_mel(self, upto: int) -> None:
        """Normalize frames ``[final cursor, upto)`` into the final queue."""
        cut = upto - self._mel_base
        if cut <= 0:
            return
        final = self._mel_acc[:, :cut] / np.maximum(
            self._mel_wsum[:cut], 1e-8)
        self._mel_acc = self._mel_acc[:, cut:]
        self._mel_wsum = self._mel_wsum[cut:]
        self._mel_base = upto
        if self._final_mel is None:
            self._final_base = upto - final.shape[1]
            self._final_mel = final
        else:
            self._final_mel = np.concatenate(
                [self._final_mel, final], axis=1)

    def _vocode_ready(self, total_final: int) -> None:
        """Run every chunk whose frames are final; OLA into the wav pair."""
        while self._next_chunk * self.hop_f + self.chunk_f <= total_final:
            c = self._next_chunk
            lo = c * self.hop_f - self._final_base
            mel = self._final_mel[:, lo:lo + self.chunk_f]
            wav = np.asarray(
                self._chunk_fn(self._voc_params, jnp.asarray(mel)))
            wav = wav * self._w_wav
            b, wl = wav.shape
            start = c * self.hop_f * self.ha
            if self._wav_acc is None:
                self._wav_acc = np.zeros((b, 0), np.float32)
                self._wav_wsum = np.zeros((0,), np.float32)
            have = self._wav_base + self._wav_acc.shape[1]
            if start + wl > have:
                grow = start + wl - have
                self._wav_acc = np.concatenate(
                    [self._wav_acc, np.zeros((b, grow), np.float32)], axis=1)
                self._wav_wsum = np.concatenate(
                    [self._wav_wsum, np.zeros((grow,), np.float32)])
            w_lo = start - self._wav_base
            self._wav_acc[:, w_lo:w_lo + wl] += wav
            self._wav_wsum[w_lo:w_lo + wl] += self._w_wav
            self._next_chunk += 1
            # Frames consumed forever (no later chunk reaches below the
            # next chunk's start) can leave the final-mel queue.
            drop = self._next_chunk * self.hop_f - self._final_base
            if drop > 0:
                self._final_mel = self._final_mel[:, drop:]
                self._final_base += drop

    def _emit_wav(self, upto_samples: int) -> np.ndarray:
        cut = upto_samples - self._wav_base
        if self._wav_acc is None or cut <= 0:
            b = 1 if self._mel_acc is None else self._mel_acc.shape[0]
            return np.zeros((b, 0), np.float32)
        out = self._wav_acc[:, :cut] / np.maximum(
            self._wav_wsum[:cut], 1e-8)
        self._wav_acc = self._wav_acc[:, cut:]
        self._wav_wsum = self._wav_wsum[cut:]
        self._wav_base = upto_samples
        return out.astype(np.float32)

    # -- public API ----------------------------------------------------------

    def feed(self, z: jax.Array) -> np.ndarray:
        """One latent patch ``[B, Z]`` in; newly-final audio ``[B, S]`` out."""
        assert not self._finished, "stream already finished"
        mel = np.asarray(self._patch_fn(self._sg_params, jnp.asarray(z)))
        self._mel_append(mel)
        # Patch i finalizes mel frames < (i+1) * hop_t.
        self._finalize_mel(self._n_patches * self.hop_t)
        self._vocode_ready(self._final_base + (
            0 if self._final_mel is None else self._final_mel.shape[1]))
        # Sample s is final once no future chunk can touch it.
        return self._emit_wav(self._next_chunk * self.hop_f * self.ha)

    def finish(self) -> np.ndarray:
        """Flush: remaining crossfade tail, trimmed exactly like
        ``generate_long`` (usable frames only), then the last chunks."""
        assert not self._finished, "stream already finished"
        self._finished = True
        t_long = self._n_patches * self.hop_t + self.cf
        usable = t_long - (t_long - self.chunk_f) % self.hop_f
        self._finalize_mel(min(usable, t_long))
        self._vocode_ready(usable)
        n_chunks = self._next_chunk
        total = (n_chunks - 1) * self.hop_f * self.ha + \
            self.chunk_f * self.ha if n_chunks else 0
        return self._emit_wav(total)
