#!/usr/bin/env python
"""Copy-synthesis: WAV -> log-mel -> vocoder -> WAV, with fidelity metric.

The standard vocoder-quality check: resynthesize real audio from its own
mel features and report the multi-res STFT distance to the original.

  python scripts/vocode.py input.wav --stage2 runs/stage2/ckpt --out resynth.wav
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--stage2", default=None, help="stage-2 ckpt dir")
    ap.add_argument("--griffin-lim", action="store_true",
                    help="model-free DSP vocoder (ops/griffin_lim.py) "
                         "instead of the neural one")
    ap.add_argument("--gl-iters", type=int, default=48)
    ap.add_argument("--out", default="resynth.wav")
    ap.add_argument("--device", choices=["cpu", "default"], default="default")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from music_synthesis_tpu.config import E2E_INFERENCE
    from music_synthesis_tpu.losses.stft_loss import multires_stft_loss
    from music_synthesis_tpu.models.vocoder import Vocoder
    from music_synthesis_tpu.train import stage2
    from music_synthesis_tpu.train.checkpoint import CheckpointManager
    from music_synthesis_tpu.utils.wav import load_wav, write_wav

    cfg = E2E_INFERENCE
    wav = load_wav(args.input, cfg.frontend.sample_rate)
    # Trim to a hop multiple so conditioning aligns exactly.
    hop = cfg.frontend.hop_length
    wav = wav[: len(wav) // hop * hop]
    x = jnp.asarray(wav)[None]

    if args.griffin_lim:
        from music_synthesis_tpu.ops.frontend import log_mel_for_vocoder
        from music_synthesis_tpu.ops.griffin_lim import invert_log_mel

        @jax.jit
        def copy_synth(wav_in):
            mel = log_mel_for_vocoder(wav_in, cfg.frontend)
            return invert_log_mel(mel, cfg.frontend, args.gl_iters)
    else:
        if args.stage2:
            from music_synthesis_tpu.train.checkpoint import abstract_state

            g2 = CheckpointManager(args.stage2).restore(
                abstract_state(cfg, stage=2)
            ).g_params
        else:
            g2 = Vocoder(cfg.vocoder).init(
                jax.random.PRNGKey(1), jnp.zeros((1, 8, cfg.vocoder.n_mels))
            )["params"]
            print("note: untrained vocoder (no --stage2); "
                  "output is noise-like")

        @jax.jit
        def copy_synth(wav_in):
            mel = stage2.conditioning_mel(wav_in, cfg)
            return Vocoder(cfg.vocoder).apply({"params": g2}, mel)

    y = copy_synth(x)
    dist = float(multires_stft_loss(y, x, cfg.stft_loss))
    print(f"resynthesized {y.shape[1]} samples; "
          f"multires_stft_distance vs input = {dist:.4f}")
    write_wav(args.out, cfg.frontend.sample_rate, np.asarray(y[0]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
