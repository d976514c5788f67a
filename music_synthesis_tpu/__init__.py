"""TPU-native two-stage GAN music-synthesis framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capability surface of the
public research repo JohnVinyard/music-synthesis (see SURVEY.md): a fused
Pallas log-mel front-end, a stage-1 latent->spectrogram GAN ("composer"), a
stage-2 MelGAN-style conditioned vocoder trained against multi-scale and
multi-resolution-STFT discriminators, fused chunked inference with
overlap-add, and data-parallel training over an ICI device mesh.

Public API quick reference::

    from music_synthesis_tpu import config, zoo
    from music_synthesis_tpu.ops.frontend import log_mel
    from music_synthesis_tpu.ops.pallas_frontend import pallas_log_mel
    from music_synthesis_tpu.ops.griffin_lim import invert_log_mel
    from music_synthesis_tpu.train import stage1, stage2
    from music_synthesis_tpu.infer.generate import generate, generate_long
    from music_synthesis_tpu.infer.stream import StreamingSynth
    from music_synthesis_tpu.infer.latent import latent_path, latent_walk
    from music_synthesis_tpu.serve import SynthService, make_server
"""

from music_synthesis_tpu import config

__version__ = "0.1.0"
__all__ = ["config", "__version__"]
