"""Configuration for the TPU-native two-stage music-synthesis framework.

Frozen dataclasses, one per subsystem, plus named presets mirroring the five
judged BASELINE configs (BASELINE.json:6-12, SURVEY.md §5.6).

Reference-parity note (SURVEY.md §0): the reference mount was empty, so every
hyperparameter that is a *recollection* rather than a spec item is a plain
config knob here — re-verifying against the real reference is a config change,
not a rewrite (SURVEY.md §7 "Hard parts" #6).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Audio feature front-end: framing -> STFT -> mel -> log.

    Spec: 22.05 kHz, n_fft=1024, hop=256 (BASELINE.json:7, SURVEY.md C2-C5).
    """

    sample_rate: int = 22_050
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 256
    n_mels: int = 128
    fmin: float = 0.0
    fmax: float | None = None  # None -> sr / 2
    power: float = 2.0  # 2.0 = power spectrogram, 1.0 = magnitude
    log_epsilon: float = 1e-5
    center: bool = False  # vocoder conditioning uses same-pad framing instead
    # Padding applied before framing so that n_frames == n_samples // hop.
    # (n_fft - hop) // 2 on each side, reflect mode.
    pad_mode: str = "reflect"

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def fmax_resolved(self) -> float:
        return self.fmax if self.fmax is not None else self.sample_rate / 2.0


@dataclasses.dataclass(frozen=True)
class MelScaler:
    """Affine map between log-mel space and the GAN's [-1, 1] working range.

    normalize(x) = (x - shift) / scale ; denormalize is the inverse.
    Defaults chosen for log(1e-5 + power-mel) of unit-scale audio.
    """

    shift: float = -5.0
    scale: float = 7.0


@dataclasses.dataclass(frozen=True)
class SpecGANConfig:
    """Stage-1 low-resolution spectrogram generator + discriminator (C6, C7)."""

    latent_dim: int = 128
    n_mels: int = 128
    n_frames: int = 128  # generated patch length in frames (~1.5 s @ hop 256)
    base_channels: int = 512
    upsample_factors: Tuple[int, ...] = (4, 2, 2)  # 8 -> 16 -> ... -> n_frames
    initial_frames: int = 8  # n_frames // prod(upsample_factors)
    res_dilations: Tuple[int, ...] = (1, 3)
    disc_channels: Tuple[int, ...] = (128, 256, 512, 512)
    disc_kernel: int = 5
    disc_strides: Tuple[int, ...] = (2, 2, 2, 2)
    leaky_slope: float = 0.2
    use_weight_norm: bool = True
    compute_dtype: str = "float32"  # "bfloat16" for MXU-native mixed precision
    # Anti-saturation knobs (docs/DESIGN.md §10). out_init_gain moderates the
    # output conv's init std; out_temperature returns tanh(T*x) so the
    # linear region covers pre-activations up to ~1/T (T<1 delays the
    # measured saturation-freeze cascade). Defaults preserve the faithful
    # recipe.
    out_init_gain: float = 1.0
    out_temperature: float = 1.0
    # Weight init for ALL SpecGAN layers (G latent projection, upsample,
    # residual and output convs, D downsampling convs). "dcgan" = N(0, 0.02)
    # — measured end-to-end G gain ~1e-5 at default widths, i.e. a
    # near-silent start whose adversarial sprint into tanh saturation is the
    # root of the stage-1 freeze cascade (docs/DESIGN.md §10). "he" =
    # N(0, sqrt(2/fan_in)) per layer — the exact cure that fixed the
    # vocoder's amplitude pathology: G *starts* at real-mel-like amplitude
    # so the climb phase never happens. Combine with out_init_gain to place
    # the init output rms inside tanh's linear region.
    init_scheme: str = "dcgan"
    # Init-std multiplier on each residual block's branch-output conv
    # (fixup-style near-identity start under 'he'; see VocoderConfig).
    res_init_gain: float = 1.0


@dataclasses.dataclass(frozen=True)
class VocoderConfig:
    """Stage-2 MelGAN-style conditioned vocoder (C8, SURVEY.md §2 / P:5-9).

    Total upsampling = prod(upsample_factors) must equal the front-end hop.
    """

    n_mels: int = 128
    base_channels: int = 512
    upsample_factors: Tuple[int, ...] = (8, 8, 2, 2)  # 8*8*2*2 = 256 = hop
    res_dilations: Tuple[int, ...] = (1, 3, 9)
    input_kernel: int = 7
    output_kernel: int = 7
    res_kernel: int = 3
    leaky_slope: float = 0.2
    use_weight_norm: bool = True
    compute_dtype: str = "float32"  # "bfloat16" for MXU-native mixed precision
    # Weight init: "dcgan" = N(0, 0.02), the MelGAN-family recipe (end-to-end
    # generator gain ~1e-5 at default widths -> near-silent start, see
    # docs/DESIGN.md §8); "he" = N(0, sqrt(2/fan_in)), per-layer gain ~1 ->
    # healthy output amplitude from step 0.
    init_scheme: str = "dcgan"
    # Extra init-std multiplier on the OUTPUT conv only. With 'he' the
    # generator's init output lands in tanh's saturated region (rms ~0.7,
    # measured: gradients vanish and training pins loud); 0.1 starts it at
    # moderate amplitude inside the linear region. The multiplier applies
    # under BOTH schemes (std = gain * init_scale for 'dcgan' too — stage 1
    # uses it with dcgan deliberately); the stage-2 presets simply keep it
    # at 1.0 under 'dcgan'.
    out_init_gain: float = 1.0
    # Init-std multiplier on each residual block's branch-output conv.
    # Residual addition doubles activation variance per block, which defeats
    # per-layer-normalized init in deep stacks; a small value starts blocks
    # near identity (fixup-style) so the trunk gain stays ~1 under 'he'.
    res_init_gain: float = 1.0
    # "transpose": ConvTranspose1d(k=2u, stride=u) — the reference family's
    # choice. "repeat": nearest-neighbor repeat + Conv1d(k=2u+1) — same
    # receptive field, different lowering; pick by profile (SURVEY.md §7 #2).
    upsample_mode: str = "transpose"
    # Output head. "waveform": conv to 1 channel + tanh (MelGAN-faithful).
    # "istft": predict magnitude/phase and inverse-STFT (iSTFTNet-style,
    # PAPERS.md) — skips the lane-starved low-channel upsampling stages that
    # dominate TPU time; use upsample_factors whose product * istft_hop
    # equals the front-end hop (e.g. (8, 8) with istft_hop=4).
    head: str = "waveform"
    istft_n_fft: int = 16
    istft_hop: int = 4

    @property
    def hop_length(self) -> int:
        out = 1
        for u in self.upsample_factors:
            out *= u
        if self.head == "istft":
            out *= self.istft_hop
        return out


@dataclasses.dataclass(frozen=True)
class MSDConfig:
    """Multi-scale raw-audio discriminators (C9): K scales of strided convs."""

    n_scales: int = 3
    downsample_factor: int = 2  # avg-pool between scales
    channels: Tuple[int, ...] = (16, 64, 256, 1024, 1024)
    kernel: int = 41
    strides: Tuple[int, ...] = (4, 4, 4, 4)
    groups: Tuple[int, ...] = (4, 16, 64, 256)
    input_kernel: int = 15
    post_kernel: int = 5
    output_kernel: int = 3
    leaky_slope: float = 0.2
    use_weight_norm: bool = True
    compute_dtype: str = "float32"
    # Run grouped downsampling convs with groups <= this threshold as ONE
    # dense conv over a block-diagonal kernel (ops/conv.py dense_groups).
    # Bit-identical math; trades G x FLOPs for dense MXU tiling. Measured
    # (runs/trace_stage2): the grouped convs are 39% of the stage-2 step at
    # 4 channels/group. 0 = always grouped (reference-shaped lowering).
    dense_groups_max_g: int = 0


@dataclasses.dataclass(frozen=True)
class MRDConfig:
    """Multi-resolution STFT discriminators (C10): 2-D convs on log|STFT|."""

    resolutions: Tuple[Tuple[int, int, int], ...] = (
        # (n_fft, hop, win_length)
        (512, 128, 512),
        (1024, 256, 1024),
        (2048, 512, 2048),
    )
    channels: int = 32
    leaky_slope: float = 0.2
    use_weight_norm: bool = True
    compute_dtype: str = "float32"
    # F-axis space-to-depth factor for the conv stack (ops/conv.py
    # FFoldedWNConv2d). 0/1 = off (reference-shaped lowering). 4 folds the
    # 32-channel (3,9) convs into 128-channel (3,3..4) convs — full MXU
    # lanes; same parameters, same math (checkpoints interchange), measured
    # motivation in docs/DESIGN.md §11.
    f_fold: int = 0
    # Head input representation. "logmag" (default, reference-shaped) feeds
    # log|STFT| — blind to phase by construction, which is why every trained
    # vocoder carries ~1.8x the phase jitter of real audio (DESIGN.md §15).
    # "complex" feeds the power-law-compressed complex STFT as two channels,
    # [Re, Im] of |S|^p * e^{i*phase} — magnitude-bounded but phase-exact, so
    # the adversarial gradient penalizes incoherent phase directly (the
    # Encodec/DAC-style complex spectral D; PAPERS.md). Changes conv_0's
    # input-channel count: checkpoints do NOT interchange between modes.
    input_mode: str = "logmag"
    # Magnitude-compression exponent p for input_mode="complex".
    complex_compression: float = 0.3


@dataclasses.dataclass(frozen=True)
class STFTLossConfig:
    """Multi-resolution STFT distance (C13) — also the judged parity metric."""

    resolutions: Tuple[Tuple[int, int, int], ...] = (
        (512, 128, 512),
        (1024, 256, 1024),
        (2048, 512, 2048),
    )
    eps: float = 1e-7


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """GAN training orchestration (C14-C16)."""

    batch_size: int = 16
    segment_length: int = 8192  # samples per training segment (32 frames)
    # Host-side waveform augmentation (random gain + polarity per segment,
    # data/dataset.py): label-free corpus multiplier for the data-bound
    # fidelity plateau (DESIGN.md §13). Off = reference-faithful pipeline.
    augment: bool = False
    g_lr: float = 1e-4
    d_lr: float = 1e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.9
    # Exponential lr decay: lr(t) = lr * lr_decay_rate^(t / lr_decay_every).
    # 1.0 = constant lr (reference-faithful default). Measured motivation
    # (ROADMAP perf lead 3): constant-lr fidelity drifts after ~50k steps.
    lr_decay_rate: float = 1.0
    lr_decay_every: int = 1000
    # Global-norm gradient clipping (0 = off). GAN steps on small corpora
    # show grad norms in the hundreds; clip stabilizes without changing the
    # reference recipe when off.
    grad_clip_norm: float = 0.0
    # Rematerialize the generator forward in the G step (jax.checkpoint):
    # trades ~1 extra G forward for not storing its activations — headroom
    # for long segments / big batches on a 16 GB chip.
    remat_generator: bool = False
    # Generator EMA decay (0 = off). When on, GANState.g_ema tracks
    # ema = decay * ema + (1 - decay) * g_params each step; inference and
    # audio dumps should read g_ema (train scripts do).
    ema_decay: float = 0.0
    # Reuse the D(real) feature taps from the D update (pre-update D params)
    # for the G step's feature-matching target instead of re-running D(real)
    # under the updated D. Saves one full discriminator forward per step;
    # the FM target features differ by one optimizer step of D drift.
    reuse_real_features: bool = False
    # Run the D step's real and fake passes as ONE forward on the
    # concatenated [2B] batch (stage 2). Identical per-sample math (convs
    # are batch-independent); doubles the GEMM M-dimension and halves the
    # fusion/dispatch count for every discriminator layer — the
    # discriminators are 80% of the measured step (runs/trace_stage2).
    concat_disc_batch: bool = False
    # Adversarial objective: "hinge" (MelGAN-family default) or "nonsat"
    # (StyleGAN-style logistic — no flat regions, so neither player's
    # gradient can vanish entirely; fixes the measured stage-1 total freeze,
    # losses/gan.py nonsat_d_loss docstring).
    gan_loss: str = "hinge"
    # Instance noise: stddev of Gaussian noise added to BOTH real and fake
    # discriminator inputs (stage 1: normalized-mel units; stage 2:
    # waveform units — the anti-collapse lever for the iSTFT head,
    # DESIGN.md §13). Classic GAN
    # stabilizer: D can never separate the distributions perfectly, so its
    # loss keeps a floor and its gradients stay informative — prevents the
    # measured D-perfect-separation -> G-saturation freeze cascade
    # (runs/stage1_frozen_aborted). 0 = off.
    d_input_noise: float = 0.0
    # Linear decay horizon for the instance noise: sigma(step) =
    # d_input_noise * max(0, 1 - step / d_noise_decay_steps). 0 = constant
    # noise. The schedule is traced on state.step (jnp), so both phases
    # share one compiled program. Standard instance-noise practice: the
    # stabilizer is only needed early, and a constant sigma biases the
    # equilibrium (D models the noised distribution forever).
    d_noise_decay_steps: int = 0
    # R1 gradient penalty on the discriminator (StyleGAN-family):
    # + r1_gamma/2 * E[||grad_x D(x)||^2] on REAL inputs every D step.
    # Bounds D's input-gradient norm, so D cannot sharpen into the
    # infinite-slope decision boundary that drives G's tanh-saturation
    # sprint (docs/DESIGN.md §10). 0 = off. Applied to the same (possibly
    # noised) real batch D classifies. Works in both stages (stage 2: one
    # extra backward through the MSD+MRD ensemble).
    r1_gamma: float = 0.0
    lambda_feature_matching: float = 10.0
    lambda_stft: float = 2.5
    # Frame-energy L1 between fake and real waveforms (stage 2, linear
    # amplitude, hop-sized frames). Measured motivation (ROADMAP quality
    # lead): trained vocoders render structurally correct audio ~10x
    # quieter than real while the spectral losses keep improving — an
    # explicit energy term targets the sag directly. 0 = off
    # (reference-faithful default).
    lambda_energy: float = 0.0
    # Temporal-flux profile matching (stage 1 only). Measured motivation
    # (DESIGN.md §12): the trained composer matches the corpus marginals
    # (bin-mean L2 0.070) but its temporal flux is ~2.3x real — generated
    # spectrograms flicker. This term L1-matches the per-mel-bin mean
    # |frame-to-frame difference| profile of the fakes to the real batch's
    # (stop-gradient target), a direct differentiable pull on the texture
    # statistic the eval measures. 0 = off (reference-faithful default).
    lambda_flux: float = 0.0
    # Anti-wrapping phase-coherence loss (stage 2 only; losses/phase_loss.py).
    # Measured motivation (DESIGN.md §15/§16): every trained vocoder carries
    # ~1.8x the inter-frame phase jitter of real audio and the judged
    # magnitude-only metric cannot see it; the iSTFT head's explicit phase
    # channels make it directly optimizable. IF+GD anti-wrapped cosine terms
    # at (phase_n_fft, phase_hop) — the phase-jitter metric's own scale.
    # 0 = off (reference-faithful default: the reference has no phase term).
    lambda_phase: float = 0.0
    phase_n_fft: int = 1024
    phase_hop: int = 256
    # ParallelWaveGAN-style generator warmup (stage 2 only): for the first N
    # steps the generator trains on the multi-res STFT loss alone and the
    # discriminator update is masked. The gate is traced on state.step — one
    # compiled program covers both phases, no recompile at the boundary.
    # 0 = off. CAVEAT (measured; docs/DESIGN.md §8): for the deterministic
    # mel-only vocoder a phase-invariant warmup collapses the generator to
    # silence and cannot escape it — use only with a noise-excited generator;
    # the default adversarial-from-step-0 recipe is correct here.
    g_warmup_steps: int = 0
    seed: int = 0
    checkpoint_every: int = 1000
    log_every: int = 50
    # Use the fused Pallas front-end kernel for conditioning mel inside the
    # train step (TPU single-chip; the pure-JAX oracle is used on CPU and in
    # the jit-sharded DP path until the shard_map migration).
    use_pallas_frontend: bool = False
    # distribution
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("data",)


@dataclasses.dataclass(frozen=True)
class InferConfig:
    """Fused two-stage inference (C17, C18)."""

    chunk_frames: int = 64  # mel frames per vocoder chunk
    hop_frames: int = 32  # chunk advance; overlap = chunk - hop frames


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Everything bundled — one object describes a full experiment."""

    frontend: FrontendConfig = FrontendConfig()
    mel_scaler: MelScaler = MelScaler()
    specgan: SpecGANConfig = SpecGANConfig()
    vocoder: VocoderConfig = VocoderConfig()
    msd: MSDConfig = MSDConfig()
    mrd: MRDConfig = MRDConfig()
    stft_loss: STFTLossConfig = STFTLossConfig()
    train: TrainConfig = TrainConfig()
    infer: InferConfig = InferConfig()


# ---------------------------------------------------------------------------
# Named presets for the five judged BASELINE configs (BASELINE.json:6-12).
# ---------------------------------------------------------------------------

#: Config 1 — log-mel extraction of one 22.05 kHz clip on CPU.
FRONTEND_CPU_CLIP = PipelineConfig()

#: Config 2 — stage-1 spectrogram generator forward+loss, single batch.
STAGE1_SINGLE_BATCH = PipelineConfig(train=TrainConfig(batch_size=16))

#: Config 3 — stage-2 vocoder GAN training, single device.
STAGE2_VOCODER_TRAIN = PipelineConfig(train=TrainConfig(batch_size=16))

#: Config 4 — two-stage end-to-end inference with overlap-add.
E2E_INFERENCE = PipelineConfig()

#: Flagship fast-serving variant: iSTFTNet-style vocoder head (PAPERS.md).
#: Replaces the lane-starved final upsampling stages with a spectral head +
#: inverse-STFT-as-GEMM — measured 7.8x faster vocoding on v5e at the same
#: GAN training recipe. The default preset stays reference-faithful.
E2E_INFERENCE_FAST = PipelineConfig(
    vocoder=VocoderConfig(
        upsample_factors=(8, 8),
        head="istft",
        istft_n_fft=16,
        istft_hop=4,
    )
)

#: Config 5 — data-parallel two-stage training on a v5e-8 mesh.
DP_V5E8_TRAIN = PipelineConfig(
    train=TrainConfig(batch_size=64, mesh_shape=(8,), mesh_axes=("data",))
)

# ---------------------------------------------------------------------------
# Config (de)serialization — exact provenance for runs and zoo entries.
#
# Training scripts write the FULL resolved PipelineConfig to
# <run>/config.json; export/eval/generate tools rebuild the identical config
# (including optimizer-state-shaping fields like lr_decay_rate/grad_clip_norm,
# which change the orbax checkpoint pytree) instead of re-deriving it from CLI
# flags. Fixes the round-2 advisor findings on scripts/export_zoo.py.
# ---------------------------------------------------------------------------

_SUBCONFIG_TYPES = {
    "frontend": FrontendConfig,
    "mel_scaler": MelScaler,
    "specgan": SpecGANConfig,
    "vocoder": VocoderConfig,
    "msd": MSDConfig,
    "mrd": MRDConfig,
    "stft_loss": STFTLossConfig,
    "train": TrainConfig,
    "infer": InferConfig,
}


def config_to_dict(cfg: PipelineConfig) -> dict:
    """PipelineConfig -> JSON-safe nested dict (tuples become lists)."""

    def conv(obj):
        if dataclasses.is_dataclass(obj):
            return {
                f.name: conv(getattr(obj, f.name))
                for f in dataclasses.fields(obj)
            }
        if isinstance(obj, (tuple, list)):
            return [conv(x) for x in obj]
        return obj

    return conv(cfg)


def config_from_dict(d: dict) -> PipelineConfig:
    """Inverse of :func:`config_to_dict`.

    Rejects unknown fields (a config written by a newer framework version
    must not be silently truncated into an older one).
    """

    def build(cls, sub: dict):
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(sub) - known
        if unknown:
            raise ValueError(
                f"config dict has fields {sorted(unknown)} not in "
                f"{cls.__name__} — written by a newer framework version?"
            )

        def tup(v):
            return tuple(tup(x) for x in v) if isinstance(v, list) else v

        return cls(**{k: tup(v) for k, v in sub.items()})

    parts = {}
    for name, cls in _SUBCONFIG_TYPES.items():
        if name in d:
            parts[name] = build(cls, d[name])
    extra = set(d) - set(_SUBCONFIG_TYPES)
    if extra:
        raise ValueError(f"unknown PipelineConfig sections: {sorted(extra)}")
    return PipelineConfig(**parts)


#: Tiny preset for unit tests and the multichip dry-run (fast on 1 CPU core).
TINY = PipelineConfig(
    frontend=FrontendConfig(n_mels=32),
    specgan=SpecGANConfig(
        latent_dim=16,
        n_mels=32,
        n_frames=32,
        base_channels=32,
        upsample_factors=(2, 2),
        initial_frames=8,
        res_dilations=(1,),
        disc_channels=(16, 16),
        disc_strides=(2, 2),
    ),
    vocoder=VocoderConfig(
        n_mels=32,
        base_channels=32,
        upsample_factors=(8, 8, 2, 2),
        res_dilations=(1, 3),
    ),
    msd=MSDConfig(
        n_scales=2,
        channels=(4, 8, 8),
        kernel=11,
        strides=(4, 4),
        groups=(2, 2),
        input_kernel=7,
        post_kernel=5,
        output_kernel=3,
    ),
    mrd=MRDConfig(resolutions=((256, 64, 256),), channels=4),
    stft_loss=STFTLossConfig(resolutions=((256, 64, 256), (512, 128, 512))),
    train=TrainConfig(batch_size=2, segment_length=2048),
    infer=InferConfig(chunk_frames=16, hop_frames=8),
)
