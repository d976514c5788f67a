"""Anti-wrapping phase-coherence loss tests (losses/phase_loss.py).

The loss exists because the judged multi-res STFT metric is magnitude-only
(losses/stft_loss.py) and the trained vocoders carry ~1.8x real phase
jitter (DESIGN.md §15/§16) — so these tests check exactly the properties
that make it a usable training signal: zero at identity, sensitive to pure
phase corruption that leaves magnitudes (and thus the judged metric)
nearly fixed, smooth finite gradients, and DP-exactness under shard_map.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import PartitionSpec as P

from music_synthesis_tpu.config import TINY, PipelineConfig, TrainConfig
from music_synthesis_tpu.losses.phase_loss import phase_coherence_loss
from music_synthesis_tpu.parallel.mesh import make_mesh
from music_synthesis_tpu.train import stage2

try:
    shard_map = jax.shard_map
except AttributeError:  # older jax
    from jax.experimental.shard_map import shard_map

SR = 16000
L = 4096


def _tone(f=440.0, phase_noise=0.0, seed=0):
    """Steady sine; phase_noise > 0 adds a random-walk phase (jitter)."""
    t = jnp.arange(L) / SR
    phi = 2 * jnp.pi * f * t
    if phase_noise > 0:
        dphi = phase_noise * jax.random.normal(jax.random.PRNGKey(seed), (L,))
        phi = phi + jnp.cumsum(dphi)
    return jnp.sin(phi)


def test_identity_is_zero():
    x = _tone()
    loss = phase_coherence_loss(x, x, n_fft=256, hop_length=64)
    assert float(loss) < 1e-5


def test_detects_pure_phase_corruption():
    """Random-walk phase keeps the magnitude envelope ~fixed but must score
    far above a small additive-noise control (the metric's whole point)."""
    clean = _tone()
    jittered = _tone(phase_noise=0.15, seed=1)
    control = clean + 1e-3 * jax.random.normal(jax.random.PRNGKey(2), (L,))
    l_jit = float(phase_coherence_loss(jittered, clean, 256, 64))
    l_ctl = float(phase_coherence_loss(control, clean, 256, 64))
    assert l_jit > 10 * l_ctl
    assert l_jit > 0.05


def test_gradient_finite_and_nonzero():
    clean = _tone()
    jittered = _tone(phase_noise=0.1, seed=3)
    g = jax.grad(
        lambda q: phase_coherence_loss(q, clean, 256, 64))(jittered)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0

    # Silence vs signal: the eps guard must keep the gradient finite even
    # where the generated STFT magnitude is ~0.
    g0 = np.asarray(jax.grad(
        lambda q: phase_coherence_loss(q, clean, 256, 64)
    )(jnp.zeros(L)))
    assert np.all(np.isfinite(g0))


@pytest.mark.slow
def test_shard_map_dp_exact():
    """psum'd num/den + N-times grad pre-scale == single-device value/grad."""
    kx, ky = jax.random.split(jax.random.PRNGKey(7))
    x = 0.3 * jnp.tanh(jax.random.normal(kx, (8, 2048)))
    y = 0.3 * jnp.tanh(jax.random.normal(ky, (8, 2048)))

    # Gradient wrt a REPLICATED parameter (a scalar gain on the generated
    # signal), mirroring the training step: per-device grads of the global
    # loss are pmean'd — the N-times pre-scale must make that equal the
    # single-device gradient.
    a0 = jnp.float32(1.1)
    ref_loss = phase_coherence_loss(a0 * x, y, 256, 64)
    ref_grad = jax.grad(
        lambda a: phase_coherence_loss(a * x, y, 256, 64))(a0)

    mesh = make_mesh((8,), ("data",))

    def per_device(xs, ys):
        loss = phase_coherence_loss(a0 * xs, ys, 256, 64, axis_name="data")
        grad = jax.grad(lambda a: phase_coherence_loss(
            a * xs, ys, 256, 64, axis_name="data"))(a0)
        return loss, jax.lax.pmean(grad, "data")

    sm_loss, sm_grad = jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=(P(), P()),
        # Same setting as the production DP paths (parallel/shard_map_dp.py):
        # the fft primitive's vjp trips jax's varying-spec checker.
        check_vma=False,
    ))(x, y)

    np.testing.assert_allclose(
        float(ref_loss), float(sm_loss), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(ref_grad), float(sm_grad), rtol=2e-4, atol=1e-7)


def test_stage2_step_with_phase_loss():
    """lambda_phase > 0 wires into the jitted step; g_phase finite."""
    cfg = PipelineConfig(
        frontend=TINY.frontend, specgan=TINY.specgan, vocoder=TINY.vocoder,
        msd=TINY.msd, mrd=TINY.mrd, stft_loss=TINY.stft_loss,
        infer=TINY.infer,
        train=TrainConfig(
            batch_size=2, segment_length=2048,
            lambda_phase=5.0, phase_n_fft=256, phase_hop=64,
        ),
    )
    wav = 0.5 * jnp.tanh(jax.random.normal(jax.random.PRNGKey(1), (2, 2048)))
    state = stage2.make_train_state(cfg, jax.random.PRNGKey(0))
    state, metrics = stage2.train_step(cfg, state, wav)
    assert "g_phase" in metrics
    assert np.isfinite(float(metrics["g_phase"]))
    assert float(metrics["g_phase"]) >= 0