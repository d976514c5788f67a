"""Phase-aware (complex-STFT) MRD input mode (MRDConfig.input_mode).

Why: every trained vocoder carries ~1.8x the phase jitter of real audio
(docs/DESIGN.md §15/§16) and the log-magnitude MRD is blind to phase by
construction. input_mode="complex" feeds the compressed complex STFT as
[Re, Im] channels so the adversarial gradient sees phase. These tests pin:
(1) the default path is untouched, (2) the complex head actually separates
signals that are magnitude-identical but phase-different, (3) the F-folded
MXU lowering stays math-identical with 2 input channels, (4) gradients flow.

Reference citation: the mount is empty (SURVEY.md §0); the reference's
MelGAN-family MRD is magnitude-only — this is a deliberate extension,
off by default.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.config import TINY
from music_synthesis_tpu.models.discriminators import (
    MultiResSTFTDiscriminator,
    STFTDiscriminator,
)


def _wav(key=0, b=2, n=2048):
    return jax.random.normal(jax.random.PRNGKey(key), (b, n)) * 0.3


def test_complex_mode_shapes_finite():
    cfg = dataclasses.replace(
        TINY.mrd, resolutions=((512, 128, 512),), channels=8,
        input_mode="complex",
    )
    m = MultiResSTFTDiscriminator(cfg)
    wav = _wav()
    params = m.init(jax.random.PRNGKey(1), wav)["params"]
    logits, feats = m.apply({"params": params}, wav)
    assert len(logits) == 1 and len(feats[0]) == 5
    for l in logits:
        assert l.shape[0] == 2 and l.shape[-1] == 1
        assert bool(jnp.isfinite(l).all())
    for f in feats[0]:
        assert bool(jnp.isfinite(f).all())
    # conv_0 sees 2 input channels (Re, Im) — the one param-shape change.
    assert params["res_512"]["conv_0"]["v"].shape[2] == 2


def test_phase_sensitivity_logmag_blind_complex_not():
    """-x has exactly the same |STFT| as x (S -> -S), so the log-magnitude
    head CANNOT distinguish them; the complex head must."""
    wav = _wav()
    base = dataclasses.replace(
        TINY.mrd, resolutions=((512, 128, 512),), channels=8
    )
    m_mag = MultiResSTFTDiscriminator(base)
    p_mag = m_mag.init(jax.random.PRNGKey(1), wav)["params"]
    l_pos, _ = m_mag.apply({"params": p_mag}, wav)
    l_neg, _ = m_mag.apply({"params": p_mag}, -wav)
    np.testing.assert_array_equal(np.asarray(l_pos[0]), np.asarray(l_neg[0]))

    m_cpx = MultiResSTFTDiscriminator(
        dataclasses.replace(base, input_mode="complex")
    )
    p_cpx = m_cpx.init(jax.random.PRNGKey(1), wav)["params"]
    c_pos, _ = m_cpx.apply({"params": p_cpx}, wav)
    c_neg, _ = m_cpx.apply({"params": p_cpx}, -wav)
    diff = float(jnp.abs(c_pos[0] - c_neg[0]).max())
    scale = float(jnp.abs(c_pos[0]).max())
    # Fresh-init logits are tiny; what matters is a reaction well above
    # numerical noise RELATIVE to the logit scale (logmag's is exactly 0).
    assert diff > 1e-2 * scale and diff > 1e-6, (
        f"complex head did not react to a pure phase flip: "
        f"diff={diff} scale={scale}"
    )


def test_complex_f_fold_parity():
    """F-space-to-depth lowering with 2 input channels: same params ->
    same logits/features as the unfolded complex path (odd F = 257,
    stride-2 boundaries)."""
    wav = _wav()
    cfg_u = dataclasses.replace(
        TINY.mrd, resolutions=((512, 128, 512),), channels=8,
        input_mode="complex",
    )
    cfg_f = dataclasses.replace(cfg_u, f_fold=4)
    m_u = MultiResSTFTDiscriminator(cfg_u)
    m_f = MultiResSTFTDiscriminator(cfg_f)
    params = m_u.init(jax.random.PRNGKey(1), wav)["params"]
    params_f = m_f.init(jax.random.PRNGKey(2), wav)["params"]
    assert jax.tree.map(jnp.shape, params) == jax.tree.map(
        jnp.shape, params_f
    )
    lu, fu = m_u.apply({"params": params}, wav)
    lf, ff = m_f.apply({"params": params}, wav)
    for a, b in zip(lu, lf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        fu, ff,
    )


def test_complex_mode_gradients_flow():
    """Grad wrt the waveform (R1 path) and wrt params both finite and
    nonzero — the compressed-complex input must not kill gradients at
    quiet bins (the |S|^(p-1) factor is eps-floored)."""
    cfg = dataclasses.replace(
        TINY.mrd, resolutions=((512, 128, 512),), channels=8,
        input_mode="complex",
    )
    m = MultiResSTFTDiscriminator(cfg)
    wav = _wav() * 1e-3  # near-silent: the regime where compression blows up
    params = m.init(jax.random.PRNGKey(1), wav)["params"]

    def loss_wav(w):
        logits, _ = m.apply({"params": params}, w)
        return sum(jnp.mean(l) for l in logits)

    g_wav = jax.grad(loss_wav)(wav)
    assert bool(jnp.isfinite(g_wav).all())
    assert float(jnp.abs(g_wav).max()) > 0

    def loss_params(p):
        logits, _ = m.apply({"params": p}, wav)
        return sum(jnp.mean(l) for l in logits)

    g_p = jax.grad(loss_params)(params)
    leaves = jax.tree.leaves(g_p)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_logmag_default_unchanged():
    """The default config still builds the 1-channel log-magnitude head
    (param shapes identical to round-3 checkpoints)."""
    cfg = dataclasses.replace(
        TINY.mrd, resolutions=((512, 128, 512),), channels=8
    )
    assert cfg.input_mode == "logmag"
    wav = _wav()
    params = MultiResSTFTDiscriminator(cfg).init(
        jax.random.PRNGKey(1), wav
    )["params"]
    assert params["res_512"]["conv_0"]["v"].shape[2] == 1


def test_unknown_input_mode_raises():
    d = STFTDiscriminator(512, 128, 512, channels=8, input_mode="nope")
    try:
        d.init(jax.random.PRNGKey(0), _wav())
    except ValueError as e:
        assert "input_mode" in str(e)
    else:
        raise AssertionError("expected ValueError for unknown input_mode")
