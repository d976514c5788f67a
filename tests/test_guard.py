"""Collapse-guard tests against the COMMITTED round-3 run histories.

The guard's value claim is concrete: it must fire early on both real
iSTFT-head collapse runs and never fire across the full healthy run.
"""

import json
from pathlib import Path

import pytest

from music_synthesis_tpu.train.guard import CollapseGuard, GuardConfig

RUNS = Path(__file__).resolve().parents[1] / "runs"


def replay(run: str):
    g = CollapseGuard()
    for line in (RUNS / run / "metrics.jsonl").read_text().splitlines():
        m = json.loads(line)
        reason = g.update(int(m["step"]), m)
        if reason:
            return int(m["step"]), reason
    return None, None


@pytest.mark.parametrize("run", ["stage2_istft_50k", "stage2_istft_warm_50k"])
def test_fires_early_on_real_collapses(run):
    step, reason = replay(run)
    assert reason is not None, f"{run}: guard never fired"
    # Both collapses were unrecoverable well before 15k; firing by then
    # saves >70% of a 50k-step run.
    assert step <= 15000, (run, step, reason)


@pytest.mark.parametrize("run", ["stage1_30k", "stage1_tempered"])
def test_fires_on_round2_stage1_failures(run):
    """Stage-1 path (no g_stft): both round-2 failed composer runs."""
    step, reason = replay(run)
    assert reason is not None and step <= 4000, (run, step, reason)


@pytest.mark.parametrize(
    "run", ["stage2_50k_fast", "stage2_50k_fp32", "stage2_energy_50k",
            "stage2_200k_decay", "stage1_composer_40k", "stage1_flux_40k"])
def test_silent_on_healthy_runs(run):
    step, reason = replay(run)
    assert reason is None, (run, step, reason)


def test_min_step_suppresses_startup_transients():
    g = CollapseGuard(GuardConfig(window=2, min_step=100))
    # Startup often looks collapsed for a few logs (D warmup, G frozen).
    for s in (1, 10, 50):
        assert g.update(s, {"d_loss": 0.0, "g_adv": 99.0, "g_stft": 5.0}) is None
    assert g.update(200, {"d_loss": 0.0, "g_adv": 99.0, "g_stft": 5.0})


def test_single_spike_does_not_trigger():
    g = CollapseGuard(GuardConfig(window=5, min_step=0))
    healthy = {"d_loss": 2.0, "g_adv": 9.0, "g_stft": 2.0}
    for s in range(5):
        assert g.update(s, healthy) is None
    assert g.update(6, {"d_loss": 0.0, "g_adv": 99.0, "g_stft": 2.0}) is None
    for s in range(7, 10):
        assert g.update(s, healthy) is None
