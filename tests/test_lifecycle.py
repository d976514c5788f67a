"""Full framework lifecycle in one test: train -> export -> serve.

Drives the real scripts (not library shortcuts): a tiny stage-2 run via
scripts/train_stage2.py, zoo export via scripts/export_zoo.py, then a
SynthService serving the exported entry. This is the path a user takes
from corpus to production endpoint.
"""

import importlib.util
import pytest
import json
import sys
from pathlib import Path

import jax
import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _run_script(name, argv, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        name, REPO / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [f"{name}.py"] + argv)
    mod.main()


@pytest.mark.slow
def test_train_export_serve(tmp_path, monkeypatch):
    run = tmp_path / "run"
    zoo_root = tmp_path / "zoo"

    _run_script("train_stage2", [
        "--preset", "tiny", "--steps", "6", "--batch", "2",
        "--segment", "2048", "--ema", "0.999", "--auto-mel-stats",
        "--ckpt-every", "3", "--log-every", "3", "--prefetch", "0",
        "--outdir", str(run),
    ], monkeypatch)
    assert (run / "ckpt").exists() and (run / "mel_stats.json").exists()

    # Checkpoint averaging consumes and produces the same run layout.
    avg = tmp_path / "run_avg"
    _run_script("average_ckpts", [
        "--run", str(run), "--steps", "3,6", "--out", str(avg),
    ], monkeypatch)
    assert (avg / "ckpt").exists() and (avg / "config.json").exists()

    from music_synthesis_tpu.config import config_from_dict
    from music_synthesis_tpu.train.checkpoint import (
        CheckpointManager, abstract_state)

    cfg_run = config_from_dict(json.loads((run / "config.json").read_text()))
    tpl = abstract_state(cfg_run, stage=2)
    s3 = CheckpointManager(run / "ckpt").restore(tpl, step=3)
    s6 = CheckpointManager(run / "ckpt").restore(tpl, step=6)
    sa = CheckpointManager(avg / "ckpt").restore(tpl)
    a_leaf = jax.tree.leaves(sa.g_params)[0]
    np.testing.assert_allclose(
        a_leaf,
        0.5 * (jax.tree.leaves(s3.g_params)[0]
               + jax.tree.leaves(s6.g_params)[0]),
        rtol=1e-6)

    # Held-out evaluation through the real script (the TPU queues' eval
    # step): judged magnitude distance + RMS + phase-jitter ratio + GL
    # anchor must all come out finite on a fresh tiny run.
    corpus = tmp_path / "corpus"
    from music_synthesis_tpu.data.dataset import make_rich_corpus
    make_rich_corpus(corpus, n_clips=2, seconds=1.0)
    _run_script("eval_checkpoint", [
        "--run", str(run), "--corpus", str(corpus), "--ema", "0.999",
        "--n-clips", "1", "--seconds", "0.5", "--gl-anchor",
    ], monkeypatch)
    ev = json.loads((run / "eval" / "eval.json").read_text())
    for k in ("copy_synthesis_multires_stft_distance_mean",
              "resynth_rms_over_real_rms_mean",
              "phase_jitter_ratio_mean",
              "griffin_lim_anchor_distance_mean",
              "griffin_lim_phase_jitter_ratio_mean"):
        assert np.isfinite(ev[k]), (k, ev)

    _run_script("export_zoo", [
        "--run", str(run), "--stage", "2", "--name", "voc_lifecycle",
        "--preset", "tiny", "--ema", "0.999", "--root", str(zoo_root),
        "--notes", "lifecycle test",
    ], monkeypatch)
    card = json.loads((zoo_root / "voc_lifecycle" / "card.json").read_text())
    assert card["kind"] == "vocoder"
    # The export must carry the run's mel scaler (conditioning provenance).
    stats = json.loads((run / "mel_stats.json").read_text())
    assert abs(card["mel_scaler"]["shift"] - stats["shift"]) < 1e-6

    # Zoo-entry evaluation (--zoo): the path a user takes when only the
    # exported weights survive (e.g. run checkpoints lost to a reboot —
    # DESIGN.md §19 methodology note). Must reproduce the ckpt-based
    # eval exactly: same EMA weights, same mel scaler, same clips.
    zoo_eval = tmp_path / "zoo_eval"
    _run_script("eval_checkpoint", [
        "--zoo", str(zoo_root / "voc_lifecycle"), "--corpus", str(corpus),
        "--preset", "tiny", "--n-clips", "1", "--seconds", "0.5",
        "--out", str(zoo_eval),
    ], monkeypatch)
    zev = json.loads((zoo_eval / "eval.json").read_text())
    assert abs(zev["copy_synthesis_multires_stft_distance_mean"]
               - ev["copy_synthesis_multires_stft_distance_mean"]) < 1e-4

    # Composer: a tiny stage-1 run exported the same way.
    run1 = tmp_path / "run1"
    _run_script("train_stage1", [
        "--preset", "tiny", "--steps", "4", "--batch", "2",
        "--ema", "0.999", "--auto-mel-stats", "--ckpt-every", "4",
        "--log-every", "2", "--prefetch", "0", "--outdir", str(run1),
    ], monkeypatch)
    _run_script("export_zoo", [
        "--run", str(run1), "--stage", "1", "--name", "comp_lifecycle",
        "--preset", "tiny", "--ema", "0.999", "--root", str(zoo_root),
    ], monkeypatch)

    from music_synthesis_tpu.config import TINY
    from music_synthesis_tpu.serve import ServeConfig, SynthService

    svc = SynthService(ServeConfig(
        composer="comp_lifecycle", vocoder="voc_lifecycle",
        zoo_root=str(zoo_root), batch_buckets=(1,), patch_buckets=(1,),
        crossfade_frames=4, target_rms=0.1,
    ), base_cfg=TINY, warmup=True)
    wav, meta = svc.synth(seconds=0.2, seed=1)
    sr = svc.cfg.frontend.sample_rate
    assert wav.shape == (1, int(round(0.2 * sr)))
    assert np.isfinite(wav).all()
    # The serving config reproduces the TRAINING normalization exactly.
    assert abs(svc.cfg.mel_scaler.shift - stats["shift"]) < 1e-6