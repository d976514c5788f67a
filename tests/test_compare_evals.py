"""Paired eval comparison tool (scripts/compare_evals.py)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "compare_evals.py"


def _run(*argv):
    return subprocess.run(
        [sys.executable, str(SCRIPT), *map(str, argv)],
        capture_output=True, text=True, check=True)


def test_paired_from_json(tmp_path):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps(
        {"per_clip": {"dist": [2.0, 2.2, 1.9], "jitter": [1.8, 1.7, 1.9]}}))
    b.write_text(json.dumps(
        {"per_clip": {"dist": [1.8, 2.1, 1.7], "jitter": [1.8, 1.7, 1.9]}}))
    out = _run(a, b).stdout.splitlines()
    stats = json.loads(out[-1])
    assert abs(stats["dist"]["mean_delta"] - (-0.5 / 3)) < 1e-9
    assert stats["dist"]["n_decreased"] == 3
    assert stats["jitter"]["mean_delta"] == 0.0


def test_paired_from_log(tmp_path):
    a = tmp_path / "a.log"
    b = tmp_path / "b.log"
    a.write_text("clip 0: multires_stft_distance = 2.0000\n"
                 "clip 1: multires_stft_distance = 1.5000\n")
    # Re-run lines for the same clip: the LAST value wins.
    b.write_text("clip 0: multires_stft_distance = 9.9999\n"
                 "clip 0: multires_stft_distance = 1.9000\n"
                 "clip 1: multires_stft_distance = 1.4000\n")
    stats = json.loads(_run(a, b).stdout.splitlines()[-1])
    assert abs(stats["dist"]["mean_delta"] - (-0.1)) < 1e-9
    assert stats["dist"]["n"] == 2


def test_committed_scaling_artifacts():
    """The 50k->200k flagship scaling claim holds as a paired statistic."""
    a = REPO / "runs" / "stage2_istft_stab_50k" / "eval.log"
    b = REPO / "runs" / "stage2_istft_200k" / "eval.log"
    stats = json.loads(_run(a, b).stdout.splitlines()[-1])
    assert stats["dist"]["n"] == 8
    assert stats["dist"]["mean_delta"] < -0.1
    assert stats["dist"]["n_decreased"] == 8
