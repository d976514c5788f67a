"""End-to-end drive of the --guard fire path in scripts/train_stage2.py:
early stop, STATUS stamp, checkpoint labeled with the actual stop step."""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, REPO / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FireOnSecond:
    """Stub guard: collapse verdict on the 2nd logged entry."""

    def __init__(self):
        self.calls = 0

    def update(self, step, metrics):
        assert {"d_loss", "g_adv", "g_stft"} <= set(metrics)
        self.calls += 1
        if self.calls >= 2:
            return f"stub collapse at step {step}"
        return None


def test_guard_stops_training_early(tmp_path, monkeypatch):
    from music_synthesis_tpu.train import guard as guard_mod

    monkeypatch.setattr(guard_mod, "CollapseGuard", _FireOnSecond)
    outdir = tmp_path / "run"
    argv = [
        "train_stage2.py", "--preset", "tiny", "--steps", "50",
        "--batch", "2", "--segment", "2048", "--guard",
        "--log-every", "1", "--ckpt-every", "1000", "--prefetch", "0",
        "--outdir", str(outdir),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    _load_script("train_stage2").main()

    status = (outdir / "STATUS").read_text()
    assert "guard-stopped at step 2" in status
    # Far fewer than 50 steps were logged, and the final checkpoint is
    # labeled with the actual stop step, not --steps.
    logged = [json.loads(l)
              for l in (outdir / "metrics.jsonl").read_text().splitlines()]
    assert len(logged) == 2
    ckpt_steps = sorted(
        int(p.name) for p in (outdir / "ckpt").iterdir() if p.name.isdigit())
    assert ckpt_steps == [2]
