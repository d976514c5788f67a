"""HTML report generation tests (SURVEY.md C19)."""

import numpy as np

from music_synthesis_tpu.utils.report import write_report


def test_write_report(tmp_path):
    rng = np.random.default_rng(0)
    clips = [(f"clip {i}", 0.2 * rng.standard_normal(2205)) for i in range(2)]
    mels = [rng.standard_normal((32, 16)) for _ in range(2)]
    out = write_report(
        tmp_path / "report.html", "test run", clips, 22050, mels,
        metrics={"g_loss": 1.25, "d_loss": 0.5},
    )
    text = out.read_text()
    assert text.count("data:audio/wav;base64,") == 2
    assert "g_loss" in text and "1.25" in text
    assert "<audio controls" in text
