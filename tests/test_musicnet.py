"""MusicNet-layout loader on a fabricated miniature fixture."""

import numpy as np
import pytest

from music_synthesis_tpu.data.musicnet import (
    MUSICNET_SR,
    MusicNetDataset,
)
from music_synthesis_tpu.utils.wav import write_wav

HEADER = ("start_time,end_time,instrument,note,"
          "start_beat,end_beat,note_value\n")


@pytest.fixture()
def mini_musicnet(tmp_path):
    rng = np.random.default_rng(0)
    (tmp_path / "train_data").mkdir()
    (tmp_path / "train_labels").mkdir()
    for cid, notes in [
        ("1727", [(0, 44100, 1, 60), (22050, 88200, 41, 64)]),
        ("2303", [(44100, 132300, 7, 72)]),
    ]:
        wav = 0.2 * rng.standard_normal(MUSICNET_SR * 3).astype(np.float32)
        write_wav(tmp_path / "train_data" / f"{cid}.wav", MUSICNET_SR, wav)
        rows = [f"{s},{e},{i},{n},{s / 44100:.2f},{e / 44100:.2f},Quarter"
                for s, e, i, n in notes]
        (tmp_path / "train_labels" / f"{cid}.csv").write_text(
            HEADER + "\n".join(rows) + "\n")
    return tmp_path


def test_layout_audio_and_labels(mini_musicnet):
    ds = MusicNetDataset(mini_musicnet, sample_rate=22_050,
                         segment_length=2048)
    assert sorted(ds.ids) == ["1727", "2303"]
    b = ds.sample_batch(0, 2)
    assert b.shape == (2, 2048) and np.isfinite(b).all()
    notes = ds.labels_for("1727")
    assert [n.note for n in notes] == [60, 64]
    assert notes[0].instrument == 1 and notes[1].start_beat == 0.5
    # Missing labels degrade gracefully.
    assert ds.labels_for("nope") == []


def test_notes_in_segment_rate_conversion(mini_musicnet):
    ds = MusicNetDataset(mini_musicnet, sample_rate=22_050,
                         segment_length=2048)
    # At 22.05 kHz, label sample 44100 (= 1 s) is our sample 22050.
    first_half = ds.notes_in_segment("1727", 0, 11025)   # 0 - 0.5 s
    assert [n.note for n in first_half] == [60]
    both = ds.notes_in_segment("1727", 0, 22050)         # 0 - 1.0 s
    assert [n.note for n in both] == [60, 64]
    late = ds.notes_in_segment("1727", 33000, 11050)     # 1.5 - 2 s
    assert [n.note for n in late] == [64]


def test_instrument_histogram_and_bad_root(mini_musicnet, tmp_path):
    ds = MusicNetDataset(mini_musicnet)
    assert ds.instrument_histogram() == {1: 1, 41: 1, 7: 1}
    with pytest.raises(FileNotFoundError):
        MusicNetDataset(tmp_path / "empty")
