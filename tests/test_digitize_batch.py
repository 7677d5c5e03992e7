"""Bulk photo→signal ETL (tools/digitize_batch.py): the produced
ecg_signals.csv must be exactly what sources.load_hospital_tables
reads, digitized rows must track their source signals, failures must
be reported per image not fatal (unless --strict)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from ecgmm_tpu.data import synthetic
from ecgmm_tpu.tools import digitize_batch


def _make_cohort_dir(tmp_path, n=3, blank_idx=None):
    cohort = synthetic.make_cohort(n=n, signal_len=2476, seed=7,
                                   img_hw=(250, 2500))
    d = tmp_path / "strips"
    d.mkdir()
    for i in range(n):
        Image.fromarray(cohort.images[i]).save(d / f"{i + 1}.png")
    if blank_idx is not None:
        blank = np.full((250, 2500, 3), 245, np.uint8)
        Image.fromarray(blank).save(d / f"{blank_idx}.png")
    return str(d), cohort


def test_directory_digitization_matches_training_format(tmp_path):
    d, cohort = _make_cohort_dir(tmp_path, n=3)
    signals, report = digitize_batch.digitize_directory(d)
    assert list(signals.index) == [1, 2, 3]
    assert signals.shape == (3, 2476)
    # round-trips through the hospital loader's read convention
    out = tmp_path / "ecg_signals.csv"
    signals.to_csv(out)
    back = pd.read_csv(out, index_col=0)
    back.index = back.index.astype(int)
    assert back.shape == (3, 2476)
    # each digitized row tracks its source signal
    for i in range(3):
        a = cohort.signals[i] - cohort.signals[i].mean()
        b = signals.loc[i + 1].to_numpy() - signals.loc[i + 1].mean()
        corr = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert corr > 0.9, (i, corr)
    assert (report["error"] == "").all()
    assert (report["scale_source"] == "grid").all()


def test_blank_image_reported_not_fatal(tmp_path):
    d, _ = _make_cohort_dir(tmp_path, n=2, blank_idx=9)
    signals, report = digitize_batch.digitize_directory(d)
    assert list(signals.index) == [1, 2]   # blank excluded from signals
    assert report.loc[9, "error"] != ""
    assert "no ECG trace" in report.loc[9, "error"]
    with pytest.raises(RuntimeError, match="9.png"):
        digitize_batch.digitize_directory(d, strict=True)


def test_cli_end_to_end(tmp_path, capsys):
    d, _ = _make_cohort_dir(tmp_path, n=2)
    out = str(tmp_path / "sig.csv")
    rep = str(tmp_path / "rep.csv")
    digitize_batch.main([d, "-o", out, "--report", rep])
    captured = capsys.readouterr().out
    assert "digitized 2/2" in captured
    assert pd.read_csv(out, index_col=0).shape == (2, 2476)
    r = pd.read_csv(rep, index_col=0)
    assert set(r.columns) >= {"scale_source", "px_per_mv", "ink_fraction",
                              "cropped", "error"}


def test_empty_dir_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        digitize_batch.digitize_directory(str(tmp_path / "empty"))


def test_px_per_mv_override(tmp_path):
    d, _ = _make_cohort_dir(tmp_path, n=1)
    _, report = digitize_batch.digitize_directory(d, px_per_mv=100.0)
    assert (report["scale_source"] == "explicit").all()
    assert (report["px_per_mv"] == 100.0).all()


def test_duplicate_stem_rejected(tmp_path):
    """3.jpg AND 3.png for the same patient id is ambiguous — silent
    last-one-wins would train on an arbitrary file (round-3 review
    finding); the tool must refuse with the duplicated id named."""
    cohort = synthetic.make_cohort(n=1, signal_len=2476, seed=7,
                                   img_hw=(250, 2500))
    img = cohort.images[0]
    Image.fromarray(img).save(tmp_path / "3.png")
    Image.fromarray(img).save(tmp_path / "3.jpg")
    Image.fromarray(img).save(tmp_path / "4.png")
    with pytest.raises(ValueError, match=r"\[3\]"):
        digitize_batch.digitize_directory(str(tmp_path))


def test_exif_orientation_applied(tmp_path):
    """A phone photo stored sideways with EXIF Orientation must be
    righted before digitization (PIL ignores the tag unless
    exif_transpose is applied — round-3 fix); the digitized row must
    track the source signal as well as a straight photo would."""
    cohort = synthetic.make_cohort(n=1, signal_len=2476, seed=9,
                                   img_hw=(250, 2500))
    d = tmp_path / "strips"
    d.mkdir()
    pil = Image.fromarray(cohort.images[0])
    stored = pil.transpose(Image.ROTATE_90)  # pixels stored sideways
    ex = Image.Exif()
    ex[0x0112] = 6  # Orientation: exif_transpose rotates back
    stored.save(d / "1.jpg", quality=95, exif=ex)
    signals, report = digitize_batch.digitize_directory(str(d))
    assert report.loc[1, "error"] == ""
    mv = signals.loc[1].to_numpy()
    sig = cohort.signals[0]
    a = sig - sig.mean()
    b = mv - mv.mean()
    corr = float((a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert corr > 0.9, corr
