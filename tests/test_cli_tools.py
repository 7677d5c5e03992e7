"""CLI entry points of the analysis/CV tooling (the reference's runnable
scripts: ptb_xl_eda.py / image_anaylsis.py / train_kfold.py /
train_exhausted.py)."""

import json

import numpy as np
import pandas as pd
import pytest


def test_eda_cohort_cli(tmp_path, capsys):
    from ecgmm_tpu.tools import eda

    df = pd.DataFrame({
        "label": [0, 0, 1, 1] * 6,
        "AGE": np.r_[np.full(12, 50.0), np.full(12, 70.0)],
        "Wt": np.linspace(50, 90, 24),
    })
    csv = tmp_path / "clinical.csv"
    df.to_csv(csv, index=False)
    eda.main(["cohort", str(csv), "--numeric", "AGE,Wt"])
    out = capsys.readouterr().out
    assert "AGE" in out and "p_value" in out


def test_eda_images_cli(tmp_path, capsys):
    from PIL import Image

    from ecgmm_tpu.tools import eda

    d = tmp_path / "images" / "1"
    d.mkdir(parents=True)
    Image.new("RGB", (2500, 250)).save(d / "001ECG_lead2.jpg")
    eda.main(["images", str(tmp_path / "images")])
    out = capsys.readouterr().out
    assert "2500" in out and "size distribution" in out


def test_cv_cli_exhaustive_smoke(monkeypatch, capsys):
    from ecgmm_tpu.train import cv

    monkeypatch.setattr(
        "ecgmm_tpu.utils.cache.enable_compilation_cache", lambda: None
    )
    cv.main([
        "exhaustive", "--preset", "signal_only", "--epochs", "1",
        "--n-synth", "48", "--k", "4", "--max-pairs", "1",
    ])
    out = capsys.readouterr().out
    payload = json.loads(out[out.index("{"):])
    assert np.isfinite(payload["mean_auc"])
