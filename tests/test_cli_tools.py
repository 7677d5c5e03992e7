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


@pytest.mark.slow
def test_cv_modal_balance_uses_full_clinical_width(mesh8):
    """The CV harness must feed the preset's clinical width (24 for
    modal-balance), not a hardcoded 2-column slice (review regression)."""
    import dataclasses

    from ecgmm_tpu.data import synthetic
    from ecgmm_tpu.train import cv
    from ecgmm_tpu.workloads.run import build_model_and_task, get_preset

    cfg = get_preset("fusion_modal_balance")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, img_height=16, img_width=32,
                                 signal_len=256),
        train=dataclasses.replace(cfg.train, num_epochs=1, batch_size=8,
                                  patience=10),
        model=dataclasses.replace(cfg.model, dtype="float32"),
    )
    cohort = synthetic.make_cohort(
        n=48, signal_len=256, img_hw=(16, 32),
        n_clinical=cfg.model.clinical_in_features,
    )
    out = cv.exhaustive_cv(
        build_model_and_task, cohort, cfg, k=4, mesh=mesh8,
        apply_filter=False, max_pairs=1, verbose=False,
    )
    assert np.isfinite(out["mean_auc"])


def test_cv_cli_rejects_unsupported_preset():
    from ecgmm_tpu.train import cv

    with pytest.raises(SystemExit):
        cv.main(["nested", "--preset", "signal_12lead"])


@pytest.mark.slow
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
