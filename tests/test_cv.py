"""CV harnesses + cross-dataset eval smoke tests (tiny folds, CPU mesh)."""

import dataclasses

import numpy as np
import pytest

import jax

from ecgmm_tpu.config import Config, ModelConfig, TrainConfig
from ecgmm_tpu.data import synthetic
from ecgmm_tpu.models import ResNet1DSE
from ecgmm_tpu.tools import convert_pth
from ecgmm_tpu.train import cv
from ecgmm_tpu.workloads.run import build_model_and_task


def _tiny_cfg():
    return Config(
        name="signal_only",
        train=TrainConfig(
            batch_size=16, num_epochs=1, lr=1e-3, loss="focal",
            schedule="constant", freeze_encoders=False, k_outer=2, k_inner=2,
        ),
        model=ModelConfig(num_classes=2),
    )


def test_nested_cv_runs(mesh8):
    cohort = synthetic.make_cohort(n=48, signal_len=256, img_hw=(16, 32))
    cfg = _tiny_cfg()
    out = cv.nested_cv(
        build_model_and_task, cohort, cfg, mesh=mesh8,
        apply_filter=False, verbose=False,
    )
    assert len(out["outer_aucs"]) == 2
    assert np.isfinite(out["mean_auc"])


def test_exhaustive_cv_bounded(mesh8):
    cohort = synthetic.make_cohort(n=60, signal_len=256, img_hw=(16, 32))
    cfg = _tiny_cfg()
    out = cv.exhaustive_cv(
        build_model_and_task, cohort, cfg, k=5, mesh=mesh8,
        apply_filter=False, max_pairs=2, verbose=False,
    )
    assert len(out["pairs"]) == 2
    assert np.isfinite(out["mean_auc"])


def test_cross_dataset_eval_with_shipped_ckpt():
    """The reference's evaluation_signal.py flow: PTB-XL-trained model on
    foreign digitized signals with matched preprocessing."""
    variables = convert_pth.convert_resnet1d_se(
        convert_pth.load_torch_state_dict("/root/reference/best_ptbxl.pth")
    )
    model = ResNet1DSE(num_classes=2)
    cohort = synthetic.make_cohort(n=24, signal_len=2476, img_hw=(16, 32))
    out = cv.cross_dataset_eval(
        model, variables, cohort.signals, cohort.labels
    )
    assert set(out) == {"accuracy", "f1", "auroc", "threshold"}
    assert 0.0 <= out["accuracy"] <= 1.0


def test_nested_cv_fusion_cached_embeddings(mesh8):
    """CV with the cached-embedding fusion fast path: per-fold precompute
    (scalers are refit per fold), head-only fits, finite mean AUC."""
    cohort = synthetic.make_cohort(
        n=48, signal_len=256, img_hw=(16, 32), n_clinical=2
    )
    cfg = Config(
        name="fusion",
        train=TrainConfig(
            batch_size=16, num_epochs=1, lr=1e-3, k_outer=2, k_inner=2,
            cache_embeddings=True,
        ),
        model=ModelConfig(dtype="float32"),
        data=dataclasses.replace(
            Config().data, img_height=16, img_width=32, signal_len=256
        ),
    )
    out = cv.nested_cv(
        build_model_and_task, cohort, cfg, mesh=mesh8,
        apply_filter=False, verbose=False,
    )
    assert len(out["outer_aucs"]) == 2
    assert np.isfinite(out["mean_auc"])


def test_cross_cli_with_shipped_ckpt(capsys):
    """`python -m ecgmm_tpu.train.cv cross --pth ...` — the runnable
    equivalent of the reference's evaluation_signal.py — prints a JSON
    metric summary."""
    import json

    cv.main([
        "cross", "--pth", "/root/reference/best_ptbxl.pth",
        "--n-synth", "16",
    ])
    out = json.loads(capsys.readouterr().out)
    assert set(out) == {"accuracy", "f1", "auroc", "threshold"}
    assert 0.0 <= out["accuracy"] <= 1.0


def test_cross_cli_requires_checkpoint():
    with pytest.raises(SystemExit):
        cv.main(["cross"])


# Suite tiering: every test in this module is multi-second e2e work —
# the fast tier (pytest -m "not slow") skips it; CI and the full local
# run still execute it.
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
