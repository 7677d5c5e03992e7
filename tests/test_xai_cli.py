"""XAI batch CLI: CSV output contract + new split/threshold helpers +
preemption save."""

import os
import signal

import numpy as np
import pytest
from sklearn.metrics import f1_score

import jax
import jax.numpy as jnp

from ecgmm_tpu.data import splits
from ecgmm_tpu.train import metrics as M


def test_manual_split():
    s = splits.manual_split(10, val_indices=[1, 3], test_indices=[5, 7])
    np.testing.assert_array_equal(s.val, [1, 3])
    np.testing.assert_array_equal(s.test, [5, 7])
    assert set(s.train) == set(range(10)) - {1, 3, 5, 7}
    with pytest.raises(ValueError):
        splits.manual_split(10, [1], [1])


def test_multiclass_threshold(rng):
    labels = rng.integers(0, 3, 300)
    logits = rng.normal(size=(300, 3)) + np.eye(3)[labels] * 2
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    t, f1 = M.find_best_threshold_multiclass(labels, probs, positive_class=1)
    assert 0.1 <= t < 0.9
    # the reported f1 matches sklearn's for the same thresholded preds
    others = np.array([0, 2])
    preds = np.where(
        probs[:, 1] >= t, 1, others[np.argmax(probs[:, others], axis=1)]
    )
    want = f1_score((labels == 1).astype(int), (preds == 1).astype(int))
    assert f1 == pytest.approx(want, abs=1e-6)


@pytest.mark.slow
def test_xai_cli_writes_csvs(tmp_path):
    import dataclasses

    from ecgmm_tpu.config import get_preset
    from ecgmm_tpu.explain.run_xai import xai_report
    from ecgmm_tpu.models import ECGMultimodalModel
    from ecgmm_tpu.workloads.run import load_data

    cfg = get_preset("fusion")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, dtype="float32"),
        data=dataclasses.replace(cfg.data, img_height=32, img_width=32,
                                 signal_len=256),
    )
    data = load_data(cfg, "synthetic", 48)
    model = ECGMultimodalModel(cfg=cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)),
        jnp.ones((1, 256)), jnp.ones((1, 2)),
    )
    dims = (cfg.model.image_dim, cfg.model.signal_dim,
            cfg.model.clinical_dim)
    for method in ("shap", "lime"):
        frames = xai_report(
            model, variables, data.train, data.test, dims,
            method=method, out_dir=str(tmp_path), n_samples=4,
        )
        for c, df in frames.items():
            assert {"index", "Image_%", "Signal_%", "Clinical_%"} <= set(
                df.columns
            )
            total = df["Image_%"] + df["Signal_%"] + df["Clinical_%"]
            np.testing.assert_allclose(total, 100.0, atol=1e-3)
            path = tmp_path / method / f"fusion_{method}_fusion_class{c}.csv"
            assert path.exists()


@pytest.mark.slow
def test_xai_cli_gradcam_and_tabnet_masks(tmp_path):
    """Round-3 CLI additions: Grad-CAM overlays + TabNet mask heatmaps
    from the same batch entry point as shap/lime."""
    import dataclasses

    from ecgmm_tpu.config import get_preset
    from ecgmm_tpu.explain.run_xai import (
        gradcam_report,
        tabnet_masks_report,
    )
    from ecgmm_tpu.models import ECGMultimodalModel
    from ecgmm_tpu.workloads.run import load_data

    cfg = get_preset("fusion")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, dtype="float32"),
        data=dataclasses.replace(cfg.data, img_height=32, img_width=32,
                                 signal_len=256),
    )
    data = load_data(cfg, "synthetic", 24)
    model = ECGMultimodalModel(cfg=cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)),
        jnp.ones((1, 256)), jnp.ones((1, 2)),
    )
    paths = gradcam_report(model, variables, data.test, str(tmp_path),
                           n_samples=2)
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    mask_paths = tabnet_masks_report(model, variables, data.test,
                                     str(tmp_path))
    # 3 step masks + aggregate
    assert len(mask_paths) == 4 and all(
        os.path.exists(p) for p in mask_paths
    )


def test_onecycle_short_run_no_nan():
    """optax.cosine_onecycle_schedule NaNs when the warmup interval
    rounds to zero steps — make_optimizer must clamp (regression for the
    2-step PTB-XL smoke run)."""
    import jax.numpy as jnp
    import optax

    from ecgmm_tpu.config import TrainConfig
    from ecgmm_tpu.train.optim import make_optimizer

    cfg = TrainConfig(schedule="onecycle", num_epochs=1)
    tx = make_optimizer(cfg, steps_per_epoch=2)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update({"w": jnp.ones(3)}, state, params)
        params = optax.apply_updates(params, updates)
    assert bool(jnp.isfinite(params["w"]).all())
