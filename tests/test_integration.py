"""Cross-subsystem integration: real-file PTB-XL/PhysioNet fixture trees
through the native WFDB reader → manifests → materialization → one
training epoch; and a trained run served through ServingPipeline.from_run."""

import dataclasses
import os

import numpy as np
import pytest

from ecgmm_tpu.config import get_preset
from ecgmm_tpu.workloads import run as runner


def _write_ptbxl_tree(root, n=24):
    import pandas as pd

    rng = np.random.default_rng(0)
    os.makedirs(root / "records500", exist_ok=True)
    rows = []
    for i in range(n):
        name = f"r{i:03d}_hr"
        digital = (
            rng.normal(0, 0.3, (1000, 12)) * 1000
        ).astype(np.int16)
        with open(root / "records500" / f"{name}.hea", "w") as f:
            f.write(f"{name} 12 500 1000\n")
            for ch in range(12):
                f.write(f"{name}.dat 16 1000/mV 16 0 0 0 0 ch{ch}\n")
        digital.tofile(root / "records500" / f"{name}.dat")
        code = "AFIB" if i % 4 == 0 else "SR"
        rows.append(
            {
                "scp_codes": f"{{'{code}': 100.0}}",
                "filename_hr": f"records500/{name}",
            }
        )
    pd.DataFrame(rows).to_csv(root / "ptbxl_database.csv", index=False)


def _write_physionet_tree(root, n=24):
    import pandas as pd
    from scipy.io import savemat

    rng = np.random.default_rng(1)
    os.makedirs(root / "training2017", exist_ok=True)
    rows = []
    for i in range(n):
        name = f"A{i:04d}"
        digital = (rng.normal(0, 0.2, (1, 2700)) * 1000).astype(np.int16)
        savemat(root / "training2017" / f"{name}.mat", {"val": digital})
        with open(root / "training2017" / f"{name}.hea", "w") as f:
            f.write(f"{name} 1 300 2700\n")
            f.write(f"{name}.mat 16 1000/mV 16 0 0 0 0 ECG\n")
        rows.append([name, "A" if i % 3 == 0 else "N"])
    pd.DataFrame(rows).to_csv(
        root / "REFERENCE.csv", index=False, header=False
    )


def _shrunk(preset, tmp_path, **data_over):
    cfg = get_preset(preset)
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, **data_over),
        train=dataclasses.replace(
            cfg.train, num_epochs=1, batch_size=8,
            checkpoint_dir=str(tmp_path / "ckpt"),
            log_dir=str(tmp_path / "runs"),
            output_dir=str(tmp_path / "out"),
        ),
    )


def test_ptbxl_real_files_end_to_end(tmp_path):
    _write_ptbxl_tree(tmp_path)
    cfg = _shrunk("ptbxl_af", tmp_path, ptbxl_dir=str(tmp_path),
                  signal_len=500)
    data = runner.load_data(cfg, "real", n_synth=0)
    # 500 Hz records decimated to 250 Hz then padded/cropped to the
    # config's signal_len (the reference pins 2476; round 3 made the
    # length follow cfg.data.signal_len instead of a hardcoded constant)
    assert data.train.signals.shape[-1] == cfg.data.signal_len == 500
    labels = np.concatenate([
        np.asarray(s.labels) for s in (data.train, data.val, data.test)
    ])
    assert labels.sum() == 6  # every 4th record AFIB
    result, metrics = runner.run(
        cfg, data, run_dir=str(tmp_path / "run"), verbose=False
    )
    assert np.isfinite(result.history[0]["Loss/Train"])


def test_physionet_real_files_end_to_end(tmp_path):
    _write_physionet_tree(tmp_path)
    cfg = _shrunk("physionet", tmp_path, physionet_dir=str(tmp_path),
                  signal_len=3000)
    data = runner.load_data(cfg, "real", n_synth=0)
    assert data.train.signals.shape[-1] == 3000
    result, metrics = runner.run(
        cfg, data, run_dir=str(tmp_path / "run"), verbose=False
    )
    assert np.isfinite(result.history[0]["Loss/Train"])


def test_serving_from_trained_run(tmp_path):
    """Train one fusion epoch, then assemble the production serving
    pipeline from the run's checkpoint + scalers and answer a request."""
    from ecgmm_tpu.config import ModelConfig
    from ecgmm_tpu.data import synthetic
    from ecgmm_tpu.models import ECGMultimodalModel
    from ecgmm_tpu.serve.api import ServingPipeline

    cfg = _shrunk("fusion", tmp_path, img_height=32, img_width=32,
                  signal_len=256)
    cfg = dataclasses.replace(cfg, model=ModelConfig(dtype="float32"))
    data = runner.load_data(cfg, "synthetic", n_synth=48)
    runner.run(cfg, data, run_dir=str(tmp_path / "run"), verbose=False)

    pipe = ServingPipeline.from_run(
        str(tmp_path / "run"), data,
        model=ECGMultimodalModel(cfg=cfg.model),
    )
    strip = synthetic.make_cohort(n=1, signal_len=256, img_hw=(50, 500))
    out = pipe.predict(strip.images[0], {"age": 61, "weight": 74})
    assert out["label"] in ("Normal", "Abnormal")
    assert abs(sum(out["feature_importance"].values()) - 100.0) < 1.0
    assert len(out["ecg_signal"]) > 50
    # the run fit a softmax temperature on its val split (train/
    # calibrate.py) and from_run loaded that exact value into the
    # request program (on a tiny/degenerate val split the fit's guard
    # legitimately returns 1.0, so pin the plumbing, not the value)
    from ecgmm_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "run"))
    assert ckpt.exists("calibration")
    saved = ckpt.restore(
        "calibration",
        {"temperature_best": 1.0, "temperature_last": 1.0},
    )
    assert pipe.temperature == float(saved["temperature_best"]) > 0


def test_hospital_layout_end_to_end(tmp_path):
    """runner.load_data('hospital'): the reference's on-disk layout
    (labels/clinical/ecg_signals/images tree) through alignment, scaling,
    materialization and one fusion training epoch."""
    from ecgmm_tpu.config import ModelConfig
    from ecgmm_tpu.data import synthetic

    synthetic.write_fixture_tree(str(tmp_path / "data"), n=32)
    cfg = _shrunk(
        "fusion", tmp_path,
        data_dir=str(tmp_path / "data"),
        img_height=32, img_width=32, signal_len=2476,
    )
    cfg = dataclasses.replace(cfg, model=ModelConfig(dtype="float32"))
    data = runner.load_data(cfg, "hospital", n_synth=0)
    # Borderline rows dropped by alignment
    assert data.train.n + data.val.n + data.test.n < 32
    assert data.train.images.shape[1:] == (32, 32, 3)
    result, metrics = runner.run(
        cfg, data, run_dir=str(tmp_path / "run"), verbose=False
    )
    assert np.isfinite(result.history[0]["Loss/Train"])


def test_serving_handles_odd_photo_sizes(tmp_path):
    """Phone photos are not 2500x250: the pipeline must digitize and
    answer for arbitrary sizes (and grayscale-ish content)."""
    from ecgmm_tpu.serve.api import ServingPipeline

    pipe = ServingPipeline.demo()
    rng = np.random.default_rng(0)
    for hw in ((333, 777), (1024, 768)):
        img = np.full(hw + (3,), 240, np.uint8)
        img[hw[0] // 2 + (10 * np.sin(np.arange(hw[1]) / 9)).astype(int),
            np.arange(hw[1])] = 20
        out = pipe.predict(img, {"age": 45, "weight": 80})
        assert out["label"] in ("Normal", "Abnormal")
        assert len(out["ecg_signal"]) > 50


# Suite tiering: every test in this module is multi-second e2e work —
# the fast tier (pytest -m "not slow") skips it; CI and the full local
# run still execute it.
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
