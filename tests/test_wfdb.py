"""The native WFDB reader (replaces the wfdb package): format-16 .dat,
.mat-backed records, gain/baseline scaling, channel selection."""

import os

import numpy as np
import pytest

from ecgmm_tpu.data import sources


def _write_format16(tmp_path, name="rec1", n=500, n_sig=2, fs=500.0):
    rng = np.random.default_rng(0)
    digital = rng.integers(-2000, 2000, (n, n_sig)).astype(np.int16)
    gains = [200.0, 100.0]
    baselines = [0, 50]
    with open(tmp_path / f"{name}.hea", "w") as f:
        f.write(f"{name} {n_sig} {fs} {n}\n")
        for i in range(n_sig):
            f.write(
                f"{name}.dat 16 {gains[i]}({baselines[i]})/mV 16 0 0 0 0 "
                f"sig{i}\n"
            )
    digital.tofile(tmp_path / f"{name}.dat")
    physical = (digital.astype(np.float64) - baselines) / gains
    return physical


def test_read_wfdb_format16(tmp_path):
    want = _write_format16(tmp_path)
    sig, hdr = sources.read_wfdb(str(tmp_path / "rec1"))
    assert hdr.n_sig == 2 and hdr.fs == 500.0 and hdr.n_samples == 500
    np.testing.assert_allclose(sig, want, atol=1e-12)


def test_read_wfdb_channel_select(tmp_path):
    want = _write_format16(tmp_path)
    sig, _ = sources.read_wfdb(str(tmp_path / "rec1"), channels=[1])
    np.testing.assert_allclose(sig[:, 0], want[:, 1], atol=1e-12)


def test_read_wfdb_mat(tmp_path):
    from scipy.io import savemat

    rng = np.random.default_rng(1)
    digital = rng.integers(-1000, 1000, (1, 300)).astype(np.int16)
    savemat(tmp_path / "A0001.mat", {"val": digital})
    with open(tmp_path / "A0001.hea", "w") as f:
        f.write("A0001 1 300 300\n")
        f.write("A0001.mat 16 1000/mV 16 0 0 0 0 ECG\n")
    sig, hdr = sources.read_wfdb(str(tmp_path / "A0001"))
    np.testing.assert_allclose(
        sig[:, 0], digital[0].astype(np.float64) / 1000.0, atol=1e-12
    )


def test_ptbxl_manifest(tmp_path):
    import pandas as pd

    db = pd.DataFrame(
        {
            "scp_codes": [
                "{'AFIB': 100.0}",
                "{'SR': 100.0}",
                "{'AFIB': 50.0, 'SR': 100.0}",  # AFIB below threshold → 0
                "{'NORM': 100.0}",              # no rhythm code → dropped
                "{'STACH': 100.0}",
            ],
            "filename_hr": [f"records500/r{i}" for i in range(5)],
        }
    )
    db.to_csv(tmp_path / "ptbxl_database.csv", index=False)
    mani = sources.load_ptbxl_manifest(str(tmp_path))
    assert list(mani["label"]) == [1, 0, 0, 0]


def test_physionet_manifest(tmp_path):
    import pandas as pd

    pd.DataFrame(
        [["A0001", "N"], ["A0002", "A"], ["A0003", "O"], ["A0004", "~"]]
    ).to_csv(tmp_path / "REFERENCE.csv", index=False, header=False)
    binary = sources.load_physionet_manifest(str(tmp_path))
    assert list(binary["label"]) == [0, 1, 1]
    multi = sources.load_physionet_manifest(str(tmp_path), multiclass=True)
    assert list(multi["label"]) == [0, 1, 2]
