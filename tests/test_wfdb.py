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


def _hea(tmp_path, name, n_sig, n, fmt, gains, baselines, fs=250.0):
    with open(tmp_path / f"{name}.hea", "w") as f:
        f.write(f"{name} {n_sig} {fs} {n}\n")
        for i in range(n_sig):
            f.write(
                f"{name}.dat {fmt} {gains[i]}({baselines[i]})/mV 16 0 0 0 0 "
                f"sig{i}\n"
            )


def _pack212(samples):
    """WFDB format-212 encoder (two 12-bit two's-complement samples per
    3 bytes), for minting test fixtures."""
    s = np.asarray(samples, np.int64)
    if len(s) % 2:
        s = np.concatenate([s, [0]])
    u = np.where(s < 0, s + 4096, s)
    s0, s1 = u[0::2], u[1::2]
    b0 = s0 & 0xFF
    b1 = ((s0 >> 8) & 0x0F) | (((s1 >> 8) & 0x0F) << 4)
    b2 = s1 & 0xFF
    return np.stack([b0, b1, b2], axis=1).astype(np.uint8).reshape(-1)


def test_read_wfdb_format212_two_channel(tmp_path):
    """MIT-BIH packed 12-bit: 2-channel interleaved roundtrip with
    gain/baseline scaling."""
    rng = np.random.default_rng(2)
    n, gains, baselines = 240, [200.0, 100.0], [0, -10]
    digital = rng.integers(-2048, 2048, (n, 2)).astype(np.int64)
    _pack212(digital.reshape(-1)).tofile(tmp_path / "m1.dat")
    _hea(tmp_path, "m1", 2, n, 212, gains, baselines)
    sig, hdr = sources.read_wfdb(str(tmp_path / "m1"))
    want = (digital.astype(np.float64) - baselines) / gains
    assert hdr.formats == [212, 212]
    np.testing.assert_allclose(sig, want, atol=1e-12)


def test_read_wfdb_format212_odd_length_padding(tmp_path):
    """An odd single-channel sample count pads the final 3-byte group;
    the reader crops to the header's declared length."""
    digital = np.array([5, -5, 2047, -2048, 123], np.int64)
    _pack212(digital).tofile(tmp_path / "m2.dat")
    _hea(tmp_path, "m2", 1, len(digital), 212, [200.0], [0])
    sig, _ = sources.read_wfdb(str(tmp_path / "m2"))
    assert sig.shape == (5, 1)
    np.testing.assert_allclose(sig[:, 0], digital / 200.0, atol=1e-12)


def test_read_wfdb_format80(tmp_path):
    """Offset-binary 8-bit: stored byte − 128."""
    digital = np.array([-128, -1, 0, 1, 127], np.int64)
    (digital + 128).astype(np.uint8).tofile(tmp_path / "m3.dat")
    _hea(tmp_path, "m3", 1, len(digital), 80, [100.0], [0])
    sig, _ = sources.read_wfdb(str(tmp_path / "m3"))
    np.testing.assert_allclose(sig[:, 0], digital / 100.0, atol=1e-12)


def test_read_wfdb_format24(tmp_path):
    """3-byte little-endian two's complement."""
    digital = np.array(
        [-(1 << 23), -1, 0, 1, (1 << 23) - 1, 70000, -70000], np.int64
    )
    u = np.where(digital < 0, digital + (1 << 24), digital)
    b = np.stack(
        [u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF], axis=1
    ).astype(np.uint8)
    b.reshape(-1).tofile(tmp_path / "m4.dat")
    _hea(tmp_path, "m4", 1, len(digital), 24, [1000.0], [0])
    sig, _ = sources.read_wfdb(str(tmp_path / "m4"))
    np.testing.assert_allclose(
        sig[:, 0], digital.astype(np.float64) / 1000.0, atol=1e-12
    )


def test_read_wfdb_unknown_format_raises(tmp_path):
    np.zeros(4, np.uint8).tofile(tmp_path / "m5.dat")
    _hea(tmp_path, "m5", 1, 4, 8, [200.0], [0])
    with pytest.raises(NotImplementedError, match="format 8"):
        sources.read_wfdb(str(tmp_path / "m5"))


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


def test_mitbih_header_baseline_defaults_to_adc_zero(tmp_path):
    """A real MIT-BIH signal line has no parenthesized baseline —
    '100.dat 212 200 11 1024 995 ...' — and per the WFDB spec the
    baseline then equals the ADC-zero field (1024), not 0 (round-3
    review finding)."""
    n = 6
    # two channels, format 212, known digital values around adc_zero
    dig = np.array([[1024, 1034], [1014, 1024], [1044, 1004],
                    [1024, 1024], [1025, 1023], [1023, 1025]], np.int32)
    flat = dig.reshape(-1)
    b = np.zeros(((len(flat) + 1) // 2) * 3, np.uint8)
    for k in range(0, len(flat), 2):
        s0, s1 = int(flat[k]) & 0xFFF, int(flat[k + 1]) & 0xFFF
        j = (k // 2) * 3
        b[j] = s0 & 0xFF
        b[j + 1] = ((s0 >> 8) & 0x0F) | (((s1 >> 8) & 0x0F) << 4)
        b[j + 2] = s1 & 0xFF
    b.tofile(tmp_path / "100.dat")
    with open(tmp_path / "100.hea", "w") as f:
        f.write(f"100 2 360 {n}\n")
        f.write("100.dat 212 200 11 1024 1024 0 0 MLII\n")
        f.write("100.dat 212 200 11 1024 1034 0 0 V5\n")
    sig, hdr = sources.read_wfdb(str(tmp_path / "100"))
    assert hdr.baselines == [1024, 1024]
    np.testing.assert_allclose(
        sig, (dig - 1024) / 200.0, atol=1e-12
    )


def test_wfdb_gain_zero_uses_spec_default_200(tmp_path):
    digital = np.arange(-5, 5, dtype="<i2")
    digital.tofile(tmp_path / "g0.dat")
    with open(tmp_path / "g0.hea", "w") as f:
        f.write("g0 1 250 10\n")
        f.write("g0.dat 16 0 16 0 0 0 0 ECG\n")
    sig, hdr = sources.read_wfdb(str(tmp_path / "g0"))
    assert hdr.gains == [200.0]
    assert np.isfinite(sig).all()
    np.testing.assert_allclose(sig[:, 0], digital / 200.0, atol=1e-12)


def test_wfdb_format_offset_is_honored(tmp_path):
    """CinC-2017-style '16+24' specs skip the leading container bytes
    instead of decoding them as samples."""
    junk = np.full(24, 0x7F, np.uint8)
    digital = np.array([100, -200, 300, -400], "<i2")
    with open(tmp_path / "off.dat", "wb") as f:
        f.write(junk.tobytes())
        f.write(digital.tobytes())
    with open(tmp_path / "off.hea", "w") as f:
        f.write("off 1 300 4\n")
        f.write("off.dat 16+24 1000(0)/mV 16 0 0 0 0 ECG\n")
    sig, hdr = sources.read_wfdb(str(tmp_path / "off"))
    assert list(hdr.offsets) == [24]
    np.testing.assert_allclose(sig[:, 0], digital / 1000.0, atol=1e-12)


def test_wfdb_unsupported_layouts_raise(tmp_path):
    with open(tmp_path / "multi.hea", "w") as f:
        f.write("multi 2 250 10\n")
        f.write("multi_a.dat 16 200(0)/mV 16 0 0 0 0 A\n")
        f.write("multi_b.dat 16 200(0)/mV 16 0 0 0 0 B\n")
    with pytest.raises(NotImplementedError, match="multi-file"):
        sources.read_wfdb(str(tmp_path / "multi"))

    with open(tmp_path / "skew.hea", "w") as f:
        f.write("skew 1 250 10\n")
        f.write("skew.dat 16x2 200(0)/mV 16 0 0 0 0 A\n")
    with pytest.raises(NotImplementedError, match="format spec"):
        sources.read_wfdb_header(str(tmp_path / "skew.hea"))
