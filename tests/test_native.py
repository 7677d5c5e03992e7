"""Native C++ preprocessing engine vs scipy ground truth + a speed
sanity check vs the single-threaded scipy path."""

import time

import numpy as np
import pytest
import scipy.signal as sps

from ecgmm_tpu import native
from ecgmm_tpu.data import preprocess as pp

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def test_native_baseline_matches_numpy(rng):
    x = rng.normal(size=(7, 2476))
    got = native.remove_baseline(x, 200)
    for i in range(7):
        want = x[i] - np.convolve(x[i], np.ones(200) / 200, "same")
        np.testing.assert_allclose(got[i], want, atol=1e-10)


@pytest.mark.parametrize(
    "filt", [pp.butter_lowpass(), pp.butter_lowpass_ptb(),
             pp.butter_bandpass()],
    ids=["hospital", "ptb", "physionet"],
)
def test_native_filtfilt_matches_scipy(rng, filt):
    x = rng.normal(size=(5, 1200))
    got = native.filtfilt(filt, x)
    want = sps.filtfilt(filt.b, filt.a, x, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_native_hospital_pipeline_matches_reference(rng):
    x = rng.normal(size=(6, 2476))
    got = native.preprocess_hospital(x)
    f = pp.butter_lowpass()
    for i in range(6):
        base = x[i] - np.convolve(x[i], np.ones(200) / 200, "same")
        want = sps.filtfilt(f.b, f.a, base)
        np.testing.assert_allclose(got[i], want, rtol=1e-9, atol=1e-9)


def test_native_faster_than_scipy_loop(rng):
    """The point of the engine: beat the reference's per-sample scipy
    path on a realistic cohort."""
    x = rng.normal(size=(256, 2476))
    f = pp.butter_lowpass()

    native.preprocess_hospital(x[:8])  # warm (build cached already)
    t0 = time.perf_counter()
    native.preprocess_hospital(x)
    dt_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for row in x:
        base = row - np.convolve(row, np.ones(200) / 200, "same")
        sps.filtfilt(f.b, f.a, base)
    dt_scipy = time.perf_counter() - t0

    assert dt_native < dt_scipy, (dt_native, dt_scipy)


def test_heatmap_build_failure_keeps_core_available(monkeypatch):
    """The reason the engine ships as TWO libraries: a host that cannot
    build the zlib-dependent heatmap kernels must keep the dep-free
    preprocessing/digitizer kernels. Simulate the heatmap build failing
    and assert core stays loadable while both heatmap accessors degrade
    to their fallback signal (None)."""
    real_build = native._build

    def failing_heatmap_build(srcs, lib_path, extra_flags=()):
        if lib_path == native._HEATMAP_LIB:
            return "simulated: zlib not found"
        return real_build(srcs, lib_path, extra_flags)

    monkeypatch.setattr(native, "_build", failing_heatmap_build)
    # fresh caches so the simulated failure is actually exercised,
    # restored afterwards so other tests keep the real libraries
    monkeypatch.setattr(native, "_libs", {})
    monkeypatch.setattr(native, "_build_errors", {})

    assert native.available()
    assert not native.heatmap_available()
    assert native.maybe("ECGMM_NO_NATIVE_DIGITIZE") is native
    assert native.maybe("ECGMM_NO_NATIVE_HEATMAP", need="heatmap") is None
    # core kernels really run
    x = np.zeros((2, 300))
    assert native.remove_baseline(x, 50).shape == (2, 300)
    with pytest.raises(RuntimeError, match="zlib not found"):
        native.png_encode(np.zeros((4, 4, 3), np.uint8))
