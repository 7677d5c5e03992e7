"""Digitizer robustness matrix: real-photo artifacts — dense red
gridlines, lighting/shadow gradients, sensor noise, camera tilt, and
their combination — must still digitize to a signal that tracks the
rendered ground truth (correlation + affine-aligned relative RMSE
bounds). The product's actual input is a phone photo
(`/root/reference/Groove/components/SubmitButton.tsx:35-48`), not a
clean export; VERDICT r2 weak-point #3."""

import numpy as np
import pytest

from ecgmm_tpu.data import synthetic
from ecgmm_tpu.serve import digitize


def _signal(seed=0, n=2476):
    cohort = synthetic.make_cohort(n=1, signal_len=n, seed=seed,
                                   img_hw=(250, 2500))
    return cohort.signals[0], cohort.images[0]


def _render(signal, h=250, w=2500, grid_step=25, grid_rgb=(250, 200, 200)):
    """Strip render with configurable grid density/color (the synthetic
    module's renderer with heavier grids for stress cases)."""
    t = np.linspace(0, len(signal) - 1, w)
    trace = np.interp(t, np.arange(len(signal)), signal)
    lo, hi = trace.min(), trace.max()
    span = (hi - lo) or 1.0
    rows = ((1.0 - (trace - lo) / span) * (h - 3) + 1).astype(np.int64)
    img = np.full((h, w, 3), 255, np.uint8)
    img[::grid_step, :, :] = grid_rgb
    img[:, ::grid_step, :] = grid_rgb
    cols = np.arange(w)
    for dy in (-1, 0, 1):
        img[np.clip(rows + dy, 0, h - 1), cols, :] = (40, 40, 40)
    return img


def _shadow(img, lo=0.55):
    """Horizontal lighting gradient: left side in shadow."""
    w = img.shape[1]
    ramp = np.linspace(lo, 1.0, w, dtype=np.float32)[None, :, None]
    return np.clip(img.astype(np.float32) * ramp, 0, 255).astype(np.uint8)


def _noise(img, sigma=12, seed=0):
    rng = np.random.default_rng(seed)
    out = img.astype(np.float32) + rng.normal(0, sigma, img.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def _tilt(img, degrees=3.0):
    from scipy import ndimage

    return np.clip(
        ndimage.rotate(
            img.astype(np.float32), degrees, axes=(1, 0), reshape=True,
            order=1, mode="constant", cval=255.0,
        ),
        0, 255,
    ).astype(np.uint8)


def _score(mv, signal):
    """(pearson correlation, affine-aligned relative RMSE)."""
    a = signal - signal.mean()
    b = mv - mv.mean()
    corr = float((a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    # best affine map mv → signal, residual relative to signal RMS
    A = np.stack([mv, np.ones_like(mv)], 1)
    coef, *_ = np.linalg.lstsq(A, signal, rcond=None)
    resid = signal - A @ coef
    rel_rmse = float(
        np.sqrt(np.mean(resid**2)) / (np.sqrt(np.mean(a**2)) + 1e-9)
    )
    return corr, rel_rmse


def test_red_grid_suppression_dense_grid():
    """5×-denser, more saturated red grid than the clean render — the
    max-channel darkness map must keep it invisible."""
    sig, _ = _signal(seed=3)
    img = _render(sig, grid_step=5, grid_rgb=(245, 150, 150))
    corr, rmse = _score(digitize.digitize_lead2(img), sig)
    assert corr > 0.95, corr
    assert rmse < 0.25, rmse


def test_darkness_map_zero_on_grid_pixels():
    sig, _ = _signal(seed=4)
    img = _render(sig, grid_step=10, grid_rgb=(250, 170, 170))
    rel = digitize.darkness_map(img)
    grid_only = img[::10, :, 0] == 250  # grid rows, minus trace pixels
    assert float(rel[::10, :][grid_only].max()) < 0.1


def test_shadow_gradient():
    sig, _ = _signal(seed=5)
    img = _shadow(_render(sig), lo=0.55)
    corr, rmse = _score(digitize.digitize_lead2(img), sig)
    assert corr > 0.95, corr
    assert rmse < 0.25, rmse


def test_sensor_noise():
    sig, _ = _signal(seed=6)
    img = _noise(_render(sig), sigma=12)
    corr, rmse = _score(digitize.digitize_lead2(img), sig)
    assert corr > 0.9, corr
    assert rmse < 0.35, rmse


@pytest.mark.parametrize("degrees", [-3.0, 2.0])
def test_camera_tilt_deskew(degrees):
    sig, _ = _signal(seed=7)
    img = _tilt(_render(sig), degrees)
    corr, _ = _score(digitize.digitize_lead2(img), sig)
    assert corr > 0.85, corr
    # without deskew the tilt trend dominates and correlation collapses
    corr_raw, _ = _score(
        digitize.digitize_lead2(img, deskew=False), sig
    )
    assert corr > corr_raw + 0.05


def test_combined_photo_artifacts():
    """Grid + shadow + noise + tilt together — the realistic phone-photo
    case."""
    sig, _ = _signal(seed=8)
    img = _tilt(_noise(_shadow(_render(sig, grid_step=10)), sigma=8), 1.5)
    corr, _ = _score(digitize.digitize_lead2(img), sig)
    assert corr > 0.85, corr


def test_millivolt_scale_accuracy():
    """With the render's known px/mV geometry supplied, absolute mV RMSE
    must stay within 0.1 mV-equivalent units on a clean strip."""
    sig, _ = _signal(seed=9)
    h = 250
    img = _render(sig, h=h)
    span = float(sig.max() - sig.min()) or 1.0
    px_per_unit = (h - 3) / span
    mv = digitize.digitize_lead2(img, px_per_mv=px_per_unit)
    err = (mv - mv.mean()) - (sig - sig.mean())
    assert float(np.sqrt(np.mean(err**2))) < 0.1


def test_blank_image_raises_no_trace():
    """A blank/overexposed photo must FAIL digitization (NoTraceError →
    HTTP 400), not silently become an all-zero 'signal' that the model
    confidently diagnoses (round-3 review finding)."""
    import pytest

    from ecgmm_tpu.serve.digitize import NoTraceError, digitize_lead2

    blank = np.full((250, 2500, 3), 245, np.uint8)
    with pytest.raises(NoTraceError, match="no ECG trace"):
        digitize_lead2(blank)
