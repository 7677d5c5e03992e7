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


def _jpeg(img, quality=25):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return np.asarray(Image.open(io.BytesIO(buf.getvalue())))


def _motion_blur(img, k=9):
    from scipy import ndimage

    kern = np.full((1, k), 1.0 / k)
    out = np.stack(
        [
            ndimage.convolve(img[..., c].astype(np.float32), kern,
                             mode="nearest")
            for c in range(3)
        ],
        -1,
    )
    return np.clip(out, 0, 255).astype(np.uint8)


def _vignette(img, strength=0.45):
    h, w = img.shape[:2]
    y = np.linspace(-1, 1, h)[:, None]
    x = np.linspace(-1, 1, w)[None, :]
    factor = 1.0 - strength * (x**2 + y**2) / 2
    return np.clip(
        img.astype(np.float32) * factor[..., None], 0, 255
    ).astype(np.uint8)


def _perspective(img, shear=0.15):
    """Vertical scale varying across the width — the first-order effect
    of photographing the strip at an angle."""
    from scipy import ndimage

    h, w = img.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    scale = 1.0 + shear * (xx / w - 0.5) * 2
    src_y = (yy - h / 2) / scale + h / 2
    out = np.stack(
        [
            ndimage.map_coordinates(
                img[..., c].astype(np.float32), [src_y, xx], order=1,
                mode="constant", cval=255.0,
            )
            for c in range(3)
        ],
        -1,
    )
    return np.clip(out, 0, 255).astype(np.uint8)


def _downscale(img, factor=4):
    from PIL import Image

    h, w = img.shape[:2]
    return np.asarray(
        Image.fromarray(img).resize((w // factor, h // factor))
    )


def test_jpeg_compression():
    """Aggressive JPEG (quality 25) — block artifacts and chroma smear
    must not disturb the darkness map."""
    sig, _ = _signal(seed=11)
    img = _jpeg(_render(sig, grid_step=10), quality=25)
    corr, rmse = _score(digitize.digitize_lead2(img), sig)
    assert corr > 0.95, corr
    assert rmse < 0.25, rmse


def test_motion_blur():
    """9-px horizontal motion blur halves the trace's contrast; the
    per-column adaptive ink threshold must follow it down."""
    sig, _ = _signal(seed=11)
    img = _motion_blur(_render(sig, grid_step=10), k=9)
    corr, rmse = _score(digitize.digitize_lead2(img), sig)
    assert corr > 0.95, corr
    assert rmse < 0.3, rmse


def test_vignette():
    sig, _ = _signal(seed=11)
    img = _vignette(_render(sig, grid_step=10), strength=0.45)
    corr, rmse = _score(digitize.digitize_lead2(img), sig)
    assert corr > 0.95, corr
    assert rmse < 0.25, rmse


def test_perspective_shear():
    """Off-axis camera: vertical scale varies 15% across the width. The
    Theil–Sen detrend absorbs the first-order trend."""
    sig, _ = _signal(seed=11)
    img = _perspective(_render(sig, grid_step=10), shear=0.15)
    corr, rmse = _score(digitize.digitize_lead2(img), sig)
    assert corr > 0.95, corr
    assert rmse < 0.25, rmse


def test_low_resolution_photo():
    """4× downscale (625×62 strip): the trace is subpixel-thin and
    anti-aliased to low contrast."""
    sig, _ = _signal(seed=11)
    img = _downscale(_render(sig, grid_step=10), factor=4)
    corr, rmse = _score(digitize.digitize_lead2(img), sig)
    assert corr > 0.95, corr
    assert rmse < 0.3, rmse


def test_kitchen_sink_phone_photo():
    """Everything at once: shadow + sensor noise + tilt + vignette +
    motion blur + JPEG — the worst realistic phone capture. The
    closing-based paper envelope is what keeps the tilt border from
    turning shadowed paper into phantom ink here."""
    sig, _ = _signal(seed=11)
    img = _jpeg(
        _motion_blur(
            _vignette(
                _tilt(_noise(_shadow(_render(sig, grid_step=10)), 8), 1.5),
                0.3,
            ),
            3,
        ),
        45,
    )
    corr, _ = _score(digitize.digitize_lead2(img), sig)
    assert corr > 0.8, corr


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
