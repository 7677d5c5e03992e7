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


# ---------------------------------------------------------------------
# Grid-pitch mV auto-calibration + strip auto-location (round 3): the
# phone photo rarely fills the frame with the strip, and absolute
# voltage scale must come from the paper's own 1 mm / 10 mm-per-mV grid
# geometry, not from an assumed image height.
# ---------------------------------------------------------------------


def _render_mv(mv_signal, grid_step=10, h=250, w=2500,
               grid_rgb=(250, 200, 200)):
    """Render a signal GIVEN IN mV at the paper's true geometry:
    1 grid square = `grid_step` px = 1 mm, 10 mm/mV."""
    px_per_mv = 10.0 * grid_step
    t = np.linspace(0, len(mv_signal) - 1, w)
    trace_mv = np.interp(t, np.arange(len(mv_signal)), mv_signal)
    rows = np.clip(
        (h / 2 - trace_mv * px_per_mv), 1, h - 2
    ).astype(np.int64)
    img = np.full((h, w, 3), 255, np.uint8)
    img[::grid_step, :, :] = grid_rgb
    img[:, ::grid_step, :] = grid_rgb
    cols = np.arange(w)
    for dy in (-1, 0, 1):
        img[np.clip(rows + dy, 0, h - 1), cols, :] = (40, 40, 40)
    return img


def _embed_in_photo(strip, photo_h=800, photo_w=3000, offset=(300, 250),
                    bg=(120, 95, 70)):
    """Paste the strip into a larger 'table' scene with a brightness
    gradient (the realistic phone framing: strip on a desk)."""
    photo = np.zeros((photo_h, photo_w, 3), np.uint8)
    ramp = np.linspace(0.8, 1.2, photo_w, dtype=np.float32)[None, :, None]
    photo[:] = np.clip(np.float32(bg) * ramp, 0, 255).astype(np.uint8)
    y0, x0 = offset
    h, w = strip.shape[:2]
    photo[y0:y0 + h, x0:x0 + w] = strip
    return photo


@pytest.mark.parametrize("step", [10, 25])
def test_grid_pitch_estimation(step):
    sig, _ = _signal(seed=12)
    img = _render(sig, grid_step=step)
    pitch = digitize.estimate_grid_pitch_px(img)
    assert pitch is not None
    assert abs(pitch - step) < 0.6, pitch


def test_grid_pitch_survives_tilt():
    """2° tilt shifts gridline phase ~90 px across the width — fatal for
    a whole-image profile, absorbed by per-band autocorrelation."""
    sig, _ = _signal(seed=13)
    img = _tilt(_render(sig, grid_step=25), 2.0)
    pitch = digitize.estimate_grid_pitch_px(img)
    assert pitch is not None
    assert abs(pitch - 25) < 1.5, pitch


def test_gridless_image_returns_none_pitch():
    sig, _ = _signal(seed=13)
    img = _render(sig, grid_rgb=(255, 255, 255))  # no grid drawn
    assert digitize.estimate_grid_pitch_px(img) is None
    # grayscale input likewise
    assert digitize.estimate_grid_pitch_px(img[..., 0]) is None


def test_grid_calibrated_absolute_millivolts():
    """Digitize a strip rendered at true 1 mm/`step` px, 10 mm/mV
    geometry WITHOUT telling the digitizer the scale: the grid pitch
    must recover absolute mV within 0.05 mV RMSE. Deskew is off — a
    random-walk test signal has a genuine linear component, and camera
    tilt vs true drift is inherently indistinguishable from one strip
    (real ECG has near-zero median slope, so the default stays on)."""
    rng = np.random.default_rng(14)
    raw = rng.standard_normal(2476).cumsum()
    raw -= np.linspace(raw[0], raw[-1], len(raw))  # remove drift
    mv_true = 0.8 * raw / (np.abs(raw).max() + 1e-9)
    img = _render_mv(mv_true, grid_step=10)
    mv = digitize.digitize_lead2(img, deskew=False)
    err = (mv - mv.mean()) - (mv_true - mv_true.mean())
    assert float(np.sqrt(np.mean(err**2))) < 0.05, err


def test_locate_strip_in_table_photo():
    strip = _render(_signal(seed=15)[0], grid_step=10)
    photo = _embed_in_photo(strip, offset=(300, 250))
    box = digitize.locate_strip(photo)
    assert box is not None
    y0, y1, x0, x1 = box
    # the box must tightly cover the known placement (±5% of each dim)
    assert abs(y0 - 300) < 60 and abs(y1 - 550) < 60
    assert abs(x0 - 250) < 160 and abs(x1 - 2750) < 160


def test_digitize_strip_on_a_table_end_to_end():
    """Full pipeline on the photo scene: locate → calibrate → digitize
    must track the ground-truth signal."""
    sig, _ = _signal(seed=16)
    photo = _embed_in_photo(_render(sig, grid_step=10))
    corr, rmse = _score(digitize.digitize_lead2(photo), sig)
    assert corr > 0.95, corr
    assert rmse < 0.25, rmse


def test_locate_full_frame_strip_is_noop():
    sig, _ = _signal(seed=17)
    img = _render(sig, grid_step=25)
    assert digitize.locate_strip(img) is None


def test_locate_brightness_fallback_gridless():
    """A gridless (e.g. photocopied) strip on a dark table: location
    falls back to the bright-paper cue."""
    sig, _ = _signal(seed=18)
    strip = _render(sig, grid_rgb=(255, 255, 255))
    photo = _embed_in_photo(strip, offset=(200, 100), bg=(60, 55, 50))
    box = digitize.locate_strip(photo)
    assert box is not None
    y0, y1, x0, x1 = box
    assert abs(y0 - 200) < 60 and abs(y1 - 450) < 60
    corr, _ = _score(digitize.digitize_lead2(photo), sig)
    assert corr > 0.95, corr


def _render_bold_paper(signal, h=250, w=2500, step=10):
    """Real ECG paper: light minor lines every 1 mm plus BOLD major
    lines every 5 mm (2 px, more saturated)."""
    t = np.linspace(0, len(signal) - 1, w)
    trace = np.interp(t, np.arange(len(signal)), signal)
    lo, hi = trace.min(), trace.max()
    rows = (
        (1.0 - (trace - lo) / ((hi - lo) or 1)) * (h - 3) + 1
    ).astype(np.int64)
    img = np.full((h, w, 3), 255, np.uint8)
    img[::step, :, :] = (250, 205, 205)
    img[:, ::step, :] = (250, 205, 205)
    for k in range(0, h, 5 * step):
        img[k:k + 2, :, :] = (242, 150, 150)
    for k in range(0, w, 5 * step):
        img[:, k:k + 2, :] = (242, 150, 150)
    cols = np.arange(w)
    for dy in (-1, 0, 1):
        img[np.clip(rows + dy, 0, h - 1), cols, :] = (40, 40, 40)
    return img


def test_bold_major_lines_dont_alias_pitch():
    """Standard paper has bold lines every 5 small squares; the pitch
    estimator must return the 1 mm minor pitch (the first
    autocorrelation peak), not the 5 mm harmonic — a 5× scale error
    would make every voltage 5× off."""
    sig, _ = _signal(seed=21)
    pitch = digitize.estimate_grid_pitch_px(_render_bold_paper(sig, step=10))
    assert abs(pitch - 10) < 0.6, pitch
    corr, rmse = _score(
        digitize.digitize_lead2(_render_bold_paper(sig, step=10)), sig
    )
    assert corr > 0.95 and rmse < 0.25, (corr, rmse)
    pitch = digitize.estimate_grid_pitch_px(_render_bold_paper(sig, step=25))
    assert abs(pitch - 25) < 1.0, pitch


def test_jpeg_block_beat_does_not_miscalibrate():
    """Quality-25 JPEG chroma blocks can beat against a 10 px grid and
    fake a 40 px period at pooled resolution — calibration must still
    recover the true pitch (full-res slice + row/col cross-check), not
    ship a 4× voltage error."""
    sig, _ = _signal(seed=22)
    img = _jpeg(_render(sig, grid_step=10), quality=25)
    pitch = digitize.estimate_grid_pitch_px(img)
    assert pitch is not None and abs(pitch - 10) < 0.6, pitch
    _, info = digitize.digitize_lead2_info(img)
    assert info["scale_source"] == "grid"


def test_motion_blur_keeps_calibration():
    """Horizontal motion blur smears the vertical gridlines but leaves
    the horizontal ones (the mV axis) intact — both axes still agree on
    the true period, so calibration survives."""
    sig, _ = _signal(seed=22)
    _, info = digitize.digitize_lead2_info(
        _motion_blur(_render(sig, grid_step=10), k=9)
    )
    assert info["scale_source"] == "grid"
    assert abs(info["grid_pitch_px"] - 10) < 0.6


def test_unreliable_grid_downgrades_to_assumed():
    """The kitchen-sink photo's grid chroma is too degraded to trust:
    the estimator must say so (scale_source 'assumed', pitch None) —
    a confidently wrong 2× scale is worse than an honest assumption."""
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
    _, info = digitize.digitize_lead2_info(img)
    assert info["scale_source"] == "assumed"
    assert info["grid_pitch_px"] is None


def test_digitize_info_metadata():
    """digitize_lead2_info reports how the digitization was done: grid
    calibration on gridded strips, 'assumed' on gridless (so the
    serving layer / client can warn), explicit passthrough, crop box on
    photo scenes, ink coverage."""
    sig, _ = _signal(seed=20)
    mv, info = digitize.digitize_lead2_info(_render(sig, grid_step=10))
    assert info["scale_source"] == "grid"
    assert abs(info["grid_pitch_px"] - 10) < 0.6
    assert abs(info["px_per_mv"] - 10 * info["grid_pitch_px"]) < 0.1
    assert info["crop"] is None
    assert info["ink_fraction"] > 0.95

    _, info = digitize.digitize_lead2_info(
        _render(sig, grid_rgb=(255, 255, 255))
    )
    assert info["scale_source"] == "assumed"
    assert info["grid_pitch_px"] is None

    _, info = digitize.digitize_lead2_info(
        _render(sig, grid_step=10), px_per_mv=120.0
    )
    assert info["scale_source"] == "explicit"
    assert info["px_per_mv"] == 120.0

    photo = _embed_in_photo(_render(sig, grid_step=10), offset=(300, 250))
    _, info = digitize.digitize_lead2_info(photo)
    assert info["crop"] is not None
    y0, y1, x0, x1 = info["crop"]
    assert abs(y0 - 300) < 60 and abs(y1 - 550) < 60


def test_blank_image_raises_no_trace():
    """A blank/overexposed photo must FAIL digitization (NoTraceError →
    HTTP 400), not silently become an all-zero 'signal' that the model
    confidently diagnoses (round-3 review finding)."""
    import pytest

    from ecgmm_tpu.serve.digitize import NoTraceError, digitize_lead2

    blank = np.full((250, 2500, 3), 245, np.uint8)
    with pytest.raises(NoTraceError, match="no ECG trace"):
        digitize_lead2(blank)


def test_smudge_in_trace_free_region_is_not_trace():
    """A mid-darkness artifact (crease shadow / pencil mark / stain,
    ~0.2 relative darkness) in columns the trace never crosses must NOT
    register as valid trace: the strip-adaptive validity floor keys off
    the real trace's much higher darkness. Regression for the round-3
    review finding on the absolute-only 0.12 floor."""
    sig, _ = _signal(seed=11)
    h, w = 250, 2500
    img = _render(sig, h=h, w=w)
    # trace only in the left 80%: blank out the right 20% to paper...
    cut = int(w * 0.8)
    img[:, cut:, :] = 255
    img[::25, cut:, :] = (250, 200, 200)  # restore the grid there
    # ...and add a faint smudge band (brightness 205 ≈ 0.20 relative
    # darkness) in the blank region, well away from the baseline row
    img[15:25, cut + 100: cut + 240, :] = 205
    trace, valid = digitize.extract_trace(img)
    assert not valid[cut + 100: cut + 240].any(), (
        "smudge columns were accepted as trace"
    )
    # end-to-end: the digitized tail must stay near the interpolated
    # baseline instead of jumping ~1 mV to the smudge rows
    mv = digitize.digitize_lead2(img, auto_locate=False)
    tail = mv[int(2476 * 0.85):]
    assert np.abs(tail - np.median(mv)).max() < 0.6, (
        "phantom excursion digitized from the smudge"
    )


def test_blurred_low_contrast_trace_still_valid():
    """The adaptive validity floor must NOT reject a genuinely
    low-contrast (motion-blurred) trace: with no darker artifact in the
    photo, the floor tracks the trace's own 90th-percentile darkness."""
    from scipy import ndimage

    sig, _ = _signal(seed=12)
    img = _render(sig)
    blurred = np.clip(
        ndimage.uniform_filter1d(img.astype(np.float32), 9, axis=1),
        0, 255,
    ).astype(np.uint8)
    corr, _ = _score(digitize.digitize_lead2(blurred), sig)
    assert corr > 0.9, corr


def test_float_dtype_image_digitizes_like_uint8():
    """Non-uint8 images (float-decoded/normalized arrays a library
    caller may hold) must take the same numpy grid path as uint8 photos
    — the dtype-pinned int16 redness subtract used to raise
    UFuncTypeError from _grid_analysis on every auto-locate call."""
    signal, _ = _signal()
    img = _render(signal)
    a = digitize.digitize_lead2(img)
    b = digitize.digitize_lead2(img.astype(np.float32))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # 0-1 normalized floats keep the grid-free darkness semantics too
    c = digitize.digitize_lead2(img.astype(np.float32) / 255.0)
    assert np.corrcoef(a, c)[0, 1] > 0.99
    # the pitch estimator must not crash either (None or a float)
    p = digitize.estimate_grid_pitch_px(img.astype(np.float64))
    assert p is None or p > 0


def test_explicit_px_per_mv_must_be_positive_finite():
    """A falsy/garbage explicit scale must be rejected, not silently
    replaced by the assumed-geometry fallback while the metadata still
    claims scale_source='explicit' (and a negative scale would flip the
    waveform sign)."""
    signal, _ = _signal()
    img = _render(signal)
    for bad in (0.0, -100.0, float("nan"), float("inf")):
        with pytest.raises(ValueError, match="px_per_mv"):
            digitize.digitize_lead2(img, px_per_mv=bad)
    # a genuine explicit scale is honored and labeled as such
    mv, info = digitize.digitize_lead2_info(img, px_per_mv=100.0)
    assert info["scale_source"] == "explicit"
    assert info["px_per_mv"] == 100.0
