"""Native C++ digitizer kernels vs the pure-numpy implementation.

The serving digitizer (serve/digitize.py) dispatches its two expensive
sweeps — the relative-darkness map and the per-column trace centroid —
to ecgmm_tpu/native/digitize.cpp when the toolchain is available. The
contract: the darkness map and validity mask are BIT-IDENTICAL to the
numpy path (same float32 expressions; the ink-floor percentile and all
threshold comparisons stay in numpy), and centroids agree to float
accumulation tolerance (C++ sums in float64, numpy pairwise float32).
"""

import numpy as np
import pytest

from ecgmm_tpu import native
from ecgmm_tpu.serve import digitize as dg

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def _numpy_reference(image):
    """Run the pure-numpy digitizer passes regardless of the native
    engine (monkeypatch-free: call through with native disabled)."""
    import unittest.mock as mock

    with mock.patch.object(dg, "_native", return_value=None):
        rel = dg.darkness_map(image)
        centroid, valid = dg.extract_trace(image)
    return rel, centroid, valid


def _render_strip(rng, h=250, w=2500, grid=True):
    img = np.full((h, w, 3), 235, np.uint8)
    if grid:  # light-red 1 mm grid, 10 px pitch
        img[::10, :, 1:] = 205
        img[:, ::10, 1:] = 205
    rows = (h / 2 + 0.3 * h * np.sin(np.arange(w) / 40.0)).astype(int)
    for j, r in enumerate(rows):
        img[max(0, r - 1): r + 2, j] = 20
    noise = rng.integers(-6, 7, img.shape, dtype=np.int16)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


@pytest.mark.parametrize(
    "shape",
    [(250, 2500, 3), (301, 777), (130, 430, 4), (20, 30, 3)],
    ids=["strip-rgb", "grayscale", "rgba", "tiny"],
)
def test_darkness_map_bit_exact(rng, shape):
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    rel_np, _, _ = _numpy_reference(img)
    rel_nat, col_max, row_max = native.darkness_map(img)
    assert rel_nat.dtype == np.float32
    np.testing.assert_array_equal(rel_np, rel_nat)
    np.testing.assert_array_equal(col_max, rel_np.max(axis=0))
    np.testing.assert_array_equal(row_max, rel_np.max(axis=1))


def test_extract_trace_matches_numpy_on_rendered_strip(rng):
    img = _render_strip(rng)
    rel_np, cen_np, val_np = _numpy_reference(img)
    cen_nat, val_nat = dg.extract_trace(img)  # dispatches native
    np.testing.assert_array_equal(val_np, val_nat)
    np.testing.assert_allclose(cen_np, cen_nat, atol=5e-3)


def test_extract_trace_valid_mask_bit_exact_on_noise(rng):
    """Random noise puts many pixels near the ink threshold — the worst
    case for threshold-semantics drift. The mask must still be
    bit-identical because every comparison runs in numpy float32."""
    for shape in [(250, 2500, 3), (97, 113, 3), (1530, 510, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        _, cen_np, val_np = _numpy_reference(img)
        cen_nat, val_nat = dg.extract_trace(img)
        np.testing.assert_array_equal(val_np, val_nat)
        np.testing.assert_allclose(cen_np, cen_nat, atol=5e-3)


def test_trace_centroid_reuse_path(rng):
    """The ink-veto path hands extract_trace a precomputed darkness map
    (rel=...); the native dispatch must honour it."""
    img = _render_strip(rng)
    rel = dg.darkness_map(img)
    _, cen_np, val_np = _numpy_reference(img)
    cen_nat, val_nat = dg.extract_trace(img, rel=rel)
    np.testing.assert_array_equal(val_np, val_nat)
    np.testing.assert_allclose(cen_np, cen_nat, atol=5e-3)


def test_digitize_end_to_end_identical_signal(rng):
    """Full digitize_lead2_info: the mV series produced with the native
    kernels must match the numpy path to interpolation tolerance, and
    the metadata (scale source, ink fraction) must agree exactly."""
    import unittest.mock as mock

    img = _render_strip(rng)
    with mock.patch.object(dg, "_native", return_value=None):
        sig_np, info_np = dg.digitize_lead2_info(img)
    sig_nat, info_nat = dg.digitize_lead2_info(img)
    assert info_np["scale_source"] == info_nat["scale_source"]
    assert info_np["ink_fraction"] == info_nat["ink_fraction"]
    np.testing.assert_allclose(sig_np, sig_nat, atol=1e-4)


@pytest.mark.parametrize(
    "shape",
    [(1250, 1900, 3), (250, 2500, 3), (300, 400, 4), (131, 257, 3),
     (97, 64, 3)],
    ids=["scene", "strip", "rgba", "odd", "small-unpooled"],
)
def test_gridness_bit_exact(rng, shape):
    """gridness_map (full-res) and _grid_analysis (2x2-pooled) both
    dispatch to the fused native kernel — maps must be bit-identical
    and the detected pitch identical."""
    import unittest.mock as mock

    img = rng.integers(0, 256, shape, dtype=np.uint8)
    with mock.patch.object(dg, "_native", return_value=None):
        g_np = dg.gridness_map(img)
        ga_np = dg._grid_analysis(img)
    g_nat = dg.gridness_map(img)
    ga_nat = dg._grid_analysis(img)
    np.testing.assert_array_equal(g_np, g_nat)
    np.testing.assert_array_equal(ga_np[0], ga_nat[0])
    np.testing.assert_array_equal(ga_np[1], ga_nat[1])
    assert ga_np[2] == ga_nat[2]
    assert (ga_np[3] is None) == (ga_nat[3] is None)
    if ga_np[3] is not None:
        assert abs(ga_np[3] - ga_nat[3]) < 1e-9


def test_locate_strip_identical_boxes(rng):
    """Strip location (grid cue + dark-border trim) must pick the same
    box with and without the native kernels."""
    import unittest.mock as mock

    strip = _render_strip(rng)
    dark = np.full((600, 2800, 3), 35, np.uint8)
    dark[150:400, 150:2650] = strip
    scene = np.clip(
        rng.normal(170, 30, (900, 2700, 3)), 0, 255
    ).astype(np.uint8)
    scene[300:550, 100:2600] = strip
    for img in [strip, dark, scene]:
        with mock.patch.object(dg, "_native", return_value=None):
            box_np = dg.locate_strip(img)
        assert box_np == dg.locate_strip(img)


def test_env_kill_switch(rng, monkeypatch):
    monkeypatch.setenv("ECGMM_NO_NATIVE_DIGITIZE", "1")
    assert dg._native() is None
