"""Digitizer failure-envelope gates (tools/digitize_envelope.py).

Two layers of proof on top of the robustness matrix
(test_digitize_robust.py, which pins the INSIDE of the envelope):

  * the full 8-axis sweep to the breaking point upholds the honesty
    invariant — a ``scale_source == "grid"`` claim always carries a
    pitch within 20% of the true (degradation-adjusted) pitch, i.e. the
    digitizer may fail shape-wise beyond the envelope but never ships a
    confidently wrong voltage axis (VERDICT r4 weak-point #6);
  * focused regressions for the two failure modes the first sweep
    exposed and fixed: harmonic pitch-lock on low-resolution photos
    (serve/digitize.py _profile_period sub-harmonic veto) and the
    dark-border trim eating shadowed-but-legible trace columns
    (_trim_dark_borders ink guard).
"""

import numpy as np
import pytest

from ecgmm_tpu.serve import digitize
from ecgmm_tpu.tools import digitize_envelope as env


@pytest.fixture(scope="module")
def truth():
    return env.make_ground_truth()


def test_subharmonic_veto_rejects_aliased_pitch(truth):
    """3×/4×-downscaled 10 px grids put the true pitch below the
    estimator's 4 px minimum lag; before the veto the estimator locked
    onto the 2×/3× harmonic (row-vs-col cross-check can't catch it — a
    square grid aliases identically on both axes) and shipped a 2–3×
    wrong voltage axis as scale_source='grid'."""
    _, clean = truth
    for factor in (3, 4, 6):
        img = env.downscale(clean, factor)
        assert digitize.estimate_grid_pitch_px(img) is None, factor
        _, info = digitize.digitize_lead2_info(img)
        assert info["scale_source"] == "assumed", (factor, info)


def test_subharmonic_veto_keeps_measurable_pitches(truth):
    """The veto must not reject genuine fundamentals: pitches ≥ ~5 px
    (downscale ≤ 2) still calibrate, with accurate values."""
    _, clean = truth
    for factor, want in ((1, 10.0), (1.5, 10 / 1.5), (2, 5.0)):
        img = env.downscale(clean, factor)
        pitch = digitize.estimate_grid_pitch_px(img)
        assert pitch is not None, factor
        assert abs(pitch - want) / want < 0.1, (factor, pitch)


def test_trim_keeps_shadowed_trace_columns(truth):
    """A 0.35×/0.2× left-shadow ramp pushes the strip's edge below the
    dark-border brightness line while the trace is still legible there;
    the ink guard must keep those columns (no crop, no time-axis
    compression)."""
    mv_true, clean = truth
    for lo in (0.35, 0.2):
        img = env.shadow(clean, lo)
        mv, info = digitize.digitize_lead2_info(img)
        assert info["crop"] is None, (lo, info)
        corr, _, gain = env.score(np.asarray(mv), mv_true)
        assert corr > 0.95, (lo, corr)
        assert abs(gain - 1.0) < 0.1, (lo, gain)


def test_true_dark_border_still_trimmed():
    """The ink guard must not stop genuine dark-table trims: a strip
    pasted into a dark scene still locates and digitizes."""
    mv_true, clean = env.make_ground_truth(seed=21)
    photo = np.zeros((600, 2800, 3), np.uint8)
    photo[:] = (60, 50, 40)
    photo[150:400, 150:2650] = clean
    mv, info = digitize.digitize_lead2_info(photo)
    assert info["crop"] is not None
    y0, y1, x0, x1 = info["crop"]
    assert 100 <= y0 <= 160 and 390 <= y1 <= 450, info["crop"]
    corr, _, _ = env.score(np.asarray(mv), mv_true)
    assert corr > 0.9, corr


@pytest.mark.slow
def test_full_envelope_sweep_honesty_and_floors(truth):
    """The complete sweep: every grid claim is pitch-accurate (honesty
    invariant), and the documented inside-envelope floor holds."""
    rows = env.run_sweep()
    dishonest = [r for r in rows if not r["honest"]]
    assert not dishonest, dishonest

    INSIDE = {
        "tilt_deg": 2, "downscale": 2, "jpeg_q": (15, None),
        "vignette": 0.9, "contrast_keep": (0.1, None),
        "shadow_lo": (0.2, None), "noise_sigma": 60, "blur_px": 9,
    }
    for r in rows:
        bound = INSIDE[r["axis"]]
        if isinstance(bound, tuple):  # lower bound axis
            inside = r["param"] >= bound[0]
        else:
            inside = r["param"] <= bound
        if inside:
            assert r["scale_source"] != "no_trace", r
            assert r["corr"] is not None and r["corr"] > 0.95, r

    # beyond-envelope points exist and are all honest by construction;
    # additionally at least one axis must demonstrate each honest
    # failure mode the docs describe
    sources = {r["scale_source"] for r in rows}
    assert "assumed" in sources  # calibration downgrades
    assert "no_trace" in sources  # loud extraction failure
