"""ECG image → 1-D signal digitization.

The mobile app uploads a *photo* of a lead-II strip and the (missing)
reference backend returns `ecg_signal` as digitized voltages
(`Groove/app/(tabs)/ResultScreen.tsx:26-48`). No digitization code exists
anywhere in the reference (SURVEY.md §0); this implements it for the known
2500×250 lead-II strip format:

  grayscale → per-column darkness-weighted trace-row centroid (the trace
  is the darkest ink; grid lines are light red) → gap interpolation →
  row-to-millivolt scaling from standard ECG paper geometry → resampling
  to the model's 2476 @ 250 Hz input grid.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def extract_trace(
    image: np.ndarray,
    dark_quantile: float = 0.08,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-column trace row (float) + validity mask from an RGB uint8
    strip. Columns whose darkest pixel is not clearly ink are invalid."""
    gray = np.asarray(image, np.float32).mean(-1)  # (H, W)
    h, w = gray.shape
    # adaptive ink threshold: the darkest `dark_quantile` of pixels
    thresh = np.quantile(gray, dark_quantile)
    ink = gray <= max(thresh, 1.0)

    weights = np.where(ink, 255.0 - gray, 0.0)  # darker → heavier
    colsum = weights.sum(axis=0)
    valid = colsum > 0
    rows = np.arange(h, dtype=np.float32)
    centroid = np.where(
        valid, (weights * rows[:, None]).sum(axis=0) / np.maximum(colsum, 1e-6),
        0.0,
    )
    return centroid, valid


def interpolate_gaps(trace: np.ndarray, valid: np.ndarray) -> np.ndarray:
    if valid.all():
        return trace
    if not valid.any():
        return np.zeros_like(trace)
    x = np.arange(len(trace))
    return np.interp(x, x[valid], trace[valid])


def rows_to_millivolts(
    trace_rows: np.ndarray, img_height: int,
    px_per_mv: Optional[float] = None,
) -> np.ndarray:
    """Invert (rows grow downward), centre on the median baseline, scale.
    Standard ECG paper: 10 mm/mV; the 250-px-tall reference strips span
    ~25 mm, so ≈100 px/mV by default."""
    px_per_mv = px_per_mv or img_height * 0.4
    baseline = np.median(trace_rows)
    return (baseline - trace_rows) / px_per_mv


def resample_trace(mv: np.ndarray, target_len: int = 2476) -> np.ndarray:
    x_new = np.linspace(0, len(mv) - 1, target_len)
    return np.interp(x_new, np.arange(len(mv)), mv).astype(np.float32)


def digitize_lead2(
    image: np.ndarray, target_len: int = 2476,
    px_per_mv: Optional[float] = None,
) -> np.ndarray:
    """Full pipeline: RGB strip (H, W, 3) uint8 → (target_len,) float32
    voltage series in mV."""
    trace, valid = extract_trace(image)
    trace = interpolate_gaps(trace, valid)
    mv = rows_to_millivolts(trace, image.shape[0], px_per_mv)
    return resample_trace(mv, target_len)
