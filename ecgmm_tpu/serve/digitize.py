"""ECG image → 1-D signal digitization.

The mobile app uploads a *photo* of a lead-II strip and the (missing)
reference backend returns `ecg_signal` as digitized voltages
(`Groove/app/(tabs)/ResultScreen.tsx:26-48`). No digitization code exists
anywhere in the reference (SURVEY.md §0); this implements it for the known
2500×250 lead-II strip format, robust to real-photo artifacts:

  * red-grid suppression — ECG paper grid is light red (high R channel);
    ink darkness is measured on the *brightest* channel, so a pixel is
    "ink" only if it is dark in every channel. Light-red gridlines keep a
    bright red channel and vanish from the darkness map, no matter how
    dense the grid;
  * illumination normalization — local paper brightness is estimated by a
    grayscale morphological closing (block max, then block min over a
    wider window) and darkness is measured *relative* to it. The max pass
    makes shadows / lighting gradients / vignetting irrelevant; the min
    pass keeps regions BRIGHTER than the paper (white photo margins,
    a bright table behind the strip, rotation borders) from bleeding
    into the paper estimate and turning nearby paper into phantom ink;
  * contrast-adaptive ink segmentation — a pixel is ink when it is nearly
    as dark as the darkest pixel of its own column (the trace is the
    darkest thing in every column it crosses), with an absolute floor so
    noise on trace-free columns never qualifies. Motion blur or a
    low-resolution photo can halve the trace's contrast without moving
    this per-column relative threshold;
  * deskew — camera tilt shows up as a linear trend in the per-column
    trace centroid; a Theil–Sen (median-of-pairwise-slopes) robust fit
    removes it without disturbing QRS spikes or baseline wander;
  * per-column darkness-weighted centroid → gap interpolation →
    row-to-millivolt scaling from standard ECG paper geometry →
    resampling to the model's 2476 @ 250 Hz input grid.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class NoTraceError(ValueError):
    """The uploaded image contains no discernible ECG trace — a client
    input problem (blank/overexposed/non-ECG photo), not a server
    fault; the HTTP layer maps it to a 400."""


def _block_max(brightness: np.ndarray, w: int) -> np.ndarray:
    """Per-tile maxima over w×w tiles (the block grid, NOT upsampled).
    Pure vectorized numpy — ~10× cheaper than a true sliding maximum
    filter at these strip sizes, and the paper background only needs to
    be a local upper envelope, not exact: any w×w tile of a strip photo
    contains paper because the trace is only ~3 px thick."""
    h, wid = brightness.shape
    ph, pw = (-h) % w, (-wid) % w
    padded = np.pad(brightness, ((0, ph), (0, pw)), mode="edge")
    hb, wb = padded.shape[0] // w, padded.shape[1] // w
    return padded.reshape(hb, w, wb, w).max(axis=(1, 3))


def _closing(brightness: np.ndarray, w: int) -> np.ndarray:
    """Grayscale closing on the block grid: w×w block max, then a min
    over non-overlapping 2×2 groups of blocks (a 2w×2w erosion),
    upsampled back to pixel resolution. All reductions run on the tiny
    hb×wb grid, so the cost over the plain block max is negligible."""
    h, wid = brightness.shape
    blocks = _block_max(brightness, w)
    hb, wb = blocks.shape
    bp = np.pad(blocks, ((0, hb % 2), (0, wb % 2)), mode="edge")
    closed = bp.reshape(bp.shape[0] // 2, 2, bp.shape[1] // 2, 2).min(
        axis=(1, 3)
    )
    up = np.repeat(np.repeat(closed, 2 * w, 0), 2 * w, 1)
    return up[:h, :wid]


def _local_max(brightness: np.ndarray, w: int) -> np.ndarray:
    """Per-pixel maximum over the pixel's w×w tile (block max, upsampled
    back)."""
    h, wid = brightness.shape
    blocks = _block_max(brightness, w)
    up = np.repeat(np.repeat(blocks, w, 0), w, 1)
    return up[:h, :wid]


def darkness_map(image: np.ndarray, bg_window: int = 25) -> np.ndarray:
    """Relative ink-darkness in [0, 1] from an RGB uint8 photo.

    brightness = max over channels: paper is bright in all channels, the
    light-red grid stays bright in R, the trace is dark in all — so the
    grid is suppressed without any explicit color segmentation. Darkness
    is then measured relative to the *local paper brightness*, estimated
    by a grayscale closing: a block-max upper envelope over `bg_window`
    px tiles (the trace is only ~3 px thick, so every tile sees paper)
    followed by a block-min over 2×`bg_window` tiles. The max pass makes
    shadows / lighting gradients irrelevant; the min pass stops anything
    brighter than the paper itself (white margins, rotation borders, a
    bright table behind a tilted strip) from inflating the envelope over
    nearby paper — without it, shadowed paper within `bg_window` px of a
    bright border reads as ink. The channel max runs on uint8 via
    pairwise np.maximum (a float conversion or an axis-reduce over the
    interleaved RGB layout each cost more than everything else in the
    digitizer combined)."""
    raw = np.asarray(image)
    if raw.ndim == 2:  # already grayscale
        bright_u8 = raw
    else:
        bright_u8 = np.maximum(
            np.maximum(raw[..., 0], raw[..., 1]), raw[..., 2]
        )
    paper = np.maximum(
        _closing(bright_u8, bg_window).astype(np.float32), 1.0
    )
    rel = (paper - bright_u8.astype(np.float32)) / paper
    return np.clip(rel, 0.0, 1.0)


def extract_trace(
    image: np.ndarray,
    col_frac: float = 0.6,
    abs_floor: float = 0.12,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-column trace row (float) + validity mask from an RGB uint8
    strip photo.

    Ink segmentation is contrast-adaptive per column: the trace is the
    darkest thing in every column it crosses, so a pixel counts as ink
    when its relative darkness is ≥ `col_frac` × that column's maximum
    darkness. A fixed absolute threshold fails in both directions on
    real photos — motion blur / low resolution can smear the trace to
    half its nominal contrast (ink missed), while a slanted bright
    border next to shadowed paper produces broad mid-darkness bands
    (phantom ink admitted). The per-column rule tracks the former and
    rejects the latter. `abs_floor` is the absolute minimum darkness
    for a column to be considered to contain trace at all, so sensor
    noise on trace-free columns (or a blank photo) never qualifies."""
    rel = darkness_map(image)
    h, w = rel.shape
    col_max = rel.max(axis=0)
    threshold = np.maximum(abs_floor, col_frac * col_max)[None, :]
    weights = np.where(rel >= threshold, rel, 0.0)
    colsum = weights.sum(axis=0)
    valid = (col_max >= abs_floor) & (colsum > 0)
    rows = np.arange(h, dtype=np.float32)
    centroid = np.where(
        valid,
        (weights * rows[:, None]).sum(axis=0) / np.maximum(colsum, 1e-6),
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


def theil_sen_detrend(
    trace: np.ndarray, n_pairs: int = 2000, seed: int = 0
) -> Tuple[np.ndarray, float]:
    """Remove the linear baseline trend (camera tilt / perspective shear)
    with a Theil–Sen median-of-pairwise-slopes estimate — robust to QRS
    spikes and baseline wander, unlike a least-squares fit. Returns
    (detrended trace, slope px/col)."""
    n = len(trace)
    if n < 8:
        return trace, 0.0
    rng = np.random.default_rng(seed)
    i = rng.integers(0, n, n_pairs)
    j = rng.integers(0, n, n_pairs)
    keep = np.abs(i - j) > n // 8  # well-separated pairs only
    i, j = i[keep], j[keep]
    slopes = (trace[j] - trace[i]) / (j - i)
    slope = float(np.median(slopes)) if len(slopes) else 0.0
    x = np.arange(n, dtype=np.float32)
    return trace - slope * (x - x.mean()), slope


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
    deskew: bool = True,
) -> np.ndarray:
    """Full pipeline: RGB strip photo (H, W, 3) uint8 → (target_len,)
    float32 voltage series in mV.

    Raises NoTraceError when too few columns contain ink (blank,
    overexposed or non-ECG photo): digitizing that to an all-zero
    'signal' would hand the model a flat line and return a confident
    diagnosis of nothing."""
    trace, valid = extract_trace(image)
    if valid.mean() < 0.05:
        raise NoTraceError(
            f"no ECG trace found in the image (ink in "
            f"{100 * valid.mean():.1f}% of columns) — is this a photo "
            "of an ECG strip?"
        )
    trace = interpolate_gaps(trace, valid)
    if deskew:
        trace, _ = theil_sen_detrend(trace)
    mv = rows_to_millivolts(trace, image.shape[0], px_per_mv)
    return resample_trace(mv, target_len)
