"""Deterministic synthetic trimodal cohort.

The reference's hospital data (labels.xlsx / clinical.csv / ecg_signals.csv
/ 2500×250 lead-II JPGs) is private and not shipped. This module generates a
statistically ECG-like stand-in with the same shapes, index semantics and
class structure, used by tests, benchmarks and the serving demo. It can
also write loader-format fixture files so the real-file ingestion path is
testable end to end.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import numpy as np
import pandas as pd


class SyntheticCohort(NamedTuple):
    indices: np.ndarray        # (N,) patient ids
    labels: np.ndarray         # (N,) int {0, 1}
    signals: np.ndarray        # (N, T) float32 raw digitized lead-II
    clinical: np.ndarray       # (N, C) float32 [AGE, Wt, ...]
    images: np.ndarray         # (N, H, W, 3) uint8 rendered ECG strips
    clinical_columns: Tuple[str, ...]


def _render_strip(signal: np.ndarray, h: int, w: int) -> np.ndarray:
    """Render a 1-D trace into an (h, w, 3) uint8 image resembling the
    reference's 2500×250 lead-II strips (dark trace on light grid paper).
    Vectorised; used both to synthesise images and (inverted) to test the
    serving digitizer."""
    t = np.linspace(0, len(signal) - 1, w)
    trace = np.interp(t, np.arange(len(signal)), signal)
    lo, hi = trace.min(), trace.max()
    span = (hi - lo) or 1.0
    rows = ((1.0 - (trace - lo) / span) * (h - 3) + 1).astype(np.int64)

    img = np.full((h, w, 3), 255, np.uint8)
    img[::25, :, :] = (250, 200, 200)  # horizontal grid
    img[:, ::25, :] = (250, 200, 200)  # vertical grid
    cols = np.arange(w)
    for dy in (-1, 0, 1):  # 3-px-thick trace
        img[np.clip(rows + dy, 0, h - 1), cols, :] = (40, 40, 40)
    return img


def make_cohort(
    n: int = 244,
    signal_len: int = 2476,
    img_hw: Tuple[int, int] = (250, 2500),
    n_clinical: int = 2,
    seed: int = 42,
    abnormal_frac: float = 0.45,
) -> SyntheticCohort:
    """ECG-like cohort: abnormal class gets irregular RR intervals and
    baseline wander so the classification task is learnable."""
    rng = np.random.default_rng(seed)
    indices = np.arange(1, n + 1)
    labels = (rng.random(n) < abnormal_frac).astype(np.int64)

    t = np.arange(signal_len) / 250.0
    signals = np.zeros((n, signal_len), np.float32)
    for i in range(n):
        hr = rng.uniform(55, 95)
        jitter = 0.25 if labels[i] else 0.02
        phase = np.cumsum(
            (hr / 60.0) * (1 + jitter * rng.standard_normal(signal_len))
            / 250.0
        )
        beats = np.exp(-np.square(((phase % 1.0) - 0.5) * 18))
        wander = (0.4 if labels[i] else 0.1) * np.sin(
            2 * np.pi * rng.uniform(0.1, 0.5) * t + rng.uniform(0, 6)
        )
        noise = 0.04 * rng.standard_normal(signal_len)
        signals[i] = (beats + wander + noise).astype(np.float32)

    age = rng.uniform(25, 85, n) + 6.0 * labels
    wt = rng.uniform(45, 95, n)
    extra = rng.standard_normal((n, max(0, n_clinical - 2)))
    clinical = np.column_stack([age, wt, extra]).astype(np.float32)
    cols = ("AGE", "Wt") + tuple(f"VAR{i}" for i in range(n_clinical - 2))

    h, w = img_hw
    images = np.stack([_render_strip(s, h, w) for s in signals])
    return SyntheticCohort(indices, labels, signals, clinical, images, cols)


def write_fixture_tree(
    root: str, cohort: Optional[SyntheticCohort] = None, n: int = 24
) -> SyntheticCohort:
    """Write the cohort to disk in the reference's on-disk layout:
    labels csv (xlsx surrogate), clinical.csv, ecg_signals.csv,
    images/<idx>/<idx:03d>ECG_lead2.jpg (reference dataset.py:58-60,
    127-130). Used by loader round-trip tests."""
    from PIL import Image

    cohort = cohort or make_cohort(n=n, img_hw=(50, 500))
    os.makedirs(root, exist_ok=True)

    labels_df = pd.DataFrame(
        {
            "index": cohort.indices,
            "label": np.where(cohort.labels == 1, "Abnormal", "Normal"),
        }
    )
    # every ~8th sample Borderline to exercise the drop path
    labels_df.loc[labels_df.index % 8 == 5, "label"] = "Borderline"
    labels_df.to_csv(os.path.join(root, "labels.csv"), index=False)

    clin = pd.DataFrame(cohort.clinical, columns=list(cohort.clinical_columns))
    clin.insert(0, "index", cohort.indices)
    clin["ECG"] = "unused"  # dropped by the loader (dataset.py:129)
    clin.to_csv(os.path.join(root, "clinical.csv"), index=False)

    sig = pd.DataFrame(cohort.signals, index=cohort.indices)
    sig.to_csv(os.path.join(root, "ecg_signals.csv"))

    img_dir = os.path.join(root, "images")
    for i, idx in enumerate(cohort.indices):
        d = os.path.join(img_dir, str(idx))
        os.makedirs(d, exist_ok=True)
        Image.fromarray(cohort.images[i]).save(
            os.path.join(d, f"{str(idx).zfill(3)}ECG_lead2.jpg")
        )
    return cohort
