"""Patient-index alignment and label mapping.

Reproduces the reference's exact cohort-construction semantics
(`/root/reference/dataset.py:126-162`): drop 'Borderline', map
Normal→0/Abnormal→1, intersect patient indices across the four modality
sources, and subtract the known-missing image set.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence, Set

import numpy as np
import pandas as pd

# Canonical binary task (reference dataset.py:134).
LABEL_MAP_BINARY = {"Normal": 0, "Abnormal": 1}
# AF task (reference train_signal_only_af.py:81-82).
LABEL_MAP_AF = {"Abnormal": 0, "AF": 1, "Borderline": 0}
# Arrhythmia task (reference train_signal_only_arr.py:84-86).
LABEL_MAP_ARR = {"Abnormal": 0, "Arrhythmia": 1}


def filter_and_map_labels(
    labels_df: pd.DataFrame,
    label_map: Dict[str, int] = LABEL_MAP_BINARY,
    drop: Sequence[str] = (),
) -> pd.DataFrame:
    """Map string labels to ints, dropping any label not in the map
    (reference dataset.py:133-134 — 'Borderline' is absent from the
    binary map, so it drops; LABEL_MAP_AF keeps Borderline as class 0
    and 'Normal' drops as unmapped, train_signal_only_af.py:81-82).
    `drop` force-excludes additional labels that ARE in the map."""
    df = labels_df[~labels_df["label"].isin(drop)].copy()
    df["label"] = df["label"].map(label_map)
    df = df[df["label"].notna()]
    df["label"] = df["label"].astype(np.int64)
    df["index"] = df["index"].astype(int)
    return df.reset_index(drop=True)


def intersect_indices(
    label_indices: Iterable[int],
    ecg_indices: Iterable[int],
    clinical_indices: Iterable[int],
    image_indices: Optional[Iterable[int]] = None,
    known_missing: Iterable[int] = (),
) -> Set[int]:
    """Four-way patient-index intersection minus the known-missing image
    set (reference dataset.py:144-158)."""
    common = set(map(int, label_indices)) & set(map(int, ecg_indices)) & set(
        map(int, clinical_indices)
    )
    if image_indices is not None:
        common &= set(map(int, image_indices)) - set(map(int, known_missing))
    return common


def align_frames(
    labels_df: pd.DataFrame,
    ecg_signals: pd.DataFrame,
    clinical_df: pd.DataFrame,
    common: Set[int],
):
    """Restrict all three frames to the common cohort, preserving each
    frame's own ordering (reference dataset.py:160-162)."""
    labels_df = labels_df[labels_df["index"].isin(common)].reset_index(drop=True)
    ecg_signals = ecg_signals.loc[ecg_signals.index.isin(common)]
    clinical_df = clinical_df[clinical_df["index"].isin(common)].reset_index(
        drop=True
    )
    return labels_df, ecg_signals, clinical_df
