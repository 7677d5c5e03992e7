"""Deterministic dataset splitting.

Delegates to sklearn so the index sets are *bit-identical* to the
reference's seed-42 splits:
  * stratified 8:1:1 via two chained train_test_splits
    (reference dataset.py:167-173),
  * PTB-XL 60/20/20 (reference train_signal_only_ptb.py:227-228),
  * PhysioNet 70/10/20 (reference train_physionet_multi.py:91-96),
  * nested StratifiedKFold 5×3 (reference train_kfold.py:137-155),
  * exhaustive all-(test,val)-fold-pairs (reference
    train_exhausted.py:167-191).
"""

from __future__ import annotations

from typing import Iterator, List, NamedTuple, Tuple

import numpy as np
from sklearn.model_selection import StratifiedKFold, train_test_split


class Split(NamedTuple):
    train: np.ndarray
    val: np.ndarray
    test: np.ndarray


def stratified_811(labels: np.ndarray, seed: int = 42) -> Split:
    """80/10/10: test_size=0.2 then 0.5/0.5 on the remainder
    (reference dataset.py:167-173)."""
    indices = np.arange(len(labels))
    train_idx, temp_idx, _, temp_y = train_test_split(
        indices, labels, test_size=0.2, stratify=labels, random_state=seed
    )
    val_idx, test_idx = train_test_split(
        temp_idx, test_size=0.5, stratify=temp_y, random_state=seed
    )
    return Split(train_idx, val_idx, test_idx)


def stratified_622(labels: np.ndarray, seed: int = 42) -> Split:
    """60/20/20 (reference train_signal_only_ptb.py:227-228)."""
    indices = np.arange(len(labels))
    train_idx, temp_idx, _, temp_y = train_test_split(
        indices, labels, test_size=0.4, stratify=labels, random_state=seed
    )
    val_idx, test_idx = train_test_split(
        temp_idx, test_size=0.5, stratify=temp_y, random_state=seed
    )
    return Split(train_idx, val_idx, test_idx)


def stratified_712(labels: np.ndarray, seed: int = 42) -> Split:
    """70/10/20 (reference train_physionet_multi.py:91-96)."""
    indices = np.arange(len(labels))
    train_idx, temp_idx, _, temp_y = train_test_split(
        indices, labels, test_size=0.3, stratify=labels, random_state=seed
    )
    val_idx, test_idx = train_test_split(
        temp_idx, test_size=2 / 3, stratify=temp_y, random_state=seed
    )
    return Split(train_idx, val_idx, test_idx)


def nested_kfold(
    labels: np.ndarray, k_outer: int = 5, k_inner: int = 3, seed: int = 42
) -> Iterator[Tuple[int, np.ndarray, List[Split]]]:
    """Nested CV: for each outer fold, yield (fold_id, outer_test_idx,
    [inner Split(train, val, test=outer_test)]) —
    reference train_kfold.py:137-172."""
    indices = np.arange(len(labels))
    outer = StratifiedKFold(n_splits=k_outer, shuffle=True, random_state=seed)
    for fold_id, (outer_train, outer_test) in enumerate(
        outer.split(indices, labels)
    ):
        inner = StratifiedKFold(
            n_splits=k_inner, shuffle=True, random_state=seed
        )
        inner_splits = [
            Split(outer_train[tr], outer_train[va], outer_test)
            for tr, va in inner.split(outer_train, labels[outer_train])
        ]
        yield fold_id, outer_test, inner_splits


def exhaustive_fold_pairs(
    labels: np.ndarray, k: int = 10, seed: int = 42
) -> Iterator[Tuple[int, int, Split]]:
    """All k×(k−1) ordered (test_fold, val_fold) pairs over a single k-fold
    partition (reference train_exhausted.py:167-191)."""
    indices = np.arange(len(labels))
    kf = StratifiedKFold(n_splits=k, shuffle=True, random_state=seed)
    folds = [te for _, te in kf.split(indices, labels)]
    for ti in range(k):
        for vi in range(k):
            if vi == ti:
                continue
            test_idx = folds[ti]
            val_idx = folds[vi]
            mask = np.ones(len(labels), dtype=bool)
            mask[test_idx] = False
            mask[val_idx] = False
            yield ti, vi, Split(indices[mask], val_idx, test_idx)


def manual_split(n: int, val_indices, test_indices) -> Split:
    """Pinned val/test index lists, everything else train — the
    reference's hardcoded-index workflow (signal_model_split.py:170-171;
    dataset.py:191-192 prints these lists for pinning)."""
    val = np.asarray(sorted(val_indices), dtype=np.int64)
    test = np.asarray(sorted(test_indices), dtype=np.int64)
    if np.intersect1d(val, test).size:
        raise ValueError("val/test index lists overlap")
    mask = np.ones(n, dtype=bool)
    mask[val] = False
    mask[test] = False
    return Split(np.arange(n)[mask], val, test)


def manual_af_split(
    labels: np.ndarray, seed: int = 42
) -> Split:
    """Tiny-positive AF regime (reference train_signal_only_af.py:95-112):
    shuffled AF positives go 2 to train and the REST to test (none in
    val); negatives go 68 train / 22 val / rest test. Degenerate by
    design — preserved so downstream metric NaN-handling is exercised.
    Uses one np.random.seed stream for both shuffles, like the
    reference."""
    rng = np.random.RandomState(seed)
    af_idx = np.where(labels == 1)[0].copy()
    neg_idx = np.where(labels == 0)[0].copy()
    rng.shuffle(af_idx)
    rng.shuffle(neg_idx)
    n_train_neg = min(68, len(neg_idx))
    n_val_neg = min(22, max(0, len(neg_idx) - n_train_neg))
    return Split(
        train=np.concatenate([af_idx[:2], neg_idx[:n_train_neg]]),
        val=neg_idx[n_train_neg:n_train_neg + n_val_neg],
        test=np.concatenate(
            [af_idx[2:], neg_idx[n_train_neg + n_val_neg:]]
        ),
    )
