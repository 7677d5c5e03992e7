"""Evaluation metrics: accuracy / F1 / AUROC / confusion matrix /
classification report / decision-threshold search.

The reference computes these on host with sklearn after gathering all
logits (`/root/reference/train.py:200-336`). Here AUROC and friends are
also implemented in pure JAX (rank-statistic AUC) so they can run on
device inside a jitted eval, with sklearn-parity tests; host wrappers keep
the same NaN semantics the reference relies on for degenerate tiny-data
regimes (single-class AUC → NaN, train.py:225-228).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def accuracy(preds: jnp.ndarray, labels: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    correct = (preds == labels).astype(jnp.float32)
    if mask is None:
        return jnp.mean(correct)
    return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def binary_f1(preds: jnp.ndarray, labels: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """F1 for the positive class (sklearn f1_score default)."""
    if mask is None:
        mask = jnp.ones_like(preds, jnp.float32)
    tp = jnp.sum((preds == 1) * (labels == 1) * mask)
    fp = jnp.sum((preds == 1) * (labels == 0) * mask)
    fn = jnp.sum((preds == 0) * (labels == 1) * mask)
    return 2.0 * tp / jnp.maximum(2.0 * tp + fp + fn, 1e-12)


def macro_f1(preds: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if mask is None:
        mask = jnp.ones_like(preds, jnp.float32)
    f1s = []
    for c in range(num_classes):
        tp = jnp.sum((preds == c) * (labels == c) * mask)
        fp = jnp.sum((preds == c) * (labels != c) * mask)
        fn = jnp.sum((preds != c) * (labels == c) * mask)
        f1s.append(2.0 * tp / jnp.maximum(2.0 * tp + fp + fn, 1e-12))
    return jnp.mean(jnp.stack(f1s))


def auroc(scores: jnp.ndarray, labels: jnp.ndarray,
          mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Binary ROC-AUC via the rank-statistic (Mann–Whitney U) formulation
    with midrank tie handling — matches sklearn.roc_auc_score exactly.
    Returns NaN when a class is absent (sklearn raises; the reference
    catches that and records NaN, train.py:225-228)."""
    if mask is None:
        mask = jnp.ones_like(scores, jnp.float32)
    # Masked-out entries are pushed above every kept score so they occupy
    # the top ranks without perturbing the kept entries' midranks, and are
    # excluded from the positive-rank sum and the pair counts below.
    labels = labels.astype(jnp.float32) * mask
    scores = jnp.where(mask > 0, scores, jnp.inf)
    n_pos = jnp.sum(labels)
    n_neg = jnp.sum(mask) - n_pos

    order = jnp.argsort(scores)
    s_sorted = scores[order]
    # midranks: average rank over tied groups, computed via segment sums
    n = scores.shape[0]
    ranks = jnp.arange(1, n + 1, dtype=jnp.float32)
    # group ids for equal scores
    new_group = jnp.concatenate(
        [jnp.array([True]), s_sorted[1:] != s_sorted[:-1]]
    )
    gid = jnp.cumsum(new_group) - 1
    gsum = jax.ops.segment_sum(ranks, gid, num_segments=n)
    gcnt = jax.ops.segment_sum(jnp.ones_like(ranks), gid, num_segments=n)
    midrank_sorted = (gsum / jnp.maximum(gcnt, 1.0))[gid]
    midranks = jnp.zeros(n, jnp.float32).at[order].set(midrank_sorted)

    r_pos = jnp.sum(midranks * labels * mask)
    auc = (r_pos - n_pos * (n_pos + 1) / 2.0) / jnp.maximum(
        n_pos * n_neg, 1e-12
    )
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, jnp.nan)


def auroc_ovr_macro(probs: jnp.ndarray, labels: jnp.ndarray,
                    num_classes: int,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """One-vs-rest macro AUC (reference train_physionet_multi.py:326-368).
    Degenerate splits deviate deliberately (PARITY.md): the reference's
    sklearn call raises and records NaN for the WHOLE metric when any
    class is absent; here absent classes contribute NaN and nanmean
    reports the mean over the classes that exist."""
    aucs = [
        auroc(probs[:, c], (labels == c).astype(jnp.int32), mask)
        for c in range(num_classes)
    ]
    return jnp.nanmean(jnp.stack(aucs))


def confusion_matrix(preds: np.ndarray, labels: np.ndarray,
                     num_classes: int) -> np.ndarray:
    cm = np.zeros((num_classes, num_classes), np.int64)
    np.add.at(cm, (labels.astype(int), preds.astype(int)), 1)
    return cm


def find_best_threshold(
    y_true: np.ndarray, y_prob: np.ndarray
) -> Tuple[float, float]:
    """F1-maximising decision threshold over the reference's grid
    0.1..0.9 step 0.05 (signal_model.py:119-123). Returns (t*, f1*)."""
    thresholds = np.arange(0.1, 0.9, 0.05)
    y_true_j = jnp.asarray(y_true)
    scores = [
        float(binary_f1(jnp.asarray((y_prob >= t).astype(np.int32)), y_true_j))
        for t in thresholds
    ]
    i = int(np.argmax(scores))
    return float(thresholds[i]), float(scores[i])


def find_best_threshold_multiclass(
    y_true: np.ndarray, probs: np.ndarray, positive_class: int = 1
) -> Tuple[float, float]:
    """Multiclass variant: grid-search a decision threshold for one class
    against argmax of the rest, maximising that class's F1. The cited
    reference function (train_physionet_multi.py:208-218) is a
    degenerate no-op — its y_pred ignores the threshold entirely, so it
    always returns the first grid value; this implements the evident
    intent (PARITY.md row)."""
    thresholds = np.arange(0.1, 0.9, 0.05)
    others = np.delete(np.arange(probs.shape[1]), positive_class)
    best_t, best_f1 = 0.5, -1.0
    for t in thresholds:
        preds = np.where(
            probs[:, positive_class] >= t,
            positive_class,
            others[np.argmax(probs[:, others], axis=1)],
        )
        f1 = float(binary_f1(
            jnp.asarray((preds == positive_class).astype(np.int32)),
            jnp.asarray((y_true == positive_class).astype(np.int32)),
        ))
        if f1 > best_f1:
            best_t, best_f1 = float(t), f1
    return best_t, best_f1


def classification_report(
    preds: np.ndarray, labels: np.ndarray, num_classes: int,
    target_names: Optional[list] = None,
) -> str:
    """sklearn-style text report (precision/recall/F1/support per class)."""
    cm = confusion_matrix(preds, labels, num_classes)
    names = target_names or [str(c) for c in range(num_classes)]
    lines = [f"{'':>12} {'precision':>9} {'recall':>9} {'f1-score':>9} "
             f"{'support':>9}"]
    for c in range(num_classes):
        tp = cm[c, c]
        prec = tp / max(cm[:, c].sum(), 1)
        rec = tp / max(cm[c].sum(), 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-12)
        lines.append(
            f"{names[c]:>12} {prec:>9.4f} {rec:>9.4f} {f1:>9.4f} "
            f"{cm[c].sum():>9d}"
        )
    acc = np.trace(cm) / max(cm.sum(), 1)
    lines.append(f"{'accuracy':>12} {'':>9} {'':>9} {acc:>9.4f} "
                 f"{cm.sum():>9d}")
    return "\n".join(lines)


def summarize_binary(
    probs_pos: np.ndarray, labels: np.ndarray, threshold: float = 0.5
) -> Dict[str, float]:
    """The reference's per-test metric bundle: Acc / F1 / AUROC
    (train.py:218-232)."""
    preds = (probs_pos >= threshold).astype(np.int32)
    lj, pj = jnp.asarray(labels), jnp.asarray(preds)
    return {
        "accuracy": float(accuracy(pj, lj)),
        "f1": float(binary_f1(pj, lj)),
        "auroc": float(auroc(jnp.asarray(probs_pos), lj)),
    }
