"""Metric parity vs sklearn (incl. tie handling and degenerate classes)."""

import numpy as np
import pytest
from sklearn.metrics import (
    accuracy_score,
    f1_score,
    roc_auc_score,
    confusion_matrix as sk_cm,
)

import jax.numpy as jnp

from ecgmm_tpu.train import metrics as M


@pytest.fixture()
def binary_case(rng):
    labels = (rng.random(200) < 0.35).astype(np.int32)
    scores = np.clip(
        labels * 0.3 + rng.normal(0.4, 0.25, 200), 0, 1
    ).astype(np.float32)
    preds = (scores >= 0.5).astype(np.int32)
    return labels, scores, preds


def test_accuracy_f1(binary_case):
    labels, scores, preds = binary_case
    assert float(
        M.accuracy(jnp.asarray(preds), jnp.asarray(labels))
    ) == pytest.approx(accuracy_score(labels, preds))
    assert float(
        M.binary_f1(jnp.asarray(preds), jnp.asarray(labels))
    ) == pytest.approx(f1_score(labels, preds), abs=1e-6)


def test_macro_f1(rng):
    labels = rng.integers(0, 3, 300)
    preds = rng.integers(0, 3, 300)
    got = float(M.macro_f1(jnp.asarray(preds), jnp.asarray(labels), 3))
    want = f1_score(labels, preds, average="macro")
    assert got == pytest.approx(want, abs=1e-6)


def test_auroc_matches_sklearn(binary_case):
    labels, scores, _ = binary_case
    got = float(M.auroc(jnp.asarray(scores), jnp.asarray(labels)))
    want = roc_auc_score(labels, scores)
    assert got == pytest.approx(want, abs=1e-6)


def test_auroc_with_ties(rng):
    labels = rng.integers(0, 2, 100)
    scores = rng.integers(0, 5, 100).astype(np.float32) / 4  # heavy ties
    got = float(M.auroc(jnp.asarray(scores), jnp.asarray(labels)))
    want = roc_auc_score(labels, scores)
    assert got == pytest.approx(want, abs=1e-6)


def test_auroc_single_class_nan():
    labels = np.zeros(10, np.int32)
    scores = np.linspace(0, 1, 10).astype(np.float32)
    assert np.isnan(float(M.auroc(jnp.asarray(scores), jnp.asarray(labels))))


def test_auroc_masked(binary_case):
    labels, scores, _ = binary_case
    mask = np.ones(200, np.float32)
    mask[150:] = 0.0
    got = float(
        M.auroc(jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(mask))
    )
    want = roc_auc_score(labels[:150], scores[:150])
    assert got == pytest.approx(want, abs=1e-6)


def test_auroc_ovr_macro(rng):
    labels = rng.integers(0, 3, 300)
    logits = rng.normal(size=(300, 3)) + np.eye(3)[labels] * 1.5
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    got = float(
        M.auroc_ovr_macro(jnp.asarray(probs), jnp.asarray(labels), 3)
    )
    want = roc_auc_score(labels, probs, multi_class="ovr", average="macro")
    assert got == pytest.approx(want, abs=1e-6)


def test_confusion_matrix(binary_case):
    labels, _, preds = binary_case
    np.testing.assert_array_equal(
        M.confusion_matrix(preds, labels, 2), sk_cm(labels, preds)
    )


def test_find_best_threshold_matches_reference_grid(binary_case):
    labels, scores, _ = binary_case
    t, f1 = M.find_best_threshold(labels, scores)
    # reference grid: np.arange(0.1, 0.9, 0.05) argmax of sklearn f1
    grid = np.arange(0.1, 0.9, 0.05)
    want_scores = [f1_score(labels, scores >= g) for g in grid]
    assert t == pytest.approx(grid[int(np.argmax(want_scores))])
    assert f1 == pytest.approx(np.max(want_scores), abs=1e-6)


def test_summarize_binary(binary_case):
    labels, scores, preds = binary_case
    out = M.summarize_binary(scores, labels)
    assert out["accuracy"] == pytest.approx(accuracy_score(labels, preds))
    assert out["auroc"] == pytest.approx(
        roc_auc_score(labels, scores), abs=1e-6
    )


def test_losses_match_torch_reference(rng):
    """cross_entropy and focal_loss must reproduce the reference's torch
    formulations bit-for-bit at f32: F.cross_entropy for CE
    (train.py:69-78) and the exp(-CE)-based FocalLoss(alpha=1, gamma=2)
    of signal_model.py:91-106."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from ecgmm_tpu.train import losses as L

    logits = rng.normal(0, 2, (64, 3)).astype(np.float32)
    labels = rng.integers(0, 3, 64).astype(np.int64)
    tl, ty = torch.tensor(logits), torch.tensor(labels)

    ce_torch = float(F.cross_entropy(tl, ty))
    assert float(
        L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    ) == pytest.approx(ce_torch, rel=1e-6)

    bce = F.cross_entropy(tl, ty, reduction="none")
    pt = torch.exp(-bce)
    focal_torch = float((1.0 * (1 - pt) ** 2.0 * bce).mean())
    assert float(
        L.focal_loss(jnp.asarray(logits), jnp.asarray(labels))
    ) == pytest.approx(focal_torch, rel=1e-6)
