"""Temperature scaling (train/calibrate.py).

The reference ships no probability calibration (its only output
adjustment is the F1 threshold search, signal_model.py:119-123); the
served probability is shown to a clinician, so this framework fits a
softmax temperature on the validation split at the end of every run
and the serving layer applies it. These tests cover the estimator
itself; the run → checkpoint → ServingPipeline.from_run plumbing is
covered in tests/test_integration.py.
"""

import numpy as np
import pytest

from ecgmm_tpu.train import calibrate


def _miscalibrated(n=6000, n_classes=2, t_true=3.0, seed=0):
    """Logits whose TRUE generating distribution is softmax(z / t_true)
    — i.e. the raw logits are overconfident by exactly t_true."""
    rng = np.random.default_rng(seed)
    logits = rng.normal(0.0, 2.0, (n, n_classes))
    p = calibrate.calibrated_probs(logits, t_true)
    labels = (rng.random(n)[:, None] > np.cumsum(p, axis=1)).sum(axis=1)
    return logits, labels


def test_fit_recovers_true_temperature():
    logits, labels = _miscalibrated(t_true=3.0)
    t = calibrate.fit_temperature(logits, labels)
    assert abs(t - 3.0) / 3.0 < 0.1, t


def test_fit_recovers_underconfidence_too():
    logits, labels = _miscalibrated(t_true=0.4, seed=1)
    t = calibrate.fit_temperature(logits, labels)
    assert abs(t - 0.4) / 0.4 < 0.15, t


def test_calibration_reduces_nll_and_ece():
    logits, labels = _miscalibrated(t_true=4.0, seed=2)
    t = calibrate.fit_temperature(logits, labels)
    assert calibrate.nll(logits, labels, t) < calibrate.nll(logits, labels)
    ece_raw = calibrate.expected_calibration_error(
        calibrate.calibrated_probs(logits, 1.0), labels
    )
    ece_cal = calibrate.expected_calibration_error(
        calibrate.calibrated_probs(logits, t), labels
    )
    assert ece_cal < ece_raw
    assert ece_cal < 0.05, ece_cal


def test_temperature_never_moves_argmax():
    logits, labels = _miscalibrated(t_true=5.0, seed=3)
    t = calibrate.fit_temperature(logits, labels)
    raw = calibrate.calibrated_probs(logits, 1.0).argmax(1)
    cal = calibrate.calibrated_probs(logits, t).argmax(1)
    assert (raw == cal).all()


def test_multiclass():
    logits, labels = _miscalibrated(n_classes=3, t_true=2.5, seed=4)
    t = calibrate.fit_temperature(logits, labels)
    assert abs(t - 2.5) / 2.5 < 0.15, t


def test_well_calibrated_stays_near_one():
    logits, labels = _miscalibrated(t_true=1.0, seed=5)
    t = calibrate.fit_temperature(logits, labels)
    assert 0.85 < t < 1.2, t


def test_shape_validation():
    with pytest.raises(ValueError):
        calibrate.fit_temperature(np.zeros((5,)), np.zeros(5))
    with pytest.raises(ValueError):
        calibrate.fit_temperature(np.zeros((0, 2)), np.zeros(0))


def test_ece_perfect_predictor_is_zero():
    probs = np.array([[0.0, 1.0]] * 50 + [[1.0, 0.0]] * 50)
    labels = np.array([1] * 50 + [0] * 50)
    assert calibrate.expected_calibration_error(probs, labels) < 1e-9


def test_perfectly_separated_val_returns_identity():
    """On a perfectly classified val split NLL decreases monotonically
    as T→0 — a naive fit returns the 0.05 lower bound and would SHARPEN
    every served probability ~20×. The guard must return 1.0."""
    rng = np.random.default_rng(7)
    n = 64
    labels = rng.integers(0, 2, n)
    logits = np.zeros((n, 2))
    logits[np.arange(n), labels] = 2.0 + rng.random(n)  # all correct
    assert calibrate.fit_temperature(logits, labels) == 1.0


def test_tiny_val_split_returns_identity():
    """Too few points to estimate even one parameter from."""
    logits = np.array([[2.0, 0.0], [0.0, 2.0], [2.0, 0.0]])
    labels = np.array([1, 0, 1])  # all wrong — would otherwise fit
    assert calibrate.fit_temperature(logits, labels) == 1.0


def test_bound_pinned_fit_returns_identity():
    """A fit that lands on a bound found no interior minimum — e.g.
    every prediction confidently wrong drives T to the upper bound."""
    rng = np.random.default_rng(11)
    n = 128
    labels = rng.integers(0, 2, n)
    logits = np.zeros((n, 2))
    logits[np.arange(n), 1 - labels] = 50.0  # all wrong, huge margin
    assert calibrate.fit_temperature(logits, labels) == 1.0
