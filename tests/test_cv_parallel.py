"""Fold-parallel CV engine: parity with the sequential engine.fit loop.

The fold-parallel program (train/cv_parallel.py) re-implements the
sequential fit's control flow — plateau LR, early stopping, best-state
snapshot, NaN-val handling — as masked in-device state under vmap. These
tests pin it to the sequential engine fold by fold: same per-epoch val
losses, same stop/best epochs, same best-on-test logits and AUCs.
"""

import dataclasses

import numpy as np
import pytest

import jax

from ecgmm_tpu.config import Config, ModelConfig, TrainConfig
from ecgmm_tpu.data import splits, synthetic
from ecgmm_tpu.train import cv_parallel, engine
from ecgmm_tpu.train import metrics as M
from ecgmm_tpu.workloads.run import build_model_and_task


def _signal_cfg(**kw):
    train = dict(
        batch_size=16, num_epochs=8, lr=1e-3, loss="focal",
        schedule="constant", freeze_encoders=False,
        patience=2, plateau_patience=1, donate_state=False,
    )
    train.update(kw)
    return Config(
        name="signal_only",
        train=TrainConfig(**train),
        model=ModelConfig(num_classes=2),
    )


def _inner_folds(labels, k_outer=2, k_inner=2, seed=42):
    return [
        s
        for _, _, inner in splits.nested_kfold(labels, k_outer, k_inner,
                                               seed)
        for s in inner
    ]


def _sequential_fold(task, tx, state0, arrays, tcfg):
    """The sequential reference: engine.fit(keep_best=True) + best-on-test
    scan eval — exactly cv._fold_auc's protocol, with history exposed."""
    tr, va, te = arrays
    res = engine.fit(
        task, state0, tx, tr, va, tcfg, mesh=None, verbose=False,
        keep_best=True,
    )
    best = res.best_state if res.best_state is not None else res.state
    ev = engine.evaluate_scan(task, best, te, tcfg.eval_bs, None)
    probs = np.asarray(jax.nn.softmax(jax.numpy.asarray(ev.logits))[:, 1])
    auc = float(M.auroc(jax.numpy.asarray(probs),
                        jax.numpy.asarray(ev.labels)))
    return res, ev, auc


def test_fold_parallel_matches_sequential_signal():
    """BatchNorm-bearing model (ResNet1D-SE), early stop + plateau LR
    active: per-fold val histories, stop/best epochs, test logits and
    AUCs all match the sequential loop."""
    cohort = synthetic.make_cohort(n=60, signal_len=256, img_hw=(8, 16))
    cfg = _signal_cfg()
    folds = _inner_folds(cohort.labels)
    task, tx, state0, fold_arrays = cv_parallel.prepare_folds(
        build_model_and_task, cohort, folds, cfg, mesh=None,
        apply_filter=False,
    )
    par = cv_parallel.run_fold_parallel(
        task, tx, state0, fold_arrays, cfg.train, mesh=None
    )
    assert len(par.aucs) == len(folds)

    stopped_any = False
    for f, arrays in enumerate(fold_arrays):
        res, ev, auc = _sequential_fold(task, tx, state0, arrays,
                                        cfg.train)
        seq_vhist = [h["Loss/Val"] for h in res.history]
        np.testing.assert_allclose(
            par.val_history[f][: len(seq_vhist)], seq_vhist,
            rtol=1e-3, atol=1e-4,
            err_msg=f"fold {f} val-loss history diverged",
        )
        assert par.best_epochs[f] == res.best_epoch, f"fold {f}"
        seq_stop = len(res.history) if res.stopped_early else -1
        assert par.stopped_at[f] == seq_stop, f"fold {f}"
        stopped_any = stopped_any or res.stopped_early
        np.testing.assert_allclose(
            par.logits[f], ev.logits, rtol=2e-3, atol=1e-3,
            err_msg=f"fold {f} best-on-test logits diverged",
        )
        assert par.aucs[f] == pytest.approx(auc, abs=1e-3), f"fold {f}"


def test_fold_parallel_fusion_cached_embeddings_on_mesh(mesh8):
    """Fusion head task over per-fold cached embeddings, folds sharded
    across the 8-device mesh (4 folds pad to 8): AUC parity with the
    sequential fits, frozen encoder partition broadcast (single copy)."""
    cohort = synthetic.make_cohort(
        n=48, signal_len=256, img_hw=(16, 32), n_clinical=2
    )
    cfg = Config(
        name="fusion",
        train=TrainConfig(
            batch_size=16, num_epochs=4, lr=1e-3, patience=2,
            plateau_patience=1, cache_embeddings=True,
            donate_state=False,
        ),
        model=ModelConfig(dtype="float32"),
        data=dataclasses.replace(
            Config().data, img_height=16, img_width=32, signal_len=256
        ),
    )
    folds = _inner_folds(cohort.labels)
    task, tx, state0, fold_arrays = cv_parallel.prepare_folds(
        build_model_and_task, cohort, folds, cfg, mesh=mesh8,
        apply_filter=False,
    )
    par = cv_parallel.run_fold_parallel(
        task, tx, state0, fold_arrays, cfg.train, mesh=mesh8
    )
    assert len(par.aucs) == len(folds)
    for f, arrays in enumerate(fold_arrays):
        _, ev, auc = _sequential_fold(task, tx, state0, arrays, cfg.train)
        np.testing.assert_allclose(
            par.logits[f], ev.logits, rtol=2e-3, atol=1e-3,
            err_msg=f"fold {f}",
        )
        assert par.aucs[f] == pytest.approx(auc, abs=1e-3), f"fold {f}"


def test_nested_and_exhaustive_harnesses_fold_parallel(mesh8):
    """cv.nested_cv / cv.exhaustive_cv with fold_parallel=True reproduce
    the sequential harnesses' AUCs (same folds, same protocol) through
    the public API + regrouping."""
    from ecgmm_tpu.train import cv

    cohort = synthetic.make_cohort(n=48, signal_len=192, img_hw=(8, 16))
    cfg = _signal_cfg(num_epochs=3)
    seq = cv.nested_cv(
        build_model_and_task, cohort, cfg, mesh=None,
        apply_filter=False, verbose=False,
    )
    par = cv.nested_cv(
        build_model_and_task, cohort, cfg, mesh=mesh8,
        apply_filter=False, verbose=False, fold_parallel=True,
    )
    np.testing.assert_allclose(
        par["outer_aucs"], seq["outer_aucs"], atol=2e-3
    )

    seq_e = cv.exhaustive_cv(
        build_model_and_task, cohort, cfg, k=4, mesh=None,
        apply_filter=False, max_pairs=3, verbose=False,
    )
    par_e = cv.exhaustive_cv(
        build_model_and_task, cohort, cfg, k=4, mesh=mesh8,
        apply_filter=False, max_pairs=3, verbose=False,
        fold_parallel=True,
    )
    assert [(t, v) for t, v, _ in par_e["pairs"]] == [
        (t, v) for t, v, _ in seq_e["pairs"]
    ]
    np.testing.assert_allclose(
        [a for _, _, a in par_e["pairs"]],
        [a for _, _, a in seq_e["pairs"]], atol=2e-3,
    )


def test_fold_parallel_rejects_onecycle():
    cohort = synthetic.make_cohort(n=40, signal_len=128, img_hw=(8, 16))
    cfg = _signal_cfg(schedule="onecycle", onecycle_peak_lr=1e-3)
    folds = _inner_folds(cohort.labels)
    task, tx, state0, fold_arrays = cv_parallel.prepare_folds(
        build_model_and_task, cohort, folds, cfg, mesh=None,
        apply_filter=False,
    )
    with pytest.raises(ValueError, match="fold-parallel"):
        cv_parallel.run_fold_parallel(
            task, tx, state0, fold_arrays, cfg.train, mesh=None
        )
