"""Fold-parallel CV engine: parity with the sequential engine.fit loop.

The fold-parallel program (train/cv_parallel.py) re-implements the
sequential fit's control flow — plateau LR, early stopping, best-state
snapshot, NaN-val handling — as masked in-device state under vmap, over
SHARED cohort arrays gathered by global row index. These tests pin it to
the sequential engine fold by fold: same per-epoch val losses, same
stop/best epochs, same best-on-test logits and AUCs — including folds of
deliberately unequal sizes, folds whose val loss is NaN every epoch, and
budget-bounded wave execution.

Tolerances are calibrated to the observed vmap-vs-sequential float32
reassociation noise (~5e-4 on val losses at these shapes), not tighter.
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

VAL_TOL = dict(rtol=1e-3, atol=1e-3)
# observed vmap-vs-sequential drift on best-on-test logits reaches
# ~3e-3 abs after a few full epochs (amplified when folds train more
# steps or at higher effective LR) — 5e-3 gives 1.7× headroom
LOGIT_TOL = dict(rtol=5e-3, atol=5e-3)


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


def _assert_fold_parity(par, pack, task, tx, state0, tcfg,
                        val_nan_folds=()):
    """Fold-by-fold parity of a run_fold_parallel result against the
    sequential engine on the same per-fold data."""
    for f in range(pack.n_folds):
        arrays = pack.fold_arrays(f)
        res, ev, auc = _sequential_fold(task, tx, state0, arrays, tcfg)
        seq_vhist = [h["Loss/Val"] for h in res.history]
        if f in val_nan_folds:
            assert np.all(np.isnan(seq_vhist)), f"fold {f} expected NaN"
            assert np.all(np.isnan(par.val_history[f])), f"fold {f}"
        else:
            np.testing.assert_allclose(
                par.val_history[f][: len(seq_vhist)], seq_vhist,
                **VAL_TOL, err_msg=f"fold {f} val-loss history diverged",
            )
        assert par.best_epochs[f] == res.best_epoch, f"fold {f}"
        seq_stop = len(res.history) if res.stopped_early else -1
        assert par.stopped_at[f] == seq_stop, f"fold {f}"
        # A NaN-val fold never improves, so it trains EVERY epoch at the
        # never-decayed LR — vmap-vs-sequential float noise compounds
        # over more optimizer steps than in early-stopped folds
        # (observed ~3e-3 max abs at these shapes).
        tol = dict(rtol=5e-3, atol=5e-3) if f in val_nan_folds \
            else LOGIT_TOL
        np.testing.assert_allclose(
            par.logits[f], ev.logits, **tol,
            err_msg=f"fold {f} best-on-test logits diverged",
        )
        if f in val_nan_folds:
            assert par.aucs[f] == pytest.approx(auc, abs=2e-3), f"fold {f}"
        else:
            assert par.aucs[f] == pytest.approx(auc, abs=1e-3), f"fold {f}"


def test_fold_parallel_matches_sequential_signal():
    """BatchNorm-bearing model (ResNet1D-SE), early stop + plateau LR
    active: per-fold val histories, stop/best epochs, test logits and
    AUCs all match the sequential loop."""
    cohort = synthetic.make_cohort(n=60, signal_len=256, img_hw=(8, 16))
    cfg = _signal_cfg()
    folds = _inner_folds(cohort.labels)
    task, tx, state0, pack = cv_parallel.prepare_folds(
        build_model_and_task, cohort, folds, cfg, mesh=None,
        apply_filter=False,
    )
    par = cv_parallel.run_fold_parallel(
        task, tx, state0, pack, cfg.train, mesh=None
    )
    assert len(par.aucs) == len(folds)
    _assert_fold_parity(par, pack, task, tx, state0, cfg.train)


def test_fold_parallel_unequal_folds_cross_batch_boundaries():
    """Deliberately unequal folds (train 33 vs 17 rows, val 2 vs 1
    batches at bs 16) so the plan-padding machinery — batch-padded plans,
    bvalid=0 batches, update-discard masking — is actually exercised, not
    just the equal-size StratifiedKFold case."""
    cohort = synthetic.make_cohort(n=77, signal_len=192, img_hw=(8, 16))
    cfg = _signal_cfg(num_epochs=5)
    r = np.arange(77)
    folds = [
        splits.Split(train=r[:33], val=r[33:50], test=r[50:]),
        splits.Split(train=r[60:], val=r[:33], test=r[33:60]),
    ]
    task, tx, state0, pack = cv_parallel.prepare_folds(
        build_model_and_task, cohort, folds, cfg, mesh=None,
        apply_filter=False,
    )
    par = cv_parallel.run_fold_parallel(
        task, tx, state0, pack, cfg.train, mesh=None
    )
    _assert_fold_parity(par, pack, task, tx, state0, cfg.train)


def test_fold_parallel_nan_val_epochs_carry_no_signal():
    """A fold whose ENTIRE val split is NaN (degenerate data): non-finite
    val epochs neither improve nor count stale — the fold runs all
    epochs, never early-stops, and is scored on its FINAL state (the
    sequential fit's best_state=None fallback). A clean fold in the same
    program is unperturbed (the shared-cohort gather never routes the
    NaN rows into it)."""
    cohort = synthetic.make_cohort(n=48, signal_len=192, img_hw=(8, 16))
    cohort.signals[30:36] = np.nan
    r = np.arange(48)
    folds = [
        splits.Split(train=r[:30], val=r[30:36], test=r[36:]),
        splits.Split(train=r[:24], val=r[36:42], test=r[42:]),
    ]
    cfg = _signal_cfg(num_epochs=4)
    task, tx, state0, pack = cv_parallel.prepare_folds(
        build_model_and_task, cohort, folds, cfg, mesh=None,
        apply_filter=False,
    )
    par = cv_parallel.run_fold_parallel(
        task, tx, state0, pack, cfg.train, mesh=None
    )
    assert np.all(np.isnan(par.val_history[0]))
    assert par.stopped_at[0] == -1          # NaN epochs never go stale
    assert par.best_epochs[0] == -1         # nothing ever improved
    assert np.all(np.isfinite(par.val_history[1]))
    _assert_fold_parity(par, pack, task, tx, state0, cfg.train,
                        val_nan_folds={0})


def test_fold_parallel_wave_batching_under_hbm_budget(monkeypatch, capsys):
    """An HBM budget that fits ~2 folds per device splits the program
    into waves (same compiled program, sequential dispatches) with
    identical results; a budget below one fold raises with guidance."""
    cohort = synthetic.make_cohort(n=48, signal_len=128, img_hw=(8, 16))
    cfg = _signal_cfg(num_epochs=3)
    folds = _inner_folds(cohort.labels)          # 4 folds
    task, tx, state0, pack = cv_parallel.prepare_folds(
        build_model_and_task, cohort, folds, cfg, mesh=None,
        apply_filter=False,
    )
    full = cv_parallel.run_fold_parallel(
        task, tx, state0, pack, cfg.train, mesh=None
    )
    shared, per_fold = cv_parallel.fold_footprint(pack, state0)
    monkeypatch.setenv(
        "ECGMM_HBM_BUDGET_BYTES", str(shared + int(2.7 * per_fold))
    )
    waved = cv_parallel.run_fold_parallel(
        task, tx, state0, pack, cfg.train, mesh=None
    )
    assert "waves" in capsys.readouterr().out
    np.testing.assert_allclose(waved.aucs, full.aucs, atol=1e-6)
    for f in range(pack.n_folds):
        np.testing.assert_array_equal(waved.logits[f], full.logits[f])
        assert waved.best_epochs[f] == full.best_epochs[f]
    assert waved.val_history == pytest.approx(full.val_history)

    monkeypatch.setenv("ECGMM_HBM_BUDGET_BYTES", str(shared + 1024))
    with pytest.raises(ValueError, match="cannot fit even one fold"):
        cv_parallel.run_fold_parallel(
            task, tx, state0, pack, cfg.train, mesh=None
        )


def test_fold_pack_matches_sequential_build_arrays():
    """Construction parity: the pack's shared-cohort-gather view of a
    fold (global-row gather + per-fold affine, or stacked filtered
    signals) reproduces cv._build_arrays — the arrays the sequential
    harness trains on — for both the filtered and unfiltered paths."""
    from ecgmm_tpu.data import preprocess
    from ecgmm_tpu.train import cv

    cohort = synthetic.make_cohort(n=32, signal_len=128, img_hw=(8, 16))
    cfg = _signal_cfg(num_epochs=1)
    folds = _inner_folds(cohort.labels)[:2]
    n_clin = min(cfg.model.clinical_in_features, cohort.clinical.shape[1])
    for apply_filter in (False, True):
        _, _, _, pack = cv_parallel.prepare_folds(
            build_model_and_task, cohort, folds, cfg, mesh=None,
            apply_filter=apply_filter,
        )
        assert pack.signals_stacked == apply_filter
        for f, split in enumerate(folds):
            ecg_s = preprocess.Scaler.fit(cohort.signals[split.train])
            cli_s = preprocess.Scaler.fit(
                cohort.clinical[split.train, :n_clin]
            )
            got = pack.fold_arrays(f)
            for role, idx in enumerate(split):
                want = cv._build_arrays(
                    cohort, idx, ecg_s, cli_s, apply_filter, n_clin
                )
                np.testing.assert_array_equal(
                    np.asarray(got[role].images), np.asarray(want.images)
                )
                np.testing.assert_allclose(
                    np.asarray(got[role].signals),
                    np.asarray(want.signals), rtol=1e-6, atol=1e-6,
                )
                np.testing.assert_allclose(
                    np.asarray(got[role].clinical),
                    np.asarray(want.clinical), rtol=1e-6, atol=1e-6,
                )
                np.testing.assert_array_equal(
                    np.asarray(got[role].labels), np.asarray(want.labels)
                )


def test_fold_parallel_fusion_cached_embeddings_on_mesh(mesh8):
    """Fusion head task over cached embeddings, folds sharded across the
    8-device mesh (4 folds pad to 8): AUC parity with the sequential
    fits. With BN calibration (round 4, default on) each fold encodes
    with its own calibrated stats, so the image embeddings ride the pack
    STACKED (F, N, D); the seq-vs-par calibrated-encode cross-check is
    test_cohort_image_embeddings_match_per_fold_encode."""
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
    task, tx, state0, pack = cv_parallel.prepare_folds(
        build_model_and_task, cohort, folds, cfg, mesh=mesh8,
        apply_filter=False,
    )
    par = cv_parallel.run_fold_parallel(
        task, tx, state0, pack, cfg.train, mesh=mesh8
    )
    assert len(par.aucs) == len(folds)
    _assert_fold_parity(par, pack, task, tx, state0, cfg.train)


def test_cohort_image_embeddings_match_per_fold_encode():
    """The fold-parallel cached pack's embeddings equal the sequential
    cached path's calibrate-then-encode on the same fold: both calibrate
    BN stats on the fold's train rows (round 4) and encode with the
    calibrated state, so neither harness can drift from the other."""
    from ecgmm_tpu.data import preprocess
    from ecgmm_tpu.train import cv
    from ecgmm_tpu.train.embed import (
        calibrate_bn_stats,
        precompute_fusion_embeddings,
    )

    cohort = synthetic.make_cohort(
        n=32, signal_len=256, img_hw=(16, 32), n_clinical=2
    )
    cfg = Config(
        name="fusion",
        train=TrainConfig(
            batch_size=16, num_epochs=1, cache_embeddings=True,
            donate_state=False,
        ),
        model=ModelConfig(dtype="float32"),
        data=dataclasses.replace(
            Config().data, img_height=16, img_width=32, signal_len=256
        ),
    )
    folds = _inner_folds(cohort.labels)[:1]
    _, _, state0, pack = cv_parallel.prepare_folds(
        build_model_and_task, cohort, folds, cfg, mesh=None,
        apply_filter=False,
    )
    model = build_model_and_task(cfg)[0]
    n_clin = min(cfg.model.clinical_in_features, cohort.clinical.shape[1])
    ecg_s = preprocess.Scaler.fit(cohort.signals[folds[0].train])
    cli_s = preprocess.Scaler.fit(cohort.clinical[folds[0].train, :n_clin])
    raw = cv._build_arrays(cohort, folds[0].train, ecg_s, cli_s, False,
                           n_clin)
    cal = calibrate_bn_stats(model, state0, raw, cfg.train.eval_bs)
    want = precompute_fusion_embeddings(model, cal, raw,
                                        cfg.train.eval_bs)
    got = pack.fold_arrays(0)[0]
    np.testing.assert_allclose(
        np.asarray(got.images), np.asarray(want.images),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.signals), np.asarray(want.signals),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.clinical), np.asarray(want.clinical),
        rtol=1e-5, atol=1e-5,
    )


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
    """run_fold_parallel rejects per-fold-step-count schedules, and the
    harness rejects them EARLY — before any per-fold preparation work."""
    from ecgmm_tpu.train import cv

    cohort = synthetic.make_cohort(n=40, signal_len=128, img_hw=(8, 16))
    cfg = _signal_cfg(schedule="onecycle", onecycle_peak_lr=1e-3)
    folds = _inner_folds(cohort.labels)
    task, tx, state0, pack = cv_parallel.prepare_folds(
        build_model_and_task, cohort, folds, cfg, mesh=None,
        apply_filter=False,
    )
    with pytest.raises(ValueError, match="fold-parallel"):
        cv_parallel.run_fold_parallel(
            task, tx, state0, pack, cfg.train, mesh=None
        )
    with pytest.raises(ValueError, match="fold-parallel"):
        cv.nested_cv(
            build_model_and_task, cohort, cfg, mesh=None,
            apply_filter=False, verbose=False, fold_parallel=True,
        )


def test_fold_parallel_rejects_model_axis_mesh():
    """Fold-parallel requires a pure data-parallel mesh: per-fold state
    copies carry no TP annotations, so a nontrivial model axis would be
    silently replicated — it raises instead."""
    from ecgmm_tpu.config import MeshConfig
    from ecgmm_tpu.parallel import make_mesh

    cohort = synthetic.make_cohort(n=40, signal_len=128, img_hw=(8, 16))
    cfg = _signal_cfg(num_epochs=1)
    folds = _inner_folds(cohort.labels)
    task, tx, state0, pack = cv_parallel.prepare_folds(
        build_model_and_task, cohort, folds, cfg, mesh=None,
        apply_filter=False,
    )
    mesh = make_mesh(MeshConfig(n_data=4, n_model=2))
    with pytest.raises(ValueError, match="pure data-parallel"):
        cv_parallel.run_fold_parallel(
            task, tx, state0, pack, cfg.train, mesh=mesh
        )


def test_fold_parallel_activation_rows_cap(monkeypatch):
    """Raw-modality programs are wave-bounded by concurrent sample rows,
    not just data bytes: a W-fold wave backprops W x batch_size rows
    through the full encoders, and on the real chip 1,440 rows crashed
    the TPU worker where 240 trained fine (BASELINE.md 'Fold-parallel CV
    on the chip'). Cached-embedding packs are head-only FLOPs and stay
    uncapped; the env override wins over both defaults."""
    cohort = synthetic.make_cohort(n=48, signal_len=128, img_hw=(8, 16))
    cfg = _signal_cfg(num_epochs=1, batch_size=16)
    folds = _inner_folds(cohort.labels)          # 4 folds
    task, tx, state0, pack = cv_parallel.prepare_folds(
        build_model_and_task, cohort, folds, cfg, mesh=None,
        apply_filter=False,
    )
    plans_nbytes = 0

    def wave(p, n_data=1, budget=0, bs=16):
        return cv_parallel._wave_size(p, state0, plans_nbytes, n_data,
                                      budget, bs)

    # raw images in the pack -> 256-row cap -> 16 folds/wave at bs 16;
    # small F stays a single full wave
    assert cv_parallel._act_rows_cap(pack) == 256
    assert wave(pack) == 4
    big = dataclasses.replace(
        pack, rows=[pack.rows[i % 4] for i in range(90)]
    )
    assert wave(big) == 16                       # 90 raw folds -> waves
    assert wave(big, n_data=2) == 16 * 2         # cap is PER DEVICE
    assert wave(big, n_data=8) == 96             # 12/device fits the cap
    # signals-only raw pack (no images): 1024-row cap
    nosig = dataclasses.replace(big, images=None)
    assert cv_parallel._act_rows_cap(nosig) == 1024
    assert wave(nosig) == 64
    # cached-embedding pack: head-only FLOPs, uncapped
    cached = dataclasses.replace(big, cached_embeddings=True)
    assert cv_parallel._act_rows_cap(cached) == 0
    assert wave(cached) == 90
    # env override wins; 0 disables the cap entirely
    monkeypatch.setenv("ECGMM_FOLD_PARALLEL_ROWS_CAP", "32")
    assert wave(big) == 2
    monkeypatch.setenv("ECGMM_FOLD_PARALLEL_ROWS_CAP", "0")
    assert wave(big) == 90


# Suite tiering: every test in this module is multi-second e2e work —
# the fast tier (pytest -m "not slow") skips it; CI and the full local
# run still execute it.
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
