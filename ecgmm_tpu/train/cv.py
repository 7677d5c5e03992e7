"""Cross-validation harnesses.

  * nested_cv — outer 5 × inner 3 StratifiedKFold; per inner fold the
    scalers are refit on the inner-train subset and a fresh model is
    trained with the full early-stop/plateau loop; the best inner model is
    scored by AUC on the outer test fold; reports mean outer AUC
    (`/root/reference/train_kfold.py:135-178`).
  * exhaustive_cv — all k×(k−1) ordered (test, val) fold pairs over one
    k-fold partition (`/root/reference/train_exhausted.py:165-217`).

Data movement is cheap here because the cohort is materialised once; folds
are index slices into device-resident arrays.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ecgmm_tpu.config import Config
from ecgmm_tpu.data import preprocess, splits
from ecgmm_tpu.data.pipeline import Arrays
from ecgmm_tpu.data.synthetic import SyntheticCohort
from ecgmm_tpu.train import engine, metrics as M, optim as optim_lib
from ecgmm_tpu.train.state import create_state


def _build_arrays(
    cohort: SyntheticCohort, idx: np.ndarray,
    ecg_scaler: preprocess.Scaler, clin_scaler: preprocess.Scaler,
    apply_filter: bool, n_clin: int = 2,
) -> Arrays:
    with jax.default_device(jax.devices("cpu")[0]):
        sig = ecg_scaler.transform(cohort.signals[idx])
        if apply_filter:
            sig = preprocess.preprocess_hospital(sig)
        sig = np.asarray(sig, np.float32)
        clin = np.asarray(
            clin_scaler.transform(cohort.clinical[idx, :n_clin]),
            np.float32,
        )
    return Arrays(
        images=jnp.asarray(cohort.images[idx]),
        signals=jnp.asarray(sig),
        clinical=jnp.asarray(clin),
        labels=jnp.asarray(cohort.labels[idx], jnp.int32),
        indices=cohort.indices[idx],
    )


def _fold_auc(
    make_model_task: Callable,
    cohort: SyntheticCohort,
    split: splits.Split,
    cfg: Config,
    mesh,
    apply_filter: bool,
) -> float:
    """Train on (train, val), return AUC of the best state on test —
    the reference's train_inner + test_outer unit (train_kfold.py:20-133)."""
    # per-fold scaler refit on the fold's train subset
    # (reference train_kfold.py:26-29,159-162); the clinical width follows
    # the preset (2 canonical, 24 modal-balance)
    n_clin = min(cfg.model.clinical_in_features, cohort.clinical.shape[1])
    ecg_scaler = preprocess.Scaler.fit(cohort.signals[split.train])
    clin_scaler = preprocess.Scaler.fit(
        cohort.clinical[split.train, :n_clin]
    )
    arrays = {
        name: _build_arrays(
            cohort, idx, ecg_scaler, clin_scaler, apply_filter, n_clin
        )
        for name, idx in zip(("train", "val", "test"), split)
    }

    from ecgmm_tpu.data.pipeline import num_batches

    model, task, init_args, freeze = make_model_task(cfg)
    tx = optim_lib.make_optimizer(
        cfg.train,
        # ceil, like the engine's epoch plan and torch OneCycleLR's
        # len(train_loader) — floor undercounted total steps so the
        # tail of every epoch trained at the clamped final LR
        steps_per_epoch=num_batches(arrays["train"].n,
                                    cfg.train.batch_size),
    )
    from ecgmm_tpu.models import jit_init

    variables = jit_init(model, jax.random.PRNGKey(cfg.train.seed),
                         *init_args)
    state = create_state(
        variables, tx, jax.random.PRNGKey(cfg.train.seed),
        freeze_predicate=freeze,
    )
    # The fusion fast path pays off most here: every fold re-runs the
    # frozen encoders for a full early-stop loop (90 fits in the
    # exhaustive harness) — precompute each fold's embeddings once
    # instead (per-fold, since the refit scalers change the inputs).
    # BN stats are calibrated on THIS fold's train split first (round 4:
    # cold-start eval-mode stats measurably depress cached quality —
    # BASELINE.md); the fold-parallel harness applies the identical
    # per-fold calibration, keeping the two harnesses parity-comparable.
    from ecgmm_tpu.train.embed import (
        maybe_cache_fusion_embeddings,
        maybe_calibrate_bn_stats,
    )

    state = maybe_calibrate_bn_stats(
        model, state, arrays["train"], cfg.train, mesh,
        frozen=freeze is not None,
    )
    arrays, head_task = maybe_cache_fusion_embeddings(
        model, state, arrays, cfg.train, mesh, frozen=freeze is not None,
    )
    if head_task is not None:
        task = head_task
    result = engine.fit(
        task, state, tx, arrays["train"], arrays["val"], cfg.train,
        mesh=mesh, verbose=False, keep_best=True,
    )
    if result.preempted:
        # SIGTERM mid-fold: this fold trained short and the process is
        # being preempted — scoring it as a normal result and launching
        # the remaining folds would both be wrong (observed on-chip,
        # engine.FitResult.preempted docstring)
        raise engine.Preempted(
            "SIGTERM during a CV fold fit — stopping the harness"
        )
    # Score the BEST-val state, as the reference protocol does
    # (train_kfold.py:117-133 loads best_inner.pth) — the final state is
    # patience epochs past best by construction on every early stop.
    best = result.best_state if result.best_state is not None \
        else result.state
    # one scan dispatch per fold's test pass (evaluate_scan == evaluate,
    # tests/test_engine_equivalence.py)
    ev = engine.evaluate_scan(
        task, best, arrays["test"], cfg.train.eval_bs, mesh
    )
    probs = np.asarray(jax.nn.softmax(jnp.asarray(ev.logits))[:, 1])
    return float(M.auroc(jnp.asarray(probs), jnp.asarray(ev.labels)))


def _hint_fold_parallel(tcfg, n_folds: int, verbose: bool) -> None:
    """One-line pointer printed when the sequential harness runs a fold
    set the parallel harness could take: measured on the relayed chip,
    `--fold-parallel` is 4.4–22.7× faster end-to-end at 15–90 folds
    (BASELINE.md "Fold-parallel CV on the chip"). Sequential stays the
    default — it is the reference-parity protocol and covers every
    schedule."""
    if verbose and n_folds > 1 and tcfg.schedule == "constant":
        print(
            f"[cv] running {n_folds} folds sequentially; --fold-parallel "
            "trains them in one compiled program (4–23x faster on TPU — "
            "BASELINE.md)"
        )


def _check_fold_parallel_schedule(tcfg) -> None:
    """Early rejection of schedules the fold-parallel program cannot
    express (per-fold step counts — onecycle), BEFORE the expensive
    per-fold preparation; run_fold_parallel re-checks defensively.
    PARITY.md 'Fold-parallel CV scope'."""
    if tcfg.schedule != "constant":
        raise ValueError(
            "fold-parallel CV supports the constant+plateau schedule "
            f"(the reference CV protocol); got "
            f"schedule={tcfg.schedule!r}. Schedules with per-fold step "
            "counts (onecycle) need the sequential harness "
            "(PARITY.md 'Fold-parallel CV scope')."
        )


def nested_cv(
    make_model_task: Callable,
    cohort: SyntheticCohort,
    cfg: Config,
    mesh=None,
    apply_filter: bool = True,
    verbose: bool = True,
    fold_parallel: bool = False,
) -> Dict[str, object]:
    """Outer k_outer × inner k_inner nested CV. Each inner fold trains to
    early stop, its best-val state is scored on the outer test, and the
    outer AUC is the MEAN over the inner folds (the reference scores
    only the last inner fold's best checkpoint, train_kfold.py:157-172 —
    the mean is strictly more informative; PARITY.md row).

    fold_parallel=True trains ALL k_outer×k_inner folds in ONE jitted
    program (train/cv_parallel.py) — folds ride the mesh's data axis and
    the whole harness costs a single device dispatch instead of 2 per
    epoch per fold. Sequential-parity is tested
    (tests/test_cv_parallel.py); pair it with cache_embeddings for the
    fusion preset so the stacked per-fold arrays are 672-dim embeddings,
    not image copies."""
    t = cfg.train
    groups = list(splits.nested_kfold(
        cohort.labels, t.k_outer, t.k_inner, t.seed
    ))
    if fold_parallel:
        from ecgmm_tpu.train import cv_parallel

        # fail BEFORE prepare_folds: an unsupported schedule would
        # otherwise waste the per-fold scaler refits / materialization /
        # embedding precompute before run_fold_parallel rejects it
        _check_fold_parallel_schedule(t)
        flat = [s for _, _, inner in groups for s in inner]
        task, tx, state0, pack = cv_parallel.prepare_folds(
            make_model_task, cohort, flat, cfg, mesh=mesh,
            apply_filter=apply_filter,
        )
        res = cv_parallel.run_fold_parallel(
            task, tx, state0, pack, t, mesh=mesh, verbose=verbose
        )
        outer_aucs, i = [], 0
        for fold_id, _, inner_splits in groups:
            fold_aucs = res.aucs[i:i + len(inner_splits)]
            i += len(inner_splits)
            auc = float(np.nanmean(fold_aucs))
            outer_aucs.append(auc)
            if verbose:
                print(f"[outer {fold_id}] inner AUCs={fold_aucs} "
                      f"mean={auc:.4f}")
    else:
        _hint_fold_parallel(t, sum(len(i) for _, _, i in groups), verbose)
        outer_aucs = []
        for fold_id, outer_test, inner_splits in groups:
            fold_aucs = [
                _fold_auc(make_model_task, cohort, s, cfg, mesh,
                          apply_filter)
                for s in inner_splits
            ]
            auc = float(np.nanmean(fold_aucs))
            outer_aucs.append(auc)
            if verbose:
                print(f"[outer {fold_id}] inner AUCs={fold_aucs} "
                      f"mean={auc:.4f}")
    return {
        "outer_aucs": outer_aucs,
        "mean_auc": float(np.nanmean(outer_aucs)),
        "std_auc": float(np.nanstd(outer_aucs)),
    }


def exhaustive_cv(
    make_model_task: Callable,
    cohort: SyntheticCohort,
    cfg: Config,
    k: int = 10,
    mesh=None,
    apply_filter: bool = True,
    max_pairs: Optional[int] = None,
    verbose: bool = True,
    fold_parallel: bool = False,
) -> Dict[str, object]:
    """All k×(k−1) (test, val) pairs (train_exhausted.py:165-217);
    max_pairs bounds runtime for smoke runs.

    fold_parallel=True runs every pair in ONE jitted program — the 90
    sequential early-stop loops (each 2 dispatches/epoch on the relayed
    TPU) collapse to a single dispatch, with pairs sharded over the
    mesh's data axis. Pair it with cache_embeddings for the fusion
    preset so the 90 stacked per-pair arrays are embeddings, not image
    copies (train/cv_parallel.py)."""
    pairs = []
    for n, (ti, vi, s) in enumerate(
        splits.exhaustive_fold_pairs(cohort.labels, k, cfg.train.seed)
    ):
        if max_pairs is not None and n >= max_pairs:
            break
        pairs.append((ti, vi, s))
    aucs: List[Tuple[int, int, float]] = []
    if fold_parallel:
        from ecgmm_tpu.train import cv_parallel

        _check_fold_parallel_schedule(cfg.train)
        task, tx, state0, pack = cv_parallel.prepare_folds(
            make_model_task, cohort, [s for _, _, s in pairs], cfg,
            mesh=mesh, apply_filter=apply_filter,
        )
        res = cv_parallel.run_fold_parallel(
            task, tx, state0, pack, cfg.train, mesh=mesh, verbose=verbose
        )
        for (ti, vi, _), auc in zip(pairs, res.aucs):
            aucs.append((ti, vi, auc))
            if verbose:
                print(f"[test={ti} val={vi}] auc={auc:.4f}")
    else:
        _hint_fold_parallel(cfg.train, len(pairs), verbose)
        for ti, vi, s in pairs:
            auc = _fold_auc(
                make_model_task, cohort, s, cfg, mesh, apply_filter
            )
            aucs.append((ti, vi, auc))
            if verbose:
                print(f"[test={ti} val={vi}] auc={auc:.4f}")
    vals = [a for _, _, a in aucs]
    return {
        "pairs": aucs,
        "mean_auc": float(np.nanmean(vals)),
        "std_auc": float(np.nanstd(vals)),
    }


def cross_dataset_eval(
    model, variables, signals: np.ndarray, labels: np.ndarray,
    fs: float = 250.0, length: int = 2476, batch_size: int = 64,
) -> Dict[str, float]:
    """Evaluate a trained signal model on a different dataset with
    PTB-XL-matched preprocessing — the reference's evaluation_signal.py:
    20-39,171-219 (40 Hz LP @250 Hz, pad/crop 2476, per-sample z-score is
    NOT applied there; scaling is the ckpt's training convention).
    Metrics follow the reference's protocol: accuracy/F1 at the
    F1-maximising threshold (evaluation_signal.py:190-196), reported
    alongside the threshold itself."""
    with jax.default_device(jax.devices("cpu")[0]):
        x = jnp.asarray(signals, jnp.float32)
        x = preprocess.remove_baseline_drift(x)
        x = preprocess.filtfilt(
            preprocess.IIRFilter.butter(5, 40.0, fs, "low"), x
        )
        x = np.asarray(preprocess.pad_or_crop(x, length))

    apply = jax.jit(lambda xb: model.apply(variables, xb))
    logits = []
    for i in range(0, len(x), batch_size):
        xb = x[i:i + batch_size]
        # pad the ragged tail up to batch_size: a second odd-shaped jit
        # compile costs minutes through the TPU relay
        pad = batch_size - len(xb)
        if pad > 0:
            xb = np.concatenate([xb, np.zeros((pad,) + xb.shape[1:],
                                              xb.dtype)])
        out = np.asarray(apply(jnp.asarray(xb)[..., None]))
        logits.append(out[:batch_size - pad] if pad > 0 else out)
    logits = np.concatenate(logits)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits))[:, 1])
    threshold, _ = M.find_best_threshold(np.asarray(labels), probs)
    out = M.summarize_binary(probs, labels, threshold=threshold)
    out["threshold"] = float(threshold)
    return out


def _cross_cli(args) -> None:
    """`cross` mode body: load a trained ResNet1D-SE (reference .pth or
    converted .msgpack), evaluate it on foreign digitized signals with
    PTB-XL-matched preprocessing, print the metric JSON — the runnable
    equivalent of `python evaluation_signal.py` (its hardcoded ckpt path
    is `./checkpoints/signal/<ts>/best.pth`, evaluation_signal.py:176)."""
    import json
    import os

    from ecgmm_tpu.config import DataConfig
    from ecgmm_tpu.data import align, sources, synthetic
    from ecgmm_tpu.models import ResNet1DSE
    from ecgmm_tpu.tools import convert_pth

    if args.pth:
        variables = convert_pth.convert_resnet1d_se(
            convert_pth.load_torch_state_dict(args.pth)
        )
    else:
        variables = convert_pth.load_converted(args.ckpt)

    if args.data_dir:
        d = DataConfig(data_dir=args.data_dir)
        labels_df, _, ecg = sources.load_hospital_tables(
            os.path.join(d.data_dir, d.label_file),
            os.path.join(d.data_dir, d.clinical_file),
            os.path.join(d.data_dir, d.ecg_csv),
        )
        labels_df = align.filter_and_map_labels(labels_df)
        common = sorted(set(labels_df["index"].astype(int)) & set(ecg.index))
        signals = ecg.loc[common].to_numpy(np.float32)
        labels = (
            labels_df.set_index("index").loc[common]["label"]
            .to_numpy(np.int64)
        )
    else:
        cohort = synthetic.make_cohort(
            n=args.n_synth, signal_len=args.length, img_hw=(16, 32)
        )
        signals, labels = cohort.signals, cohort.labels

    model = ResNet1DSE(num_classes=2)
    out = cross_dataset_eval(
        model, variables, signals, labels, length=args.length
    )
    print(json.dumps({k: float(v) for k, v in out.items()}, indent=1))


def main(argv=None):
    """CLI mirroring the reference's `python train_kfold.py` (nested
    5×3 CV, train_kfold.py:135-178), `python train_exhausted.py`
    (all k×(k−1) pairs, train_exhausted.py:165-217) and
    `python evaluation_signal.py` (cross-dataset evaluation of a trained
    signal model with PTB-XL-matched preprocessing,
    evaluation_signal.py:171-219):

        python -m ecgmm_tpu.train.cv nested --preset fusion
        python -m ecgmm_tpu.train.cv exhaustive --k 10 --max-pairs 10
        python -m ecgmm_tpu.train.cv cross --pth best_ptbxl.pth \\
            [--data-dir ./data]   # default: synthetic hospital cohort
    """
    import argparse
    import json

    from ecgmm_tpu.data import synthetic
    from ecgmm_tpu.parallel import make_mesh
    from ecgmm_tpu.utils.cache import (
        enable_compilation_cache,
        with_cache_recovery,
    )
    from ecgmm_tpu.workloads.run import build_model_and_task, get_preset

    p = argparse.ArgumentParser(
        description=main.__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("mode", choices=["nested", "exhaustive", "cross"])
    p.add_argument("--preset", default="fusion")
    p.add_argument("--n-synth", type=int, default=128)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None,
                   help="override the reference's fixed seed 42")
    p.add_argument("--cache-embeddings", action="store_true")
    p.add_argument("--fold-parallel", action="store_true",
                   help="train ALL folds in one jitted program, folds "
                        "sharded over the mesh (train/cv_parallel.py); "
                        "pairs best with --cache-embeddings on fusion "
                        "presets")
    p.add_argument("--k", type=int, default=10,
                   help="exhaustive mode: number of folds")
    p.add_argument("--max-pairs", type=int, default=None,
                   help="exhaustive mode: bound the 90-pair sweep")
    p.add_argument("--pth", default=None,
                   help="cross mode: reference ResNet1D-SE .pth ckpt")
    p.add_argument("--ckpt", default=None,
                   help="cross mode: converted .msgpack ckpt "
                        "(tools.convert_pth output)")
    p.add_argument("--data-dir", default=None,
                   help="cross mode: hospital-layout data dir "
                        "(default: synthetic cohort)")
    p.add_argument("--length", type=int, default=2476,
                   help="cross mode: pad/crop length (reference "
                        "evaluation_signal.py:36-38)")
    args = p.parse_args(argv)

    if args.mode == "cross":
        if not (args.pth or args.ckpt):
            p.error("cross mode needs --pth or --ckpt")
        return _cross_cli(args)
    if args.preset in ("signal_12lead", "physionet_crnn"):
        p.error(
            f"preset {args.preset!r} needs multi-lead / spectrogram "
            "inputs the CV harness does not materialize — use "
            "python -m ecgmm_tpu.workloads.run for it"
        )
    if args.max_pairs is not None and args.max_pairs < 1:
        p.error("--max-pairs must be >= 1")

    enable_compilation_cache()
    from ecgmm_tpu.workloads.run import apply_train_overrides

    cfg = apply_train_overrides(
        get_preset(args.preset), epochs=args.epochs,
        cache_embeddings=args.cache_embeddings, seed=args.seed,
    )
    cohort = synthetic.make_cohort(
        n=args.n_synth,
        signal_len=cfg.data.signal_len,
        img_hw=(cfg.data.img_height, cfg.data.img_width),
        n_clinical=cfg.model.clinical_in_features,
    )
    mesh = make_mesh(cfg.mesh)
    if args.mode == "nested":
        out = with_cache_recovery(
            lambda: nested_cv(
                build_model_and_task, cohort, cfg, mesh=mesh,
                fold_parallel=args.fold_parallel,
            )
        )
    else:
        out = with_cache_recovery(
            lambda: exhaustive_cv(
                build_model_and_task, cohort, cfg, k=args.k, mesh=mesh,
                max_pairs=args.max_pairs,
                fold_parallel=args.fold_parallel,
            )
        )
    def clean(v):
        if isinstance(v, float) and not np.isfinite(v):
            return None  # strict-JSON consumers reject bare NaN
        if isinstance(v, list):
            return [clean(x) for x in v]
        return v

    summary = {k: clean(v) for k, v in out.items() if k != "pairs"}
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
