"""Fold-parallel cross-validation: every fold trains in ONE compiled program.

The reference's CV harnesses run fold fits strictly sequentially — nested
5×3 = 15 full early-stop training loops (`/root/reference/train_kfold.py:
135-178`), exhaustive k×(k−1) = 90 of them (`/root/reference/
train_exhausted.py:165-217`) — because a single-GPU PyTorch loop has no
other shape. On this framework's relayed TPU backend every fold fit costs
2 device dispatches per epoch (train scan + val scan) plus the final test
scan, each a ~25 ms relay round trip, so the exhaustive harness pays
thousands of round trips of pure dispatch tax.

This module is the TPU-native alternative: the WHOLE cross-validation —
every fold's epoch loop, early stopping, plateau LR decay, best-state
snapshot, and final best-on-test scoring — is a single `jax.vmap`-over-
folds jitted program, so the harness costs ONE dispatch total and the
folds ride the mesh's data axis in parallel (8 folds per step on a v5e-8
slice).

Semantics are the sequential engine's, replicated as masked in-device
state (`train/engine.py:_fit_loop`, itself the reference's
train.py:145-167 control flow):

  * plateau LR ÷10 after `plateau_patience` stale epochs — the LR is an
    injected optimizer hyperparameter (optim.py), so the decay is a pure
    `jnp.where` on the opt-state leaf, per fold;
  * early stop after `patience` stale epochs — a per-fold `stopped` flag
    masks every subsequent state update (the batches still flow through
    the scan — lockstep vmap — but the fold's parameters freeze exactly
    where the sequential loop would have broken out);
  * best-val-loss snapshot (fit(keep_best=True)) — a `jnp.where`-selected
    copy of (trainable, model_state), falling back to the final state
    when no epoch ever improved, exactly like FitResult.best_state=None;
  * non-finite val losses carry no signal (neither improve nor stale —
    PARITY.md "NaN validation epochs").

Numerical parity with the sequential harness is tested to tight tolerance
(tests/test_cv_parallel.py): same per-fold val-loss histories, same
stopped-at epochs, same best-on-test logits and AUCs.

Shape uniformity across folds (StratifiedKFold folds differ by ≤1 row)
is handled by padding every fold's arrays/plans to the maximum and
carrying per-batch validity masks; pad batches contribute zero loss
(losses are mask-guarded) and their state updates are discarded, so they
cannot perturb training. With a mesh, folds are padded to a multiple of
the data-axis size and the fold axis is sharded across devices.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ecgmm_tpu.config import TrainConfig
from ecgmm_tpu.data.pipeline import Arrays
from ecgmm_tpu.train import optim as optim_lib
from ecgmm_tpu.train.engine import (
    Task,
    _device_arrays,
    _gather_batch,
    _train_step_core,
    epoch_indices,
)
from ecgmm_tpu.train.state import TrainState


# ---------------------------------------------------------------------------
# host-side stacking helpers


def _pad_rows(x, n_max: int):
    if x is None:
        return None
    pad = n_max - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [jnp.asarray(x), jnp.zeros((pad,) + x.shape[1:], x.dtype)]
    )


def stack_fold_arrays(folds: Sequence[Arrays]) -> Tuple[Arrays, np.ndarray]:
    """Stack per-fold Arrays into fold-axis-leading leaves, padding each
    fold to the largest fold's row count. Pad rows are never gathered
    (plans index only real rows); they exist purely for shape uniformity.
    Returns (stacked Arrays, per-fold real row counts)."""
    ns = np.asarray([f.n for f in folds], np.int64)
    n_max = int(ns.max())

    def stack(field):
        vals = [getattr(f, field) for f in folds]
        if any(v is None for v in vals):
            return None
        return jnp.stack([_pad_rows(v, n_max) for v in vals])

    return (
        Arrays(
            images=stack("images"),
            signals=stack("signals"),
            clinical=stack("clinical"),
            labels=stack("labels"),
            # None (an empty pytree node) — a concrete leaf here would
            # need a fold axis under vmap; indices are host-only anyway
            indices=None,
        ),
        ns,
    )


def _plan_one(n: int, bs: int, *, shuffle: bool, seed: int, epochs: int):
    """Per-fold plan: (epochs, B, bs) idx / mask — the exact matrices the
    sequential fit builds per epoch (engine.epoch_indices, shared
    pipeline.epoch_order sample order)."""
    per = [
        epoch_indices(n, bs, shuffle=shuffle, seed=seed, epoch=e)
        for e in range(epochs)
    ]
    return np.stack([p[0] for p in per]), np.stack([p[1] for p in per])


def stack_fold_plans(
    ns: Sequence[int], batch_size: int, *, shuffle: bool, seed: int,
    epochs: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stacked epoch plans across folds, batch-padded to the widest fold:
    (F, E, B, bs) idx, (F, E, B, bs) row mask, (F, B) batch-validity.
    Pad batches carry mask 0 everywhere AND batch-validity 0 — the
    program discards their (zero-grad, but momentum-decaying) optimizer
    updates so a padded fold trains bit-identically to its sequential
    run."""
    plans = [
        _plan_one(int(n), batch_size, shuffle=shuffle, seed=seed,
                  epochs=epochs)
        for n in ns
    ]
    b_max = max(p[0].shape[1] for p in plans)
    idxs, masks, valid = [], [], []
    for idx, mask in plans:
        b = idx.shape[1]
        pad = b_max - b
        if pad:
            idx = np.concatenate(
                [idx, np.zeros((epochs, pad, idx.shape[2]), idx.dtype)], 1
            )
            mask = np.concatenate(
                [mask, np.zeros((epochs, pad, mask.shape[2]), mask.dtype)],
                1,
            )
        idxs.append(idx)
        masks.append(mask)
        valid.append(
            np.concatenate([np.ones(b, np.float32),
                            np.zeros(pad, np.float32)])
        )
    return np.stack(idxs), np.stack(masks), np.stack(valid)


def _stack_eval_plans(ns: Sequence[int], bs: int):
    """(F, B, bs) no-shuffle eval plans + (F, B) batch validity — the
    sequential fit's fixed validation plan / evaluate_scan test plan."""
    idx, mask, valid = stack_fold_plans(
        ns, bs, shuffle=False, seed=0, epochs=1
    )
    return idx[:, 0], mask[:, 0], valid


def _select_state(pred, new: TrainState, old: TrainState) -> TrainState:
    """Keep `new` where pred else `old`, over the fields a train step
    mutates. Counters/rng are epoch-level state handled by the caller."""

    def sel(n, o):
        return jnp.where(pred, n, o)

    return dataclasses.replace(
        old,
        step=sel(new.step, old.step),
        trainable=jax.tree.map(sel, new.trainable, old.trainable),
        opt_state=jax.tree.map(sel, new.opt_state, old.opt_state),
        model_state=jax.tree.map(sel, new.model_state, old.model_state),
    )


# ---------------------------------------------------------------------------
# the fold program


def _has_injected_lr(opt_state) -> bool:
    return optim_lib.get_lr(opt_state) is not None


def make_fold_program(
    task: Task,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    has_lr: bool,
):
    """Build the jitted all-folds program:

      (state_F, frozen, train_F, val_F, test_F,
       tidx, tmask, tbvalid, vidx, vmask, vbvalid, sidx, smask)
         → (test_logits, test_labels, best_epoch, stopped_at,
            ever_improved, val_history)

    where *_F pytrees carry a leading fold axis and `frozen` is the
    shared (broadcast, NOT per-fold-stacked) frozen-parameter partition —
    on the fusion workload that keeps the ~12 M frozen encoder weights
    single-copy while 90 folds train."""

    def fold_fn(state, frozen, train_data, val_data, test_data,
                tidx, tmask, tbvalid, vidx, vmask, vbvalid, sidx, smask):
        state = dataclasses.replace(state, frozen=frozen)

        def eval_loss(st, idx_mat, mask_mat, bvalid):
            variables = {"params": st.params, **st.model_state}

            def body(_, im):
                idx, mask = im
                batch = _gather_batch(val_data, idx, mask, None)
                outputs, _ = task.apply(
                    variables, batch, train=False, rngs=None
                )
                loss, _ = task.loss(outputs, batch)
                return None, loss

            _, losses = jax.lax.scan(body, None, (idx_mat, mask_mat))
            # mean over REAL batches — the sequential val.loss is the
            # mean of per-batch losses (engine._assemble_eval)
            return jnp.sum(losses * bvalid) / jnp.maximum(
                jnp.sum(bvalid), 1.0
            )

        def epoch_body(carry, xs):
            st, best_tr, best_ms, stopped, ever_imp, best_ep = carry
            idx_e, mask_e, epoch_i = xs
            active = jnp.logical_not(stopped)

            def batch_body(s, im):
                idx, mask, bvalid = im
                batch = _gather_batch(train_data, idx, mask, None)
                new_s, _ = _train_step_core(task, tx, s, batch)
                return _select_state((bvalid > 0) & active, new_s, s), None

            st, _ = jax.lax.scan(
                batch_body, st, (idx_e, mask_e, tbvalid)
            )

            val_loss = eval_loss(st, vidx, vmask, vbvalid)
            informative = jnp.isfinite(val_loss)
            improved = informative & (val_loss < st.best_val_loss) & active
            stale = active & informative & jnp.logical_not(improved)

            es_after = jnp.where(stale, st.early_stop_counter + 1,
                                 st.early_stop_counter)
            lr_after = jnp.where(stale, st.lr_reduce_counter + 1,
                                 st.lr_reduce_counter)
            es_after = jnp.where(improved, 0, es_after)
            lr_after = jnp.where(improved, 0, lr_after)

            opt_state = st.opt_state
            if cfg.plateau_patience > 0 and has_lr:
                decay = stale & (lr_after >= cfg.plateau_patience)
                opt_state = optim_lib.scale_lr(
                    opt_state,
                    jnp.where(decay, cfg.plateau_factor, 1.0),
                )
                lr_after = jnp.where(decay, 0, lr_after)

            st = dataclasses.replace(
                st,
                best_val_loss=jnp.where(improved, val_loss,
                                        st.best_val_loss),
                early_stop_counter=es_after,
                lr_reduce_counter=lr_after,
                opt_state=opt_state,
                epoch=st.epoch + active.astype(jnp.int32),
            )

            best_tr = jax.tree.map(
                lambda n, b: jnp.where(improved, n, b), st.trainable,
                best_tr,
            )
            best_ms = jax.tree.map(
                lambda n, b: jnp.where(improved, n, b), st.model_state,
                best_ms,
            )
            best_ep = jnp.where(improved, epoch_i, best_ep)
            ever_imp = jnp.logical_or(ever_imp, improved)

            if cfg.patience > 0:
                stop_now = (
                    active & jnp.logical_not(improved)
                    & (es_after >= cfg.patience)
                )
                stopped = jnp.logical_or(stopped, stop_now)
            carry = (st, best_tr, best_ms, stopped, ever_imp, best_ep)
            return carry, val_loss

        n_epochs = tidx.shape[0]
        carry0 = (
            state,
            state.trainable,
            state.model_state,
            jnp.zeros((), bool),
            jnp.zeros((), bool),
            jnp.asarray(-1, jnp.int32),
        )
        (state, best_tr, best_ms, stopped, ever_imp, best_ep), vhist = (
            jax.lax.scan(
                epoch_body, carry0,
                (tidx, tmask, jnp.arange(n_epochs, dtype=jnp.int32)),
            )
        )

        # score the BEST state; the final one when nothing ever improved
        # (fit(keep_best=True) returns best_state=None then — cv._fold_auc
        # falls back to result.state)
        final_tr = jax.tree.map(
            lambda b, f: jnp.where(ever_imp, b, f), best_tr,
            state.trainable,
        )
        final_ms = jax.tree.map(
            lambda b, f: jnp.where(ever_imp, b, f), best_ms,
            state.model_state,
        )
        best = dataclasses.replace(
            state, trainable=final_tr, model_state=final_ms
        )
        variables = {"params": best.params, **best.model_state}

        def test_body(_, im):
            idx, mask = im
            batch = _gather_batch(test_data, idx, mask, None)
            outputs, _ = task.apply(variables, batch, train=False,
                                    rngs=None)
            return None, (
                task.logits(outputs).astype(jnp.float32), batch.labels
            )

        _, (slogits, slabels) = jax.lax.scan(
            test_body, None, (sidx, smask)
        )
        stopped_at = jnp.where(stopped, state.epoch,
                               jnp.asarray(-1, jnp.int32))
        return slogits, slabels, best_ep, stopped_at, ever_imp, vhist

    state_axes = TrainState(
        step=0, trainable=0, frozen=None, model_state=0, opt_state=0,
        rng=0, epoch=0, best_val_loss=0, early_stop_counter=0,
        lr_reduce_counter=0,
    )
    return jax.jit(jax.vmap(
        fold_fn,
        in_axes=(state_axes, None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    ))


# ---------------------------------------------------------------------------
# results + the harness entry point


@dataclasses.dataclass
class FoldResults:
    """Per-fold outcomes of one fold-parallel program run (pad folds
    already dropped)."""

    aucs: List[float]
    logits: List[np.ndarray]       # per fold, (n_test, C), pad rows gone
    labels: List[np.ndarray]
    best_epochs: List[int]
    stopped_at: List[int]          # -1 = ran to num_epochs
    val_history: np.ndarray        # (F, E) per-epoch val losses


def _broadcast_state(state: TrainState, n_folds: int) -> TrainState:
    """Stack n_folds copies of the (identical) initial state along a new
    fold axis — every fold starts from the same jit_init(PRNGKey(seed)),
    exactly like the sequential harness. frozen stays single-copy."""

    def rep(x):
        x = jnp.asarray(x)
        return jnp.broadcast_to(x[None], (n_folds,) + x.shape)

    return dataclasses.replace(
        state,
        step=rep(state.step),
        trainable=jax.tree.map(rep, state.trainable),
        model_state=jax.tree.map(rep, state.model_state),
        opt_state=jax.tree.map(rep, state.opt_state),
        rng=rep(state.rng),
        epoch=rep(state.epoch),
        best_val_loss=rep(state.best_val_loss),
        early_stop_counter=rep(state.early_stop_counter),
        lr_reduce_counter=rep(state.lr_reduce_counter),
    )


def _shard_folds(tree, mesh):
    """Place fold-axis-leading leaves with the fold axis on the mesh's
    data axis — folds ride devices in parallel."""
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape")
        and getattr(x, "ndim", 0) >= 1 and x.shape[0] > 0 else x,
        tree,
    )


def run_fold_parallel(
    task: Task,
    tx: optax.GradientTransformation,
    state0: TrainState,
    fold_arrays: Sequence[Tuple[Arrays, Arrays, Arrays]],
    cfg: TrainConfig,
    mesh=None,
) -> FoldResults:
    """Train + score every (train, val, test) fold in one jitted program.

    state0: the single shared initial state (all folds start identical —
    the sequential harness re-inits with the same PRNGKey(seed) per fold,
    cv._fold_auc). Returns per-fold best-on-test logits and AUCs in input
    order."""
    from ecgmm_tpu.train import metrics as M

    if cfg.schedule != "constant":
        raise ValueError(
            "fold-parallel CV supports the constant+plateau schedule (the "
            f"reference CV protocol); got schedule={cfg.schedule!r}. "
            "Schedules with per-fold step counts (onecycle) need the "
            "sequential harness."
        )
    n_real = len(fold_arrays)
    if n_real == 0:
        raise ValueError("no folds")
    folds = list(fold_arrays)
    # pad folds to a data-axis multiple so the fold axis shards evenly
    if mesh is not None:
        n_data = int(mesh.shape[mesh.axis_names[0]])
        while len(folds) % n_data:
            folds.append(folds[0])

    train_s, train_ns = stack_fold_arrays(
        [_device_arrays(f[0]) for f in folds]
    )
    val_s, val_ns = stack_fold_arrays([_device_arrays(f[1]) for f in folds])
    test_s, test_ns = stack_fold_arrays(
        [_device_arrays(f[2]) for f in folds]
    )
    if any(int(n) == 0 for n in np.concatenate([train_ns, val_ns, test_ns])):
        raise ValueError(
            "fold-parallel CV needs non-empty train/val/test in every fold"
        )

    tidx, tmask, tbvalid = stack_fold_plans(
        train_ns, cfg.batch_size, shuffle=True, seed=cfg.seed,
        epochs=cfg.num_epochs,
    )
    vidx, vmask, vbvalid = _stack_eval_plans(val_ns, cfg.eval_bs)
    sidx, smask, _ = _stack_eval_plans(test_ns, cfg.eval_bs)

    state_f = _broadcast_state(
        dataclasses.replace(state0, frozen={}), len(folds)
    )
    frozen = state0.frozen or {}
    has_lr = _has_injected_lr(state0.opt_state)
    program = make_fold_program(task, tx, cfg, has_lr)

    args = [
        state_f, train_s, val_s, test_s,
        jnp.asarray(tidx), jnp.asarray(tmask), jnp.asarray(tbvalid),
        jnp.asarray(vidx), jnp.asarray(vmask), jnp.asarray(vbvalid),
        jnp.asarray(sidx), jnp.asarray(smask),
    ]
    if mesh is not None:
        args = [_shard_folds(a, mesh) for a in args]
    state_f, train_s, val_s, test_s = args[:4]
    (slogits, slabels, best_ep, stopped_at, ever_imp, vhist) = program(
        state_f, frozen, train_s, val_s, test_s, *args[4:]
    )

    slogits = np.asarray(slogits)   # (F, SB, bs, C)
    slabels = np.asarray(slabels)
    res = FoldResults([], [], [], [], [], np.asarray(vhist)[:n_real])
    for f in range(n_real):
        keep = smask[f].reshape(-1) > 0
        logits = slogits[f].reshape(-1, slogits.shape[-1])[keep]
        labels = slabels[f].reshape(-1)[keep]
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits))[:, 1])
        res.aucs.append(
            float(M.auroc(jnp.asarray(probs), jnp.asarray(labels)))
        )
        res.logits.append(logits)
        res.labels.append(labels)
        res.best_epochs.append(int(best_ep[f]))
        res.stopped_at.append(int(stopped_at[f]))
    return res


def prepare_folds(
    make_model_task: Callable,
    cohort,
    fold_splits: Sequence,
    cfg,
    mesh=None,
    apply_filter: bool = True,
):
    """Host-side fold preparation shared with the sequential harness: per-
    fold scaler refits (reference train_kfold.py:26-29,159-162), array
    materialization, and the optional cached-embedding precompute (one
    encode dispatch per fold/split; the fold-parallel head fit then runs
    over stacked embeddings). Returns (task, tx, state0, fold_arrays)."""
    from ecgmm_tpu.data import preprocess
    from ecgmm_tpu.data.pipeline import num_batches
    from ecgmm_tpu.models import jit_init
    from ecgmm_tpu.train import cv as _cv
    from ecgmm_tpu.train.embed import maybe_cache_fusion_embeddings
    from ecgmm_tpu.train.state import create_state

    model, task, init_args, freeze = make_model_task(cfg)
    tx = optim_lib.make_optimizer(
        cfg.train,
        steps_per_epoch=num_batches(
            max(len(s.train) for s in fold_splits), cfg.train.batch_size
        ),
    )
    variables = jit_init(
        model, jax.random.PRNGKey(cfg.train.seed), *init_args
    )
    state0 = create_state(
        variables, tx, jax.random.PRNGKey(cfg.train.seed),
        freeze_predicate=freeze,
    )

    n_clin = min(cfg.model.clinical_in_features, cohort.clinical.shape[1])
    fold_arrays = []
    head_task = None
    for split in fold_splits:
        ecg_scaler = preprocess.Scaler.fit(cohort.signals[split.train])
        clin_scaler = preprocess.Scaler.fit(
            cohort.clinical[split.train, :n_clin]
        )
        arrays = {
            name: _cv._build_arrays(
                cohort, idx, ecg_scaler, clin_scaler, apply_filter, n_clin
            )
            for name, idx in zip(("train", "val", "test"), split)
        }
        arrays, h = maybe_cache_fusion_embeddings(
            model, state0, arrays, cfg.train, mesh,
            frozen=freeze is not None,
        )
        if h is not None:
            head_task = h
        fold_arrays.append((arrays["train"], arrays["val"], arrays["test"]))
    return (head_task or task), tx, state0, fold_arrays
