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

Memory design — folds are INDEX SETS over one cohort, so the program
gathers batches from cohort-wide arrays by global row index instead of
stacking per-fold copies (`FoldPack`):

  * modalities the per-fold transform leaves untouched are SHARED — one
    (N, …) array total: raw uint8 images (CV never re-scales pixels) and,
    in cached-embedding mode, the image embeddings (frozen eval-mode
    encoder ⇒ fold-invariant, encoded ONCE for all F folds);
  * per-fold scaler refits (reference train_kfold.py:26-29,159-162) ride
    as per-fold (T,)/(C,) shift/scale vectors applied after the gather —
    exactly `preprocess.Scaler.transform`'s f32 affine — so unfiltered
    signals and clinical features also stay single-copy;
  * only modalities whose values genuinely differ per fold are stacked
    (F, N, …): filtered signals (the scale→filter order means the
    zero-phase IIR filter sees per-fold-scaled inputs and, with
    per-timestep scales, does not commute with the affine) and per-fold
    signal/clinical embeddings — both a few hundred MB at the exhaustive
    90-pair hospital scale, vs multi-GB if images were stacked.

The stacked footprint is still O(folds), so `run_fold_parallel` estimates
the program's device bytes host-side (`fold_footprint`) against the HBM
budget (`pipeline.resolve_hbm_budget`) and, when over, runs the folds in
WAVES — ceil(F/W) sequential dispatches of the same compiled program with
W folds each — or raises with guidance when even one fold per device
cannot fit. Raw-modality programs are additionally wave-bounded by
CONCURRENT SAMPLE ROWS (`_act_rows_cap`): a W-fold wave backprops an
effective batch of W × batch_size through the full encoders, and those
activation transients — not the data bytes — are what kill the device
(measured: 240 rows fine, 1,440 rows crash the TPU worker; BASELINE.md
"Fold-parallel CV on the chip").

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

Numerical parity with the sequential harness is tested
(tests/test_cv_parallel.py): same per-fold val-loss histories, same
stopped-at epochs, same best-on-test logits and AUCs — including folds of
deliberately unequal sizes and folds whose validation loss is NaN every
epoch. Tolerances are calibrated to observed vmap-vs-sequential float32
reassociation noise (~5e-4 on val losses), not tighter.

Shape uniformity across folds (fold sizes may differ) is handled by
padding every fold's batch PLAN to the widest fold's batch count and
carrying per-batch validity masks; pad batches contribute zero loss
(loss terms are `where`-guarded, never multiplied — a NaN × 0 would
still poison the sum) and their state updates are discarded, so they
cannot perturb training. With a mesh, folds are padded to a multiple of
the data-axis size and the fold axis is sharded across devices.
Schedules with per-fold step counts (onecycle) are rejected — see
PARITY.md "Fold-parallel CV scope".
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ecgmm_tpu.config import TrainConfig
from ecgmm_tpu.data.pipeline import Arrays, Batch
from ecgmm_tpu.train import optim as optim_lib
from ecgmm_tpu.train.engine import Task, _train_step_core, epoch_indices
from ecgmm_tpu.train.state import TrainState


# ---------------------------------------------------------------------------
# the fold pack: cohort-wide data + per-fold transforms + row index sets


@dataclasses.dataclass
class FoldPack:
    """Cohort-wide host arrays + per-fold transforms for the fold program.

    `images`/`labels` are always shared (N, …). `signals`/`clinical` are
    shared (N, …) with per-fold affine vectors when the fold transform is
    a pure scaler, stacked (F, N, …) when folds see genuinely different
    values (filtered signals, per-fold embeddings). `rows[f]` holds the
    fold's (train, val, test) global row-index arrays."""

    images: Optional[np.ndarray]
    signals: Optional[np.ndarray]
    clinical: Optional[np.ndarray]
    labels: np.ndarray
    rows: List[Tuple[np.ndarray, np.ndarray, np.ndarray]]
    signals_stacked: bool = False
    clinical_stacked: bool = False
    # cached mode with per-fold BN calibration: image EMBEDDINGS differ
    # per fold (each fold's calibrated stats), so images stack (F, N, D)
    images_stacked: bool = False
    # per-fold Scaler.transform affines for SHARED signals/clinical:
    # x → (x − shift[f]) / scale[f], float32 like preprocess.Scaler
    sig_shift: Optional[np.ndarray] = None   # (F, T)
    sig_scale: Optional[np.ndarray] = None
    cli_shift: Optional[np.ndarray] = None   # (F, C)
    cli_scale: Optional[np.ndarray] = None
    # True when signals/clinical are cached frozen-encoder EMBEDDINGS
    # (head-only FLOPs per step); False = raw modalities through full
    # encoders, whose activation transients bound the wave size
    # (_act_rows_cap)
    cached_embeddings: bool = False

    @property
    def n_folds(self) -> int:
        return len(self.rows)

    def fold_arrays(self, f: int) -> Tuple[Arrays, Arrays, Arrays]:
        """Materialise ONE fold's (train, val, test) Arrays — the exact
        per-row values the program gathers, for the sequential engine
        (parity tests, and the sequential fallback path)."""

        def build(r: np.ndarray) -> Arrays:
            img = None
            if self.images is not None:
                src = self.images[f] if self.images_stacked else self.images
                img = jnp.asarray(np.asarray(src)[r])
            sig = None
            if self.signals is not None:
                if self.signals_stacked:
                    sig = jnp.asarray(self.signals[f][r])
                else:
                    sig = jnp.asarray(
                        (np.asarray(self.signals)[r] - self.sig_shift[f])
                        / self.sig_scale[f]
                    )
            cli = None
            if self.clinical is not None:
                if self.clinical_stacked:
                    cli = jnp.asarray(self.clinical[f][r])
                else:
                    cli = jnp.asarray(
                        (np.asarray(self.clinical)[r] - self.cli_shift[f])
                        / self.cli_scale[f]
                    )
            return Arrays(
                images=img, signals=sig, clinical=cli,
                labels=jnp.asarray(self.labels[r]),
                indices=np.asarray(r),
            )

        tr, va, te = self.rows[f]
        return build(tr), build(va), build(te)


def _tree_nbytes(tree) -> int:
    return sum(
        int(leaf.nbytes) if hasattr(leaf, "nbytes") else 8
        for leaf in jax.tree.leaves(tree)
    )


def fold_footprint(pack: FoldPack, state0: TrainState) -> Tuple[int, int]:
    """(shared_bytes, per_fold_bytes) of the program's PER-DEVICE HBM
    footprint. Shared leaves (cohort arrays, frozen partition) are
    replicated — one copy per device; per-fold costs shard over the data
    axis: stacked per-fold data, affines, and the training state
    (trainable ×3 for live + best snapshot + gradient transient, opt
    state, model_state ×2 for live + best)."""
    F = max(1, pack.n_folds)
    shared = int(pack.labels.nbytes) + _tree_nbytes(state0.frozen or {})
    per_fold = 0
    for a, stacked in (
        (pack.images, pack.images_stacked),
        (pack.signals, pack.signals_stacked),
        (pack.clinical, pack.clinical_stacked),
    ):
        if a is None:
            continue
        if stacked:
            per_fold += int(a.nbytes) // F
        else:
            shared += int(a.nbytes)
    for aff in (pack.sig_shift, pack.sig_scale, pack.cli_shift,
                pack.cli_scale):
        if aff is not None:
            per_fold += int(aff.nbytes) // F
    per_fold += (
        3 * _tree_nbytes(state0.trainable)
        + _tree_nbytes(state0.opt_state)
        + 2 * _tree_nbytes(state0.model_state)
    )
    return shared, per_fold


# ---------------------------------------------------------------------------
# epoch plans over GLOBAL cohort rows


def stack_fold_plans(
    rows_list: Sequence[np.ndarray], batch_size: int, *, shuffle: bool,
    seed: int, epochs: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stacked epoch plans across folds, batch-padded to the widest fold:
    (F, E, B, bs) GLOBAL row idx, (F, E, B, bs) row mask, (F, B) batch
    validity. Per fold the plan is engine.epoch_indices over the fold's
    LOCAL order (the exact matrices the sequential fit builds — shared
    pipeline.epoch_order sample order) mapped through the fold's global
    row ids. Pad batches gather the fold's own row 0 (a real row, so no
    out-of-fold values — e.g. another fold's NaN rows — can enter its
    forward pass) with mask 0 everywhere AND batch-validity 0 — the
    program discards their optimizer updates so a padded fold trains
    bit-identically to its sequential run."""
    plans = []
    for rows in rows_list:
        rows = np.asarray(rows)
        per = [
            epoch_indices(len(rows), batch_size, shuffle=shuffle,
                          seed=seed, epoch=e)
            for e in range(epochs)
        ]
        local = np.stack([p[0] for p in per])          # (E, B, bs)
        mask = np.stack([p[1] for p in per])
        plans.append((rows[local].astype(np.int32), mask, int(rows[0])))
    b_max = max(p[0].shape[1] for p in plans)
    idxs, masks, valid = [], [], []
    for gidx, mask, row0 in plans:
        b = gidx.shape[1]
        pad = b_max - b
        if pad:
            gidx = np.concatenate(
                [gidx, np.full((epochs, pad, gidx.shape[2]), row0,
                               gidx.dtype)], 1
            )
            mask = np.concatenate(
                [mask, np.zeros((epochs, pad, mask.shape[2]), mask.dtype)],
                1,
            )
        idxs.append(gidx)
        masks.append(mask)
        valid.append(
            np.concatenate([np.ones(b, np.float32),
                            np.zeros(pad, np.float32)])
        )
    return np.stack(idxs), np.stack(masks), np.stack(valid)


def _stack_eval_plans(rows_list: Sequence[np.ndarray], bs: int):
    """(F, B, bs) no-shuffle eval plans + (F, B) batch validity — the
    sequential fit's fixed validation plan / evaluate_scan test plan."""
    idx, mask, valid = stack_fold_plans(
        rows_list, bs, shuffle=False, seed=0, epochs=1
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
    data_axes: Tuple,
):
    """Build the jitted all-folds program:

      (state_F, frozen, images, signals, clinical, labels,
       sig_shift, sig_scale, cli_shift, cli_scale,
       tidx, tmask, tbvalid, vidx, vmask, vbvalid, sidx, smask)
         → (test_logits, test_labels, best_epoch, stopped_at,
            ever_improved, val_history)

    `data_axes` is the vmap in_axes 8-tuple for (images, signals,
    clinical, labels, sig_shift, sig_scale, cli_shift, cli_scale): None
    for shared/absent leaves (broadcast — the cohort arrays and the
    frozen-parameter partition stay single-copy while every fold trains),
    0 for per-fold stacked leaves. Plans carry GLOBAL cohort row indices;
    per-fold affines reproduce the fold's Scaler.transform after the
    gather."""

    def fold_fn(state, frozen, images, signals, clinical, labels,
                sig_shift, sig_scale, cli_shift, cli_scale,
                tidx, tmask, tbvalid, vidx, vmask, vbvalid, sidx, smask):
        state = dataclasses.replace(state, frozen=frozen)

        def gather(idx, mask):
            def take(a):
                return None if a is None else jnp.take(a, idx, axis=0)

            sig = take(signals)
            if sig is not None and sig_scale is not None:
                sig = (sig - sig_shift) / sig_scale
            cli = take(clinical)
            if cli is not None and cli_scale is not None:
                cli = (cli - cli_shift) / cli_scale
            return Batch(
                images=take(images), signals=sig, clinical=cli,
                labels=take(labels), mask=mask,
            )

        def eval_loss(st, idx_mat, mask_mat, bvalid):
            variables = {"params": st.params, **st.model_state}

            def body(_, im):
                idx, mask = im
                batch = gather(idx, mask)
                outputs, _ = task.apply(
                    variables, batch, train=False, rngs=None
                )
                loss, _ = task.loss(outputs, batch)
                return None, loss

            _, losses = jax.lax.scan(body, None, (idx_mat, mask_mat))
            # mean over REAL batches — the sequential val.loss is the
            # mean of per-batch losses (engine._assemble_eval). where-
            # guarded, not multiplied: a pad batch's NaN loss × 0 would
            # still poison the sum.
            return jnp.sum(jnp.where(bvalid > 0, losses, 0.0)) / (
                jnp.maximum(jnp.sum(bvalid), 1.0)
            )

        def epoch_body(carry, xs):
            st, best_tr, best_ms, stopped, ever_imp, best_ep = carry
            idx_e, mask_e, epoch_i = xs
            active = jnp.logical_not(stopped)

            def batch_body(s, im):
                idx, mask, bvalid = im
                batch = gather(idx, mask)
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
            batch = gather(idx, mask)
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
    in_axes = (state_axes, None) + tuple(data_axes) + (0,) * 8
    return jax.jit(jax.vmap(fold_fn, in_axes=in_axes))


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


def _fold_axis_sharding(mesh):
    """(NamedSharding over the mesh's DATA axis, data-axis size) for
    fold-axis-leading leaves — the axis is looked up BY NAME (matching
    make_mesh/batch_sharding conventions), not by position. Fold-parallel
    requires a pure data-parallel mesh: the per-fold parameter/optimizer
    copies carry no tensor-parallel annotations, so a nontrivial model
    axis would silently replicate them (a memory and perf regression vs
    the sequential path's place_state) — raise instead."""
    from jax.sharding import NamedSharding, PartitionSpec

    names = mesh.axis_names
    axis = "data" if "data" in names else names[0]
    extra = [a for a in names if a != axis and int(mesh.shape[a]) > 1]
    if extra:
        raise ValueError(
            "fold-parallel CV requires a pure data-parallel mesh (folds "
            f"shard over the {axis!r} axis); mesh has non-data axes with "
            f"size > 1: {extra}. Use a data-only mesh, or the sequential "
            "harness for tensor-parallel training."
        )
    return (
        NamedSharding(mesh, PartitionSpec(axis)), int(mesh.shape[axis])
    )


def _put_folds(tree, sharding):
    """Place fold-axis-leading leaves with the fold axis on the mesh's
    data axis — folds ride devices in parallel."""
    if sharding is None:
        return jax.tree.map(
            lambda x: jnp.asarray(x) if hasattr(x, "shape") else x, tree
        )
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape")
        and getattr(x, "ndim", 0) >= 1 and x.shape[0] > 0 else x,
        tree,
    )


def _act_rows_cap(pack: FoldPack) -> int:
    """Per-device bound on CONCURRENT sample rows for raw-modality fold
    programs (0 = uncapped). fold_footprint counts data + optimizer
    state, but a W-fold wave runs an effective batch of W × batch_size
    through the full encoders, and the backward pass's activation
    transients scale with that — measured on the v5e chip: 15 raw fusion
    folds × bs 16 = 240 rows in flight train fine, 90 folds = 1,440 rows
    crash the TPU worker (BASELINE.md "Fold-parallel CV on the chip").
    Caps: 256 rows with raw images in the pack (the flagship's validated
    batch-size operating point, roofline close-out), 1024 for raw
    signals/clinical only; cached-embedding packs are head-only FLOPs
    with microscopic activations, so the data footprint governs.
    `ECGMM_FOLD_PARALLEL_ROWS_CAP` overrides (0 disables)."""
    import os

    env = os.environ.get("ECGMM_FOLD_PARALLEL_ROWS_CAP")
    if env is not None:
        return max(0, int(env))
    if pack.cached_embeddings:
        return 0
    if pack.images is not None and getattr(pack.images, "ndim", 0) >= 4:
        return 256
    return 1024


def _wave_size(pack: FoldPack, state0: TrainState, plans_nbytes: int,
               n_data: int, budget: int, batch_size: int) -> int:
    """Folds per program dispatch: all of them (padded to a data-axis
    multiple) when the estimated per-device footprint fits the HBM
    budget AND the wave's concurrent rows fit the activation cap
    (_act_rows_cap), else the largest data-axis multiple that does.
    Raises with numbers and guidance when even one fold per device
    cannot fit. budget 0 = unknown/unlimited (resolve_hbm_budget: the
    relayed TPU reports no bytes_limit — ECGMM_HBM_BUDGET_BYTES is the
    control there; the activation cap still applies)."""
    F = pack.n_folds
    w_full = -(-F // n_data) * n_data
    w = w_full
    cap = _act_rows_cap(pack)
    if cap:
        w = min(w, max(1, cap // max(1, batch_size)) * n_data)
    if not budget:
        return w
    shared, per_fold = fold_footprint(pack, state0)
    per_fold += plans_nbytes // max(1, F)
    per_dev = (budget - shared) // max(1, per_fold)
    if per_dev < 1:
        raise ValueError(
            "fold-parallel CV cannot fit even one fold per device: "
            f"budget {budget / 1e6:.0f} MB, shared cohort+frozen "
            f"{shared / 1e6:.0f} MB, per-fold {per_fold / 1e6:.0f} MB. "
            "Use --cache-embeddings (shrinks per-fold data ~3 orders of "
            "magnitude), raise ECGMM_HBM_BUDGET_BYTES, or fall back to "
            "the sequential harness."
        )
    return min(w, int(per_dev) * n_data)


def run_fold_parallel(
    task: Task,
    tx: optax.GradientTransformation,
    state0: TrainState,
    pack: FoldPack,
    cfg: TrainConfig,
    mesh=None,
    verbose: bool = True,
) -> FoldResults:
    """Train + score every (train, val, test) fold in one jitted program
    (or in budget-bounded waves of it — see _wave_size).

    state0: the single shared initial state (all folds start identical —
    the sequential harness re-inits with the same PRNGKey(seed) per fold,
    cv._fold_auc). Returns per-fold best-on-test logits and AUCs in input
    order."""
    from ecgmm_tpu.data.pipeline import resolve_hbm_budget
    from ecgmm_tpu.train import metrics as M

    if cfg.schedule != "constant":
        raise ValueError(
            "fold-parallel CV supports the constant+plateau schedule (the "
            f"reference CV protocol); got schedule={cfg.schedule!r}. "
            "Schedules with per-fold step counts (onecycle) need the "
            "sequential harness (PARITY.md 'Fold-parallel CV scope')."
        )
    n_real = pack.n_folds
    if n_real == 0:
        raise ValueError("no folds")
    for f, rset in enumerate(pack.rows):
        if any(len(r) == 0 for r in rset):
            raise ValueError(
                "fold-parallel CV needs non-empty train/val/test in "
                f"every fold (fold {f})"
            )

    tidx, tmask, tbvalid = stack_fold_plans(
        [r[0] for r in pack.rows], cfg.batch_size, shuffle=True,
        seed=cfg.seed, epochs=cfg.num_epochs,
    )
    vidx, vmask, vbvalid = _stack_eval_plans(
        [r[1] for r in pack.rows], cfg.eval_bs
    )
    sidx, smask, _ = _stack_eval_plans(
        [r[2] for r in pack.rows], cfg.eval_bs
    )
    plans = (tidx, tmask, tbvalid, vidx, vmask, vbvalid, sidx, smask)

    if mesh is not None:
        fold_sharding, n_data = _fold_axis_sharding(mesh)
    else:
        fold_sharding, n_data = None, 1

    budget = resolve_hbm_budget()
    W = _wave_size(
        pack, state0, sum(p.nbytes for p in plans), n_data,
        budget, cfg.batch_size,
    )
    if verbose and not budget:
        # Say LOUDLY which guard is actually protecting the device: the
        # relayed TPU backend reports no bytes_limit, so the byte-budget
        # guard silently resolves to "unlimited" — the one crash this
        # harness ever caused (1,440 rows, BASELINE "activation-rows
        # lesson") happened exactly because that inertness was easy to
        # miss.
        cap = _act_rows_cap(pack)
        if cap:
            print(
                "[fold-parallel] HBM byte-budget guard INERT (backend "
                "reports no bytes_limit; ECGMM_HBM_BUDGET_BYTES unset) — "
                f"the concurrent-rows cap ({cap} rows/device, "
                "ECGMM_FOLD_PARALLEL_ROWS_CAP) is the ONLY active wave "
                "guard"
            )
        elif not pack.cached_embeddings:
            # only reachable by explicitly disabling the cap on a raw
            # pack (ECGMM_FOLD_PARALLEL_ROWS_CAP=0)
            print(
                "[fold-parallel] WARNING: NO wave guard active (backend "
                "reports no bytes_limit, ECGMM_HBM_BUDGET_BYTES unset, "
                "rows cap disabled) — an over-sized raw fold pack can "
                "crash the device worker"
            )
        # cached packs: head-only FLOPs, microscopic per-fold footprint —
        # unguarded by design, nothing to warn about
    ids = list(range(n_real))
    while len(ids) % W:
        ids.append(0)       # pad waves with fold 0; duplicates dropped
    waves = [ids[i:i + W] for i in range(0, len(ids), W)]
    if verbose and len(waves) > 1:
        print(
            f"[fold-parallel] {n_real} folds exceed the per-dispatch "
            f"budget (HBM bytes / activation rows) — running "
            f"{len(waves)} waves of {W}"
        )

    # shared leaves: ONE device copy (replicated over the mesh)
    def shared_put(a):
        if a is None:
            return None
        a = jnp.asarray(a)
        if mesh is not None:
            from ecgmm_tpu.parallel import replicated_sharding

            a = jax.device_put(a, replicated_sharding(mesh))
        return a

    images_d = shared_put(None if pack.images_stacked else pack.images)
    labels_d = shared_put(pack.labels)
    sig_shared = shared_put(None if pack.signals_stacked else pack.signals)
    cli_shared = shared_put(
        None if pack.clinical_stacked else pack.clinical
    )
    frozen = state0.frozen or {}

    ax = lambda present: 0 if present else None  # noqa: E731
    data_axes = (
        ax(pack.images_stacked) if pack.images is not None else None,
        ax(pack.signals_stacked) if pack.signals is not None else None,
        ax(pack.clinical_stacked) if pack.clinical is not None else None,
        None,                                    # labels: shared
        ax(pack.sig_shift is not None),
        ax(pack.sig_scale is not None),
        ax(pack.cli_shift is not None),
        ax(pack.cli_scale is not None),
    )
    has_lr = _has_injected_lr(state0.opt_state)
    program = make_fold_program(task, tx, cfg, has_lr, data_axes)

    state_w = _put_folds(
        _broadcast_state(dataclasses.replace(state0, frozen={}), W),
        fold_sharding,
    )

    def wave_slice(a, wave):
        return None if a is None else a[np.asarray(wave)]

    out: dict = {}
    vhist_rows: dict = {}
    for wave in waves:
        wsel = np.asarray(wave)
        img_in = (
            _put_folds(pack.images[wsel], fold_sharding)
            if pack.images_stacked else images_d
        )
        sig_in = (
            _put_folds(pack.signals[wsel], fold_sharding)
            if pack.signals_stacked else sig_shared
        )
        cli_in = (
            _put_folds(pack.clinical[wsel], fold_sharding)
            if pack.clinical_stacked else cli_shared
        )
        affs = [
            _put_folds(wave_slice(a, wave), fold_sharding)
            for a in (pack.sig_shift, pack.sig_scale, pack.cli_shift,
                      pack.cli_scale)
        ]
        wplans = [_put_folds(p[wsel], fold_sharding) for p in plans]
        (slogits, slabels, best_ep, stopped_at, ever_imp, vhist) = program(
            state_w, frozen, img_in, sig_in, cli_in, labels_d,
            *affs, *wplans,
        )
        slogits = np.asarray(slogits)   # (W, SB, bs, C)
        slabels = np.asarray(slabels)
        best_ep, stopped_at = np.asarray(best_ep), np.asarray(stopped_at)
        vhist = np.asarray(vhist)
        for j, fid in enumerate(wave):
            if fid in out:
                continue                # wave-pad duplicate
            out[fid] = (slogits[j], slabels[j], int(best_ep[j]),
                        int(stopped_at[j]))
            vhist_rows[fid] = vhist[j]

    res = FoldResults(
        [], [], [], [], [],
        np.stack([vhist_rows[f] for f in range(n_real)]),
    )
    for f in range(n_real):
        slog, slab, bep, sat = out[f]
        keep = smask[f].reshape(-1) > 0
        logits = slog.reshape(-1, slog.shape[-1])[keep]
        labels = slab.reshape(-1)[keep]
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits))[:, 1])
        res.aucs.append(
            float(M.auroc(jnp.asarray(probs), jnp.asarray(labels)))
        )
        res.logits.append(logits)
        res.labels.append(labels)
        res.best_epochs.append(bep)
        res.stopped_at.append(sat)
    return res


def prepare_folds(
    make_model_task: Callable,
    cohort,
    fold_splits: Sequence,
    cfg,
    mesh=None,
    apply_filter: bool = True,
) -> Tuple[Task, optax.GradientTransformation, TrainState, FoldPack]:
    """Host-side fold preparation: per-fold scaler refits (reference
    train_kfold.py:26-29,159-162) captured as affine vectors or, where
    the transform can't factor through the gather (the scale→filter
    order; per-fold embeddings), as stacked per-fold arrays — see the
    module docstring. In cached-embedding mode the cohort's images are
    encoded ONCE for all folds (the encoder is frozen and fold-invariant)
    and only the per-fold-scaled signals/clinical re-encode, as one
    flattened (F·N, …) scan dispatch. Returns (task, tx, state0, pack)."""
    from ecgmm_tpu.data import preprocess
    from ecgmm_tpu.data.pipeline import num_batches
    from ecgmm_tpu.models import jit_init
    from ecgmm_tpu.train import embed
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
    rows = [
        (np.asarray(s.train), np.asarray(s.val), np.asarray(s.test))
        for s in fold_splits
    ]
    F, N = len(rows), len(cohort.labels)
    scalers = [
        (
            preprocess.Scaler.fit(cohort.signals[tr]),
            preprocess.Scaler.fit(cohort.clinical[tr, :n_clin]),
        )
        for tr, _, _ in rows
    ]
    labels = np.asarray(cohort.labels, np.int32)
    cached = embed.cache_applies(model, cfg.train, freeze is not None)

    sigT = None
    if apply_filter or cached:
        # per-fold transformed cohort signals, host — the same ops (and
        # the same CPU float pinning) as the sequential cv._build_arrays;
        # both transforms are row-independent, so cohort-wide == per-split
        sigT = np.empty((F,) + cohort.signals.shape, np.float32)
        with jax.default_device(jax.devices("cpu")[0]):
            for f, (es, _) in enumerate(scalers):
                s = es.transform(cohort.signals)
                if apply_filter:
                    s = preprocess.preprocess_hospital(s)
                sigT[f] = np.asarray(s, np.float32)

    if cached:
        cliT = np.empty((F, N, n_clin), np.float32)
        with jax.default_device(jax.devices("cpu")[0]):
            for f, (_, cs) in enumerate(scalers):
                cliT[f] = np.asarray(
                    cs.transform(cohort.clinical[:, :n_clin]), np.float32
                )
        from ecgmm_tpu.workloads.tasks import make_fusion_head_task

        if cfg.train.cache_bn_calibrate:
            # Per-fold BN-stat calibration (the same calibrate the
            # sequential harness applies in cv._fold_auc, on the same
            # fold-train rows/values — parity-tested): each fold's
            # cohort embeddings encode with ITS calibrated stats, so
            # the image embeddings stack (F, N, D) instead of sharing.
            # The fold program is unchanged — the fusion head carries
            # no BatchNorm, so per-fold stats matter only at encode.
            imgs_f, sigs_f, clis_f = [], [], []
            for f, (tr, _, _) in enumerate(rows):
                st_f = embed.calibrate_bn_stats(
                    model, state0,
                    Arrays(
                        images=cohort.images[tr],
                        signals=sigT[f][tr],
                        clinical=cliT[f][tr],
                        labels=labels[tr], indices=np.asarray(tr),
                    ),
                    cfg.train.eval_bs, mesh,
                )
                imgs_f.append(np.asarray(embed.encode_image_cohort(
                    model, st_f, cohort.images, cfg.train.eval_bs
                )))
                s_e, c_e = embed.encode_sigcli_rows(
                    model, st_f, sigT[f], cliT[f], cfg.train.eval_bs
                )
                sigs_f.append(np.asarray(s_e))
                clis_f.append(np.asarray(c_e))
            pack = FoldPack(
                images=np.stack(imgs_f),
                signals=np.stack(sigs_f),
                clinical=np.stack(clis_f),
                labels=labels, rows=rows,
                images_stacked=True, signals_stacked=True,
                clinical_stacked=True, cached_embeddings=True,
            )
            return make_fusion_head_task(model, cfg.train), tx, state0, \
                pack

        img_emb = np.asarray(embed.encode_image_cohort(
            model, state0, cohort.images, cfg.train.eval_bs
        ))
        sig_emb, cli_emb = embed.encode_sigcli_rows(
            model, state0,
            sigT.reshape((F * N,) + sigT.shape[2:]),
            cliT.reshape(F * N, n_clin),
            cfg.train.eval_bs,
        )
        pack = FoldPack(
            images=img_emb,
            signals=np.asarray(sig_emb).reshape(F, N, -1),
            clinical=np.asarray(cli_emb).reshape(F, N, -1),
            labels=labels, rows=rows,
            signals_stacked=True, clinical_stacked=True,
            cached_embeddings=True,
        )
        return make_fusion_head_task(model, cfg.train), tx, state0, pack

    f32 = np.float32
    if apply_filter:
        sig_kw = dict(signals=sigT, signals_stacked=True)
    else:
        sig_kw = dict(
            signals=np.asarray(cohort.signals, f32),
            sig_shift=np.stack([es.mean.astype(f32) for es, _ in scalers]),
            sig_scale=np.stack([es.scale.astype(f32) for es, _ in scalers]),
        )
    pack = FoldPack(
        images=np.asarray(cohort.images),
        clinical=np.asarray(cohort.clinical[:, :n_clin], f32),
        cli_shift=np.stack([cs.mean.astype(f32) for _, cs in scalers]),
        cli_scale=np.stack([cs.scale.astype(f32) for _, cs in scalers]),
        labels=labels, rows=rows, **sig_kw,
    )
    return task, tx, state0, pack
