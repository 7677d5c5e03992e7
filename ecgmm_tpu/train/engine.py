"""Sharded data-parallel training engine.

The reference's implicit single-GPU epoch loop
(`/root/reference/train.py:55-167`) becomes:

  * ONE jitted train step per workload — forward, loss, backward (only
    through the trainable partition: frozen encoders cost zero backward
    FLOPs), optimizer update, BatchNorm-stat update — compiled once over a
    `Mesh` with the batch sharded on the 'data' axis. Gradient reduction
    and cross-replica BatchNorm moments are XLA `psum`s over ICI inserted
    by GSPMD; there is no hand-written collective.
  * a host loop that only orchestrates: epoch iteration, plateau LR decay
    (÷10 after 2 stale epochs), early stopping (patience 5; several
    reference trainers ship with early stop commented out / absent, so
    patience=0 / plateau_patience=0 disable them — see config presets),
    best/last
    checkpoints, TensorBoard scalars — exactly the reference's control
    semantics (train.py:142-167), with the counters living inside the
    checkpointable TrainState.

A workload plugs in as a `Task` (apply/loss/logits callables); see
ecgmm_tpu/workloads/.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ecgmm_tpu.config import TrainConfig
from ecgmm_tpu.data.pipeline import (
    Arrays,
    Batch,
    epoch_order,
    iterate_batches,
    prefetch_batches,
    prefetch_chunks,
)
from ecgmm_tpu.parallel import place_state
from ecgmm_tpu.train import optim as optim_lib
from ecgmm_tpu.train.checkpoint import CheckpointManager
from ecgmm_tpu.train.logging import MetricWriter
from ecgmm_tpu.train.state import TrainState

# Streamed loops dispatch without per-batch host syncs (a sync per batch
# costs a relay round trip), but unbounded dispatch would pin every
# device_put batch until its step runs — re-accumulating the very split
# the HBM budget demoted to host RAM. Blocking on the metric scalar from
# this many batches back bounds in-flight inputs to WINDOW × batch bytes
# while amortizing the sync cost 1/WINDOW.
_STREAM_SYNC_WINDOW = 8
from ecgmm_tpu.utils.tree import merge_params


@dataclasses.dataclass(frozen=True)
class Task:
    """Workload contract.

    apply: (variables, batch, train, rngs) -> (outputs, new_model_state)
           — must pass mutable=['batch_stats'] when train.
    loss:  (outputs, batch) -> (scalar loss, metrics dict of scalars)
    logits:(outputs) -> (B, C) classification logits for accuracy.
    """

    apply: Callable
    loss: Callable
    logits: Callable


class EvalResult(NamedTuple):
    loss: float
    accuracy: float
    logits: np.ndarray
    labels: np.ndarray
    metrics: Dict[str, float]


def _train_step_core(task: Task, tx: optax.GradientTransformation,
                     state: TrainState, batch: Batch):
    rng = jax.random.fold_in(state.rng, state.step)

    def loss_fn(trainable):
        params = (
            merge_params(trainable, state.frozen)
            if state.frozen else trainable
        )
        variables = {"params": params, **state.model_state}
        outputs, new_mstate = task.apply(
            variables, batch, train=True, rngs={"dropout": rng}
        )
        loss, mets = task.loss(outputs, batch)
        return loss, (mets, new_mstate, outputs)

    (loss, (mets, new_mstate, outputs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.trainable)
    updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
    new_trainable = optax.apply_updates(state.trainable, updates)

    preds = jnp.argmax(task.logits(outputs), axis=-1)
    correct = jnp.sum(
        (preds == batch.labels).astype(jnp.float32) * batch.mask
    )
    metrics = {
        "loss": loss,
        "correct": correct,
        "count": jnp.sum(batch.mask),
        **mets,
    }
    new_state = dataclasses.replace(
        state,
        step=state.step + 1,
        trainable=new_trainable,
        opt_state=new_opt,
        model_state=new_mstate,
    )
    return new_state, metrics


def make_train_step(task: Task, tx: optax.GradientTransformation,
                    donate: bool = True):
    def train_step(state: TrainState, batch: Batch):
        return _train_step_core(task, tx, state, batch)

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def _gather_batch(arrays: Arrays, idx: jnp.ndarray, mask: jnp.ndarray,
                  sharding) -> Batch:
    def take(a):
        if a is None:
            return None
        out = jnp.take(a, idx, axis=0)
        if sharding is not None:
            out = jax.lax.with_sharding_constraint(out, sharding)
        return out

    return Batch(
        images=take(arrays.images),
        signals=take(arrays.signals),
        clinical=take(arrays.clinical),
        labels=take(arrays.labels),
        mask=mask,
    )


def make_train_epoch(task: Task, tx: optax.GradientTransformation,
                     arrays: Arrays, mesh=None, donate: bool = True):
    """Whole-epoch jitted step: a lax.scan over batches gathered on device
    from the materialised arrays. ONE dispatch per epoch — per-batch
    Python dispatch latency (significant on relayed/async backends)
    disappears, and XLA overlaps the gather of batch i+1 with the compute
    of batch i.

    The dataset arrays are jit ARGUMENTS, not closure constants — baking
    them into the executable would bloat (remote) compiles and the
    persistent cache by the dataset size."""
    jitted = _make_epoch_program(task, tx, mesh=mesh, donate=donate)

    def run(state, idx_mat, mask_mat):
        return jitted(state, _device_arrays(arrays), idx_mat, mask_mat)

    return run


def _make_epoch_program(task: Task, tx: optax.GradientTransformation,
                        mesh=None, donate: bool = True):
    """The jitted scan-over-batches program with the dataset as a jit
    ARGUMENT: (state, data, idx_mat, mask_mat) → (state, epoch metrics).
    Shared by the device-resident epoch (make_train_epoch) and the
    super-chunked streaming path (fit over pipeline.prefetch_chunks)."""
    from ecgmm_tpu.parallel import batch_sharding

    sharding = batch_sharding(mesh) if mesh is not None else None

    def epoch_fn(state: TrainState, data: Arrays, idx_mat: jnp.ndarray,
                 mask_mat: jnp.ndarray):
        def body(st, im):
            idx, mask = im
            batch = _gather_batch(data, idx, mask, sharding)
            st, mets = _train_step_core(task, tx, st, batch)
            return st, mets

        state, mets = jax.lax.scan(body, state, (idx_mat, mask_mat))
        # reduce per-batch metrics on device; keep the last soft_weights
        out = {
            "loss_sum": jnp.sum(mets["loss"]),
            "correct": jnp.sum(mets["correct"]),
            "count": jnp.sum(mets["count"]),
        }
        if "soft_weights" in mets:
            out["soft_weights"] = mets["soft_weights"][-1]
        if "var_loss" in mets:
            out["var_loss"] = jnp.mean(mets["var_loss"])
        return state, out

    return jax.jit(epoch_fn, donate_argnums=(0,) if donate else ())


def _device_arrays(arrays: Arrays) -> Arrays:
    """Arrays without the host-only index field (a jit-compatible pytree)."""
    return arrays._replace(indices=np.zeros(0, np.int32))


def make_eval_epoch(task: Task, arrays: Arrays, mesh=None):
    """Whole-split jitted eval: scan over batches, stacked logits out."""
    jitted = _make_eval_program(task, mesh=mesh)

    def run(state, idx_mat, mask_mat):
        return jitted(state, _device_arrays(arrays), idx_mat, mask_mat)

    return run


def _make_eval_program(task: Task, mesh=None):
    """The jitted scan-over-batches eval with the dataset as a jit
    ARGUMENT: (state, data, idx_mat, mask_mat) → (losses, logits,
    labels, scalar metrics), stacked per batch. Shared by the resident
    eval epoch and the super-chunked streamed val path."""
    from ecgmm_tpu.parallel import batch_sharding

    sharding = batch_sharding(mesh) if mesh is not None else None

    def epoch_fn(state: TrainState, data: Arrays, idx_mat, mask_mat):
        variables = {"params": state.params, **state.model_state}

        def body(_, im):
            idx, mask = im
            batch = _gather_batch(data, idx, mask, sharding)
            outputs, _ = task.apply(variables, batch, train=False, rngs=None)
            loss, mets = task.loss(outputs, batch)
            scalars = {
                k: v for k, v in mets.items() if getattr(v, "ndim", 0) == 0
            }
            return None, (
                loss, task.logits(outputs).astype(jnp.float32),
                batch.labels, scalars,
            )

        _, (losses, logits, labels, mets) = jax.lax.scan(
            body, None, (idx_mat, mask_mat)
        )
        return losses, logits, labels, mets

    return jax.jit(epoch_fn)


def epoch_indices(
    n: int, batch_size: int, *, shuffle: bool, seed: int, epoch: int,
    sample_weights: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side epoch plan: (n_batches, bs) index matrix + pad mask.
    The sample order comes from pipeline.epoch_order — shared with the
    streaming paths so all paths see the same samples in the same
    sequence."""
    order = epoch_order(
        n, shuffle=shuffle, seed=seed, epoch=epoch,
        sample_weights=sample_weights,
    )
    n_batches = -(-n // batch_size)
    padded = n_batches * batch_size
    mask = np.zeros(padded, np.float32)
    mask[:n] = 1.0
    full = np.concatenate([order, np.zeros(padded - n, np.int64)])
    return (
        full.reshape(n_batches, batch_size).astype(np.int32),
        mask.reshape(n_batches, batch_size),
    )


def make_eval_step(task: Task):
    def eval_step(state: TrainState, batch: Batch):
        variables = {"params": state.params, **state.model_state}
        outputs, _ = task.apply(variables, batch, train=False, rngs=None)
        loss, mets = task.loss(outputs, batch)
        logits = task.logits(outputs)
        return {
            "loss": loss,
            "logits": logits.astype(jnp.float32),
            "mets": mets,
        }

    return jax.jit(eval_step)


def _assemble_eval(losses, logits_list, labels_list, extra) -> EvalResult:
    """Shared EvalResult assembly: batch-averaged loss (the reference
    averages batch means, train.py:95-113), accuracy over real rows,
    metric means. Every eval path (eager loop, scan, streamed, chunked)
    funnels through here so the metric semantics can't drift between
    them."""
    flat_logits = np.concatenate(logits_list)
    flat_labels = np.concatenate(labels_list)
    return EvalResult(
        loss=float(np.mean(np.asarray(losses))),
        accuracy=float((flat_logits.argmax(-1) == flat_labels).mean()),
        logits=flat_logits,
        labels=flat_labels,
        metrics={
            k: float(np.mean(np.asarray(v))) for k, v in extra.items()
        },
    )


def _scan_eval_result(vlosses, vlogits, vlabels, vmask, vmets) -> EvalResult:
    """Unpack one scan-eval program's stacked outputs (leading batch dim)
    into an EvalResult, dropping pad rows via the plan mask."""
    keep = np.asarray(vmask).reshape(-1) > 0
    logits = np.asarray(vlogits)
    flat_logits = logits.reshape(-1, logits.shape[-1])[keep]
    flat_labels = np.asarray(vlabels).reshape(-1)[keep]
    return _assemble_eval(vlosses, [flat_logits], [flat_labels], vmets)


def evaluate(
    eval_step, state: TrainState, arrays: Arrays, batch_size: int,
    mesh=None,
) -> EvalResult:
    """Full-split eval: batch-averaged loss (the reference averages batch
    means, train.py:95-113) + gathered logits for host-side AUROC etc."""
    losses: List[float] = []
    all_logits, all_labels = [], []
    extra: Dict[str, List[float]] = {}
    for batch in iterate_batches(
        arrays, batch_size, shuffle=False, seed=0, mesh=mesh
    ):
        out = eval_step(state, batch)
        losses.append(float(out["loss"]))
        keep = np.asarray(batch.mask) > 0
        all_logits.append(np.asarray(out["logits"])[keep])
        all_labels.append(np.asarray(batch.labels)[keep])
        for k, v in out["mets"].items():
            if np.ndim(v) == 0:  # scalars only (e.g. skip soft_weights)
                extra.setdefault(k, []).append(float(v))

    if not all_logits:  # empty split (e.g. the degenerate AF val set)
        return EvalResult(
            loss=float("nan"), accuracy=float("nan"),
            logits=np.zeros((0, 2), np.float32),
            labels=np.zeros((0,), np.int64), metrics={},
        )
    return _assemble_eval(losses, all_logits, all_labels, extra)


def evaluate_scan(
    task: Task, state: TrainState, arrays: Arrays, batch_size: int,
    mesh=None, eval_epoch=None,
) -> EvalResult:
    """`evaluate` semantics in ONE device dispatch (lax.scan over batches,
    like the in-fit validation path). On the relayed TPU each per-batch
    dispatch costs real round-trip latency, so the final best/last test
    protocol uses this instead of the eager `evaluate` loop. Pass a
    prebuilt `eval_epoch` (from make_eval_epoch) to reuse its compiled
    program across the best/last restores."""
    if arrays.n == 0:
        return EvalResult(
            loss=float("nan"), accuracy=float("nan"),
            logits=np.zeros((0, 2), np.float32),
            labels=np.zeros((0,), np.int64), metrics={},
        )
    if eval_epoch is None:
        eval_epoch = make_eval_epoch(task, arrays, mesh=mesh)
    idx, mask = epoch_indices(
        arrays.n, batch_size, shuffle=False, seed=0, epoch=0
    )
    losses, logits, labels, mets = eval_epoch(
        state, jnp.asarray(idx), jnp.asarray(mask)
    )
    return _scan_eval_result(losses, logits, labels, mask, mets)


def _eval_streamed_chunked(
    chunk_eval, state: TrainState, arrays, batch_size: int,
    chunk_batches: int, mesh=None,
) -> EvalResult:
    """Streamed eval over a HostArrays split, K planned batches per scan
    dispatch: ~K× fewer dispatches AND ~K× fewer device→host fetches than
    the per-batch loop (each fetch is a relay round trip)."""
    idx_h, mask_h_all = epoch_indices(
        arrays.n, batch_size, shuffle=False, seed=0, epoch=0
    )
    losses_l, logits_l, labels_l = [], [], []
    extra_l: Dict[str, List[float]] = {}
    for data_c, idx_c, mask_c, mask_h in prefetch_chunks(
        arrays, idx_h, mask_h_all, chunk_batches, mesh=mesh
    ):
        vlosses, vlogits, vlabels, vmets = chunk_eval(
            state, _device_arrays(data_c), idx_c, mask_c
        )
        # host mask copy — the device mask would cost a relay
        # round-trip fetch per chunk
        keep = mask_h.reshape(-1) > 0
        logits_l.append(
            np.asarray(vlogits).reshape(-1, vlogits.shape[-1])[keep]
        )
        labels_l.append(np.asarray(vlabels).reshape(-1)[keep])
        losses_l.extend(np.asarray(vlosses).tolist())
        for k, v in vmets.items():
            extra_l.setdefault(k, []).extend(
                np.asarray(v).reshape(-1).tolist()
            )
    return _assemble_eval(losses_l, logits_l, labels_l, extra_l)


def _eval_streamed_perbatch(
    stream_eval_step, state: TrainState, arrays, batch_size: int,
    mesh=None,
) -> EvalResult:
    """Per-batch streamed eval over a HostArrays split. Dispatches ahead,
    holding only device refs — a float()/np.asarray() on every batch would
    block on a ~25 ms relay round trip each and serialize the host→device
    prefetch pipeline; the windowed sync bounds in-flight batches, and the
    single epoch-end sync converts finished results."""
    outs, masks_d, labels_d = [], [], []
    for batch in prefetch_batches(
        arrays, batch_size, shuffle=False, seed=0, epoch=0, mesh=mesh,
    ):
        outs.append(stream_eval_step(state, batch))
        masks_d.append(batch.mask)
        labels_d.append(batch.labels)
        if len(outs) > _STREAM_SYNC_WINDOW:
            jax.block_until_ready(outs[-_STREAM_SYNC_WINDOW - 1]["loss"])
    losses_l, logits_l, labels_l = [], [], []
    extra_l: Dict[str, List[float]] = {}
    for out, mask_d, lab_d in zip(outs, masks_d, labels_d):
        keep = np.asarray(mask_d) > 0
        losses_l.append(float(out["loss"]))
        logits_l.append(np.asarray(out["logits"])[keep])
        labels_l.append(np.asarray(lab_d)[keep])
        for k, v in out["mets"].items():
            if np.ndim(v) == 0:  # scalars (e.g. var_loss)
                extra_l.setdefault(k, []).append(float(v))
    return _assemble_eval(losses_l, logits_l, labels_l, extra_l)


def make_streamed_eval_program(task: Task, mesh=None,
                               chunked: bool = False):
    """Build the jitted program evaluate_streamed runs, so callers that
    evaluate more than once (e.g. the best/last test protocol) compile
    it ONCE — each builder call is a fresh closure, i.e. a fresh trace
    and a fresh 30–250 s remote compile on the relayed TPU."""
    return _make_eval_program(task, mesh=mesh) if chunked \
        else make_eval_step(task)


def evaluate_streamed(
    task: Task, state: TrainState, arrays, batch_size: int,
    mesh=None, stream_chunk_batches: int = 0, program=None,
) -> EvalResult:
    """`evaluate` semantics for an over-HBM-budget HostArrays split: the
    data never gets a full device copy. Chunked (one scan dispatch per K
    batches) when stream_chunk_batches > 1, per-batch otherwise — the
    same two paths the in-fit streamed validation uses.

    program: a prebuilt make_streamed_eval_program(task, mesh, chunked=
    stream_chunk_batches > 1) to share the compiled executable across
    calls; built fresh when None."""
    if arrays.n == 0:
        return EvalResult(
            loss=float("nan"), accuracy=float("nan"),
            logits=np.zeros((0, 2), np.float32),
            labels=np.zeros((0,), np.int64), metrics={},
        )
    chunked = stream_chunk_batches > 1
    if program is None:
        program = make_streamed_eval_program(task, mesh=mesh,
                                             chunked=chunked)
    if chunked:
        return _eval_streamed_chunked(
            program, state, arrays, batch_size, stream_chunk_batches,
            mesh=mesh,
        )
    return _eval_streamed_perbatch(
        program, state, arrays, batch_size, mesh=mesh
    )


class Preempted(RuntimeError):
    """Raised by multi-fit drivers (the CV harnesses) when a fit
    reports `FitResult.preempted`: the process received SIGTERM, the
    interrupted fold's state was saved, and launching further fits
    would race the impending SIGKILL."""


@dataclasses.dataclass
class FitResult:
    state: TrainState
    history: List[Dict[str, float]]
    best_epoch: int
    stopped_early: bool
    # host snapshot of the best-val-loss state; populated only with
    # fit(keep_best=True) (callers without a CheckpointManager — e.g.
    # the CV harnesses — still need the best model, not the final one)
    best_state: Optional[TrainState] = None
    # SIGTERM arrived mid-fit (graceful stop after the current epoch).
    # Multi-fit drivers — the CV harnesses — MUST check this and stop
    # launching further fits: the process is being preempted, and a
    # fold cut short by the handler would otherwise be scored as a
    # normal result and the remaining folds raced against SIGKILL
    # (observed in a round-5 chip run: `timeout` TERM'd the sequential
    # exhaustive harness at pair ~35, that fold trained short, and the
    # harness kept going for another ~40 minutes).
    preempted: bool = False


def fit(
    task: Task,
    state: TrainState,
    tx: optax.GradientTransformation,
    train_arrays: Arrays,
    val_arrays: Arrays,
    cfg: TrainConfig,
    mesh=None,
    ckpt: Optional[CheckpointManager] = None,
    writer: Optional[MetricWriter] = None,
    log_prefix: str = "",
    verbose: bool = True,
    train_sample_weights: Optional[np.ndarray] = None,
    keep_best: bool = False,
) -> FitResult:
    """The reference's epoch loop semantics (train.py:55-167), sharded.

    keep_best: also return a host snapshot of the best-val-loss state in
    FitResult.best_state (donation-safe — jax.device_get copies before
    the next epoch can donate the buffers). For callers without a
    CheckpointManager that must score the BEST model, not the final one
    (the CV harnesses' reference protocol, train_kfold.py:117-133)."""
    prev_debug_nans = None
    if cfg.debug_nans:
        # jit purity makes data races structural non-issues; numeric
        # faults are the failure mode worth trapping (SURVEY.md §5).
        # Scoped to this fit: restored on exit so a later run in the same
        # process (CV folds, staged pretraining) doesn't inherit the
        # per-dispatch NaN-scan sync.
        prev_debug_nans = bool(jax.config.jax_debug_nans)
        jax.config.update("jax_debug_nans", True)

    # Preemption-aware: on SIGTERM finish the current epoch, persist the
    # full TrainState (exact resume), then stop. Reference behavior on
    # preemption was to lose everything since the last last.pth epoch
    # write (SURVEY.md §5 failure-detection row).
    preempted = {"flag": False}
    prev_handler = None
    try:
        import signal as _signal

        def _on_term(signum, frame):
            preempted["flag"] = True

        prev_handler = _signal.signal(_signal.SIGTERM, _on_term)
    except ValueError:
        pass  # not the main thread — skip graceful-preemption hook

    try:
        return _fit_loop(
            task, state, tx, train_arrays, val_arrays, cfg, mesh, ckpt,
            writer, log_prefix, verbose, train_sample_weights, keep_best,
            preempted,
        )
    finally:
        # Cleanup must survive ANY exit — normal return, the debug_nans
        # FloatingPointError, KeyboardInterrupt, a checkpoint-writer
        # error: a leaked handler makes the process ignore SIGTERM, a
        # leaked debug_nans flag poisons every later fit in the process,
        # and an undrained checkpoint queue swallows async write errors.
        if prev_handler is not None:
            try:
                import signal as _signal

                _signal.signal(_signal.SIGTERM, prev_handler)
            except ValueError:
                pass
        if prev_debug_nans is not None:
            jax.config.update("jax_debug_nans", prev_debug_nans)
        if ckpt is not None:
            ckpt.wait_until_finished()  # drain async writes


def _fit_loop(
    task: Task,
    state: TrainState,
    tx: optax.GradientTransformation,
    train_arrays: Arrays,
    val_arrays: Arrays,
    cfg: TrainConfig,
    mesh,
    ckpt: Optional[CheckpointManager],
    writer: Optional[MetricWriter],
    log_prefix: str,
    verbose: bool,
    train_sample_weights: Optional[np.ndarray],
    keep_best: bool,
    preempted: dict,
) -> FitResult:
    """fit()'s epoch loop; fit() owns setup/teardown (debug_nans scope,
    SIGTERM handler, checkpoint drain) around this."""
    # Splits over the HBM budget arrive as HostArrays and stream through
    # the double-buffered prefetcher — per-batch jitted steps, or (with
    # cfg.stream_chunk_batches > 1) super-chunks of K planned batches per
    # device dispatch through the same scan-epoch program the resident
    # path uses (cuts the per-dispatch relay tax ~K×). Device-resident
    # splits use the one-dispatch scan-epoch program.
    from ecgmm_tpu.data.pipeline import HostArrays

    train_streamed = isinstance(train_arrays, HostArrays)
    val_streamed = isinstance(val_arrays, HostArrays)
    train_chunked = train_streamed and cfg.stream_chunk_batches > 1
    val_chunked = val_streamed and cfg.stream_chunk_batches > 1
    if train_chunked:
        chunk_epoch = _make_epoch_program(
            task, tx, mesh=mesh, donate=cfg.donate_state
        )
    elif train_streamed:
        stream_step = make_train_step(task, tx, donate=cfg.donate_state)
    else:
        train_epoch = make_train_epoch(
            task, tx, train_arrays, mesh=mesh, donate=cfg.donate_state
        )
    if val_chunked:
        # via make_streamed_eval_program so the in-fit streamed val path
        # can never diverge from the evaluate_streamed protocol path
        chunk_eval = make_streamed_eval_program(task, mesh=mesh,
                                                chunked=True)
    elif val_streamed:
        stream_eval_step = make_streamed_eval_program(task, mesh=mesh,
                                                      chunked=False)
    else:
        eval_epoch = make_eval_epoch(task, val_arrays, mesh=mesh)
    if mesh is not None:
        # replicated on a pure-data mesh; column-sharded kernels when the
        # mesh has a real model axis (tensor parallelism, parallel/tp.py)
        state = place_state(state, mesh)

    # fixed validation plan (no shuffle) — computed once; the streamed
    # paths plan per call inside the _eval_streamed_* helpers
    if val_arrays.n > 0 and not val_streamed:
        vidx, vmask = epoch_indices(
            val_arrays.n, cfg.eval_bs, shuffle=False, seed=0, epoch=0
        )
        vidx, vmask = jnp.asarray(vidx), jnp.asarray(vmask)

    history: List[Dict[str, float]] = []
    best_host_state: Optional[TrainState] = None
    best_epoch = -1
    stopped_early = False
    start_epoch = int(state.epoch)

    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.perf_counter()
        if train_chunked:
            idx, mask = epoch_indices(
                train_arrays.n, cfg.batch_size, shuffle=True, seed=cfg.seed,
                epoch=epoch, sample_weights=train_sample_weights,
            )
            n_batches = idx.shape[0]
            chunk_mets: List[Dict[str, Any]] = []
            stream_stats: Dict[str, float] = {}
            for data_c, idx_c, mask_c, _ in prefetch_chunks(
                train_arrays, idx, mask, cfg.stream_chunk_batches,
                mesh=mesh, stats=stream_stats,
            ):
                state, tm_c = chunk_epoch(
                    state, _device_arrays(data_c), idx_c, mask_c
                )
                chunk_mets.append(tm_c)
                # Bound the pipeline: up to THREE chunks coexist on
                # device (one computing, one dispatched behind it, one
                # uploading from the generator) — run.py's auto-K sizes
                # each chunk at ≤ budget/6 so the transient stays ≤ half
                # the HBM budget.
                if len(chunk_mets) > 1:
                    jax.block_until_ready(chunk_mets[-2]["loss_sum"])
            if chunk_mets:
                tm = {
                    k: jnp.sum(jnp.stack([m[k] for m in chunk_mets]))
                    for k in ("loss_sum", "correct", "count")
                }
                if "soft_weights" in chunk_mets[-1]:
                    tm["soft_weights"] = chunk_mets[-1]["soft_weights"]
            else:  # empty split — mirror the resident path's zero metrics
                tm = {
                    k: jnp.zeros(())
                    for k in ("loss_sum", "correct", "count")
                }
        elif train_streamed:
            # per-batch dispatch with 2-deep host→device prefetch; metric
            # scalars stay on device until the end-of-epoch sync
            step_mets: List[Dict[str, Any]] = []
            n_batches = 0
            for batch in prefetch_batches(
                train_arrays, cfg.batch_size, shuffle=True, seed=cfg.seed,
                epoch=epoch, mesh=mesh,
                sample_weights=train_sample_weights,
            ):
                state, mets = stream_step(state, batch)
                step_mets.append(mets)
                n_batches += 1
                if n_batches > _STREAM_SYNC_WINDOW:
                    jax.block_until_ready(
                        step_mets[-_STREAM_SYNC_WINDOW - 1]["loss"]
                    )
            if step_mets:
                tm = {
                    "loss_sum": jnp.sum(
                        jnp.stack([m["loss"] for m in step_mets])
                    ),
                    "correct": jnp.sum(
                        jnp.stack([m["correct"] for m in step_mets])
                    ),
                    "count": jnp.sum(
                        jnp.stack([m["count"] for m in step_mets])
                    ),
                }
                if "soft_weights" in step_mets[-1]:
                    tm["soft_weights"] = step_mets[-1]["soft_weights"]
            else:  # empty split — match the chunked/resident zero metrics
                tm = {
                    "loss_sum": jnp.zeros(()),
                    "correct": jnp.zeros(()),
                    "count": jnp.zeros(()),
                }
        else:
            idx, mask = epoch_indices(
                train_arrays.n, cfg.batch_size, shuffle=True, seed=cfg.seed,
                epoch=epoch, sample_weights=train_sample_weights,
            )
            n_batches = idx.shape[0]
            # ONE device dispatch for the whole training epoch (lax.scan)
            state, tm = train_epoch(
                state, jnp.asarray(idx), jnp.asarray(mask)
            )

        avg_train_loss = float(tm["loss_sum"]) / max(n_batches, 1)
        train_acc = float(tm["correct"]) / max(float(tm["count"]), 1.0)
        last_mets: Dict[str, Any] = tm

        if val_chunked and val_arrays.n > 0:
            val = _eval_streamed_chunked(
                chunk_eval, state, val_arrays, cfg.eval_bs,
                cfg.stream_chunk_batches, mesh=mesh,
            )
        elif val_streamed and val_arrays.n > 0:
            val = _eval_streamed_perbatch(
                stream_eval_step, state, val_arrays, cfg.eval_bs,
                mesh=mesh,
            )
        elif val_arrays.n > 0:
            vlosses, vlogits, vlabels, vmets = eval_epoch(state, vidx, vmask)
            val = _scan_eval_result(vlosses, vlogits, vlabels, vmask, vmets)
        else:
            val = EvalResult(
                float("nan"), float("nan"),
                np.zeros((0, 2), np.float32), np.zeros((0,), np.int64), {},
            )
        epoch_time = time.perf_counter() - t0

        scalars = {
            "Loss/Train": avg_train_loss,
            "Loss/Val": val.loss,
            "Accuracy/Train": train_acc,
            "Accuracy/Val": val.accuracy,
            "Time/Epoch": epoch_time,
        }
        if "var_loss" in val.metrics:
            scalars["VarLoss/Val"] = val.metrics["var_loss"]
        if train_chunked:
            # host cost of staging chunks (runs on the gather-ahead
            # thread, so it OVERLAPS compute — cost, not critical path):
            # numpy fancy-gather+cast vs device_put enqueue
            scalars["Time/StreamGather"] = stream_stats.get("gather_s",
                                                            0.0)
            scalars["Time/StreamPut"] = stream_stats.get("put_s", 0.0)
        if "soft_weights" in last_mets:
            sw = np.asarray(last_mets["soft_weights"])
            scalars["AttentionWeights/Image_w"] = float(sw[0])
            scalars["AttentionWeights/Signal_w"] = float(sw[1])
            scalars["AttentionWeights/Clinical_w"] = float(sw[2])
        lr = optim_lib.get_lr(state.opt_state)
        if lr is not None:
            scalars["LR"] = lr
        if writer is not None:
            writer.scalars(epoch, {log_prefix + k: v for k, v in scalars.items()})
        history.append(dict(scalars, epoch=epoch))
        if verbose:
            stream = (
                f" gather={scalars['Time/StreamGather']:.2f}s"
                f" put={scalars['Time/StreamPut']:.2f}s"
                if train_chunked else ""
            )
            print(
                f"epoch {epoch + 1}/{cfg.num_epochs} "
                f"train_loss={avg_train_loss:.4f} acc={train_acc:.4f} "
                f"val_loss={val.loss:.4f} val_acc={val.accuracy:.4f} "
                f"({epoch_time:.1f}s{stream})"
            )

        state = dataclasses.replace(
            state, epoch=jnp.asarray(epoch + 1, jnp.int32)
        )

        # Early stop & plateau LR decay (reference train.py:145-167).
        # The counters are updated BEFORE any checkpoint write so 'last'
        # persists the fully-updated state: saving it earlier left
        # best_val_loss/counters one epoch stale, and a crash + --resume
        # could then overwrite 'best' with a worse model and shift the
        # early-stop/LR-decay timing (round-1 advisor finding).
        # A non-finite val loss (empty/degenerate val set, or a NaN
        # epoch) carries NO signal: it must neither improve best NOR
        # count as a stale epoch — otherwise `nan < best` is False
        # every epoch and patience epochs of no-signal silently
        # early-stop the run with no 'best' ever written (PARITY.md).
        val_informative = bool(np.isfinite(val.loss))
        improved = (
            val_informative and val.loss < float(state.best_val_loss)
        )
        if improved:
            state = dataclasses.replace(
                state,
                best_val_loss=jnp.asarray(val.loss, jnp.float32),
                early_stop_counter=jnp.zeros((), jnp.int32),
                lr_reduce_counter=jnp.zeros((), jnp.int32),
            )
            best_epoch = epoch
            if keep_best:
                best_host_state = jax.device_get(state)
        elif val_informative:
            state = dataclasses.replace(
                state,
                early_stop_counter=state.early_stop_counter + 1,
                lr_reduce_counter=state.lr_reduce_counter + 1,
            )
            if (cfg.plateau_patience > 0
                    and int(state.lr_reduce_counter) >= cfg.plateau_patience):
                if optim_lib.get_lr(state.opt_state) is not None:
                    state = dataclasses.replace(
                        state,
                        opt_state=optim_lib.scale_lr(
                            state.opt_state, cfg.plateau_factor
                        ),
                        lr_reduce_counter=jnp.zeros((), jnp.int32),
                    )

        if ckpt is not None:
            ckpt.save("last", state)
            if improved:
                ckpt.save("best", state)
                ckpt.save_epoch(epoch + 1, state)

        if (cfg.patience > 0 and not improved
                and int(state.early_stop_counter) >= cfg.patience):
            stopped_early = True
            break

        if preempted["flag"]:
            if ckpt is not None:
                # About to die: block for durability (async elsewhere).
                ckpt.save("last", state, block=True)
            break

    return FitResult(
        state=state, history=history, best_epoch=best_epoch,
        stopped_early=stopped_early, best_state=best_host_state,
        preempted=preempted["flag"],
    )
