"""Frozen-encoder embedding precomputation (cached fusion training).

The reference's fusion trainer freezes all three modality encoders and
optimizes only the fusion surface (`/root/reference/train.py:35-43`), yet
re-runs the frozen encoders — ~95% of the step's FLOPs, dominated by the
224×224 ResNet18 forward — on every batch of every epoch. With
`TrainConfig.cache_embeddings`, the engine instead computes each split's
raw encoder outputs ONCE (one jitted lax.scan dispatch per split) and
trains the fusion head over the cached 512/128/32-dim embeddings; epochs
then cost head-only FLOPs (~40× less).

Deviation (PARITY.md "Cached-embedding fusion training"): the cached
encoders run in EVAL mode — inference BatchNorm statistics, no dropout in
the frozen signal-encoder head — whereas the reference calls model.train()
so its frozen encoders still use batch-composition-dependent BN stats and
live dropout. Off by default; the uncached path is the parity path.
"""

from __future__ import annotations

import dataclasses
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ecgmm_tpu.data.pipeline import Arrays, normalize_images
from ecgmm_tpu.train.engine import epoch_indices
from ecgmm_tpu.train.state import TrainState


# The encode programs are module-level jits with the model (a hashable
# frozen Flax dataclass), dtype and sharding as static args, so the
# compiled executable is shared across splits / CV folds / repeated
# calls with matching shapes — per-fold re-tracing would otherwise pay
# the 30–250 s remote compile repeatedly on the relayed TPU.
@partial(jax.jit, static_argnames=("model", "dtype"))
def _encode_batch(model, variables, images, signals, clinical, dtype):
    return model.apply(
        variables, normalize_images(images, dtype), signals, clinical,
        method=type(model).encode_raw,
    )


@partial(jax.jit, static_argnames=("model", "dtype", "sharding"))
def _encode_split(model, variables, images, signals, clinical, idx_mat,
                  dtype, sharding):
    def body(_, idx):
        def take(a):
            out = jnp.take(a, idx, axis=0)
            if sharding is not None:
                out = jax.lax.with_sharding_constraint(out, sharding)
            return out

        img, sig, cli = model.apply(
            variables,
            normalize_images(take(images), dtype),
            take(signals), take(clinical),
            method=type(model).encode_raw,
        )
        return None, (img, sig, cli)

    _, outs = jax.lax.scan(body, None, idx_mat)
    return outs


def _image_branch(m, img):
    """Image-encoder half of encode_raw (models/fusion.py) — the raw
    pre-LayerNorm image embedding. Fold-invariant: the encoder is frozen
    and runs eval-mode, and CV folds never re-scale images, so ONE
    cohort-wide encode serves every fold (train/cv_parallel.py)."""
    return m.image_encoder(img, train=False).astype(jnp.float32)


def _sigcli_branch(m, sig, cli):
    """Signal+clinical half of encode_raw — per-fold inputs (the fold's
    refit scalers transform signals/clinical, reference
    train_kfold.py:26-29), so CV re-encodes these per fold."""
    if sig.ndim == 2:
        sig = sig[..., None]
    s = m.signal_encoder(sig, train=False).astype(jnp.float32)
    c = m.clinical_encoder(cli, train=False)
    if isinstance(c, tuple):
        c = c[0]
    return s, c.astype(jnp.float32)


@partial(jax.jit, static_argnames=("model", "dtype"))
def _encode_images_split(model, variables, images, idx_mat, dtype):
    def body(_, idx):
        img = model.apply(
            variables, normalize_images(jnp.take(images, idx, axis=0),
                                        dtype),
            method=_image_branch,
        )
        return None, img

    _, out = jax.lax.scan(body, None, idx_mat)
    return out


@partial(jax.jit, static_argnames=("model",))
def _encode_sigcli_split(model, variables, signals, clinical, idx_mat):
    def body(_, idx):
        out = model.apply(
            variables, jnp.take(signals, idx, axis=0),
            jnp.take(clinical, idx, axis=0),
            method=_sigcli_branch,
        )
        return None, out

    _, outs = jax.lax.scan(body, None, idx_mat)
    return outs


def _encode_rows(encode, n: int, batch_size: int):
    """Shared plan/flatten wrapper for the cohort-wise branch encoders:
    batch a row range with epoch_indices (no shuffle), run `encode`
    (a fn of the (B, bs) idx matrix), strip the pad rows."""
    idx_mat, _ = epoch_indices(n, batch_size, shuffle=False, seed=0,
                               epoch=0)
    outs = encode(jnp.asarray(idx_mat))

    def flat(x):
        return x.reshape(-1, x.shape[-1])[:n]

    return jax.tree.map(flat, outs)


def encode_image_cohort(model, state: TrainState, images, batch_size: int):
    """Encode the WHOLE cohort's images once → (N, image_dim) float32.

    Row-wise deterministic (frozen encoder, eval-mode BN), so gathering
    fold rows from this single array is exactly the per-fold encode the
    sequential cached path performs — without re-running the ResNet18
    forward F times over the same pixels."""
    from ecgmm_tpu.workloads.tasks import _compute_dtype

    variables = {"params": state.params, **state.model_state}
    return _encode_rows(
        lambda idx: _encode_images_split(
            model, variables, jnp.asarray(images), idx,
            _compute_dtype(model),
        ),
        len(images), batch_size,
    )


def encode_sigcli_rows(model, state: TrainState, signals, clinical,
                       batch_size: int):
    """Encode (rows, T) signals + (rows, C) clinical → raw signal /
    clinical embeddings, one scan dispatch. Used by the fold-parallel
    harness on the flattened (F·N, …) per-fold-transformed inputs."""
    variables = {"params": state.params, **state.model_state}
    return _encode_rows(
        lambda idx: _encode_sigcli_split(
            model, variables,
            jnp.asarray(np.asarray(signals, np.float32)),
            jnp.asarray(np.asarray(clinical, np.float32)), idx,
        ),
        len(signals), batch_size,
    )


@partial(jax.jit, static_argnames=("model", "dtype"))
def _calibrate_scan(model, params, model_state, images, signals,
                    clinical, idx_mat, dtype):
    """One pass of train-mode forwards over the planned full batches,
    threading the mutable collections (BatchNorm running stats) through
    a lax.scan — no gradients, no parameter updates. Dropout runs live
    exactly as in the reference's train-mode epochs (fixed fold rng)."""

    def body(ms, idx):
        _, new_ms = model.apply(
            {"params": params, **ms},
            normalize_images(jnp.take(images, idx, axis=0), dtype),
            jnp.take(signals, idx, axis=0),
            jnp.take(clinical, idx, axis=0),
            train=True, mutable=list(ms.keys()),
            rngs={"dropout": jax.random.fold_in(
                jax.random.PRNGKey(0), idx[0]
            )},
        )
        return new_ms, None

    ms, _ = jax.lax.scan(body, model_state, idx_mat)
    return ms


@partial(jax.jit, static_argnames=("model", "dtype"))
def _calibrate_batch(model, params, model_state, images, signals,
                     clinical, first_row, dtype):
    """Per-batch calibration step for over-HBM (HostArrays) splits.
    first_row: the batch's first global row index — the same dropout-rng
    fold the resident scan uses, so both paths apply identical updates."""
    _, new_ms = model.apply(
        {"params": params, **model_state},
        normalize_images(images, dtype), signals, clinical,
        train=True, mutable=list(model_state.keys()),
        rngs={"dropout": jax.random.fold_in(
            jax.random.PRNGKey(0), first_row
        )},
    )
    return new_ms


def calibrate_bn_stats(model, state: TrainState, arrays: Arrays,
                       batch_size: int, mesh=None,
                       passes: int = 3) -> TrainState:
    """Fit the frozen encoders' BatchNorm RUNNING statistics to a split
    before cached-embedding encoding ("precise BN" recalibration).

    The reference's fusion trainer calls model.train() with frozen
    encoder weights (`/root/reference/train.py:35-43`), so its BN layers
    keep chasing the data's activation statistics across every epoch even
    though no gradient touches them. Eval-mode encoding with whatever
    stats the state happens to hold (init values on cold start) skews
    every cached embedding — measured on the chip: cold-start cached
    fusion lands at AUROC 0.61 vs 0.99 uncached on the same cohort
    (BASELINE.md "fusion_cached preset"). This runs `passes` train-mode
    forward passes (momentum-EMA updates only, no gradients; 3 passes
    drive the EMA ≳98% of the way at typical batch counts) and returns
    the state with the calibrated collections, which the caller uses for
    BOTH encoding and the saved checkpoint — so serving sees the same
    stats the cached head was trained against."""
    from ecgmm_tpu.data.pipeline import HostArrays, prefetch_batches

    n = arrays.n
    if n == 0 or not state.model_state:
        return state
    params = state.params
    ms = state.model_state
    if isinstance(arrays, HostArrays):
        dtype = _dtype_of(model)
        n_full = max(1, n // batch_size) if n >= batch_size else 1
        for _ in range(passes):
            for j, b in enumerate(prefetch_batches(
                arrays, batch_size, shuffle=False, seed=0, mesh=mesh
            )):
                if j >= n_full:
                    break   # tail batch is row-padded — skip, like the
                            # resident full-batches-only plan
                ms = _calibrate_batch(
                    model, params, ms, b.images, b.signals, b.clinical,
                    jnp.int32(j * batch_size), dtype,
                )
        return dataclasses.replace(state, model_state=ms)
    # full batches only — epoch_indices pads the tail batch with row 0,
    # which would bias the running stats toward that row
    n_full = max(1, n // batch_size) if n >= batch_size else 1
    bs = batch_size if n >= batch_size else n
    idx = np.arange(n_full * bs, dtype=np.int32).reshape(n_full, bs)
    idx = jnp.asarray(np.tile(idx, (passes, 1)))
    ms = _calibrate_scan(
        model, params, ms, arrays.images, arrays.signals,
        arrays.clinical, idx, _dtype_of(model),
    )
    return dataclasses.replace(state, model_state=ms)


def maybe_calibrate_bn_stats(model, state: TrainState, train_arrays,
                             train_cfg, mesh=None,
                             frozen: bool = True) -> TrainState:
    """BN calibration for cached-embedding flows: a no-op unless the
    cached fast path applies AND train_cfg.cache_bn_calibrate is on.
    Called by the linear flows (run.py / pretrain.py) on the run's train
    split, and by the sequential CV harness per fold (cv._fold_auc); the
    fold-parallel harness applies the identical per-fold calibration
    inside cv_parallel.prepare_folds (stacked per-fold image embeddings),
    so the two harnesses stay parity-comparable."""
    from ecgmm_tpu.models.fusion import ECGMultimodalModel

    # quiet precondition check — maybe_cache_fusion_embeddings (always
    # called right after) owns the loud warning when the flag is set but
    # the fast path cannot apply
    if not (train_cfg.cache_bn_calibrate and train_cfg.cache_embeddings
            and isinstance(model, ECGMultimodalModel) and frozen):
        return state
    return calibrate_bn_stats(
        model, state, train_arrays, train_cfg.eval_bs, mesh
    )


def _dtype_of(model):
    from ecgmm_tpu.workloads.tasks import _compute_dtype

    return _compute_dtype(model)


def cache_applies(model, train_cfg, frozen: bool) -> bool:
    """Whether the cached-embedding fast path applies — and warn loudly
    when the flag is set but its preconditions do not hold, so a user
    never silently measures the slow path believing it cached. Shared by
    the engine wiring (maybe_cache_fusion_embeddings) and the
    fold-parallel harness (cv_parallel.prepare_folds)."""
    from ecgmm_tpu.models.fusion import ECGMultimodalModel

    if not train_cfg.cache_embeddings:
        return False
    if not isinstance(model, ECGMultimodalModel) or not frozen:
        warnings.warn(
            "cache_embeddings=True ignored: the fast path needs a fusion "
            "model with frozen encoders (got "
            f"{type(model).__name__}, frozen={frozen}); training takes "
            "the uncached parity path.",
            stacklevel=3,
        )
        return False
    return True


def precompute_fusion_embeddings(
    model, state: TrainState, arrays: Arrays, batch_size: int, mesh=None,
) -> Arrays:
    """Run `model.encode_raw` over a split in ONE jitted scan dispatch.

    Returns an Arrays whose images/signals/clinical slots hold the raw
    (pre-LayerNorm) image/signal/clinical embeddings, consumable by
    workloads.tasks.make_fusion_head_task via the unchanged engine."""
    from ecgmm_tpu.data.pipeline import HostArrays, prefetch_batches
    from ecgmm_tpu.parallel import batch_sharding
    from ecgmm_tpu.workloads.tasks import _compute_dtype

    n = arrays.n
    if n == 0:
        # Keep the real branch dims so downstream from_embeddings /
        # concatenation consumers see consistent shapes even on empty
        # splits (an all-zeros (0, 1) placeholder would be a latent
        # LayerNorm shape mismatch far from the cause).
        c = model.cfg
        return Arrays(
            images=jnp.zeros((0, c.image_dim), jnp.float32),
            signals=jnp.zeros((0, c.signal_dim), jnp.float32),
            clinical=jnp.zeros((0, c.clinical_dim), jnp.float32),
            labels=jnp.asarray(arrays.labels, jnp.int32),
            indices=arrays.indices,
        )
    sharding = batch_sharding(mesh) if mesh is not None else None
    dtype = _compute_dtype(model)
    variables = {"params": state.params, **state.model_state}

    if isinstance(arrays, HostArrays):
        # Over-HBM split: stream batches through a per-batch jitted encode
        # (double-buffered host→device prefetch); the resulting embeddings
        # are ~3 orders of magnitude smaller and come back device-resident.
        outs = [
            _encode_batch(model, variables, b.images, b.signals,
                          b.clinical, dtype)
            for b in prefetch_batches(
                arrays, batch_size, shuffle=False, seed=0, mesh=mesh
            )
        ]
        img_e, sig_e, cli_e = (
            jnp.concatenate([o[i] for o in outs])[:n] for i in range(3)
        )
        return Arrays(
            images=img_e, signals=sig_e, clinical=cli_e,
            labels=jnp.asarray(arrays.labels, jnp.int32),
            indices=np.asarray(arrays.indices),
        )

    idx_mat, _ = epoch_indices(n, batch_size, shuffle=False, seed=0, epoch=0)
    img_e, sig_e, cli_e = _encode_split(
        model, variables, arrays.images, arrays.signals, arrays.clinical,
        jnp.asarray(idx_mat), dtype, sharding,
    )

    def flat(x):
        return x.reshape(-1, x.shape[-1])[:n]

    return Arrays(
        images=flat(img_e),
        signals=flat(sig_e),
        clinical=flat(cli_e),
        labels=arrays.labels,
        indices=np.asarray(arrays.indices),
    )


def maybe_cache_fusion_embeddings(
    model, state: TrainState, splits: dict, train_cfg, mesh=None,
    frozen: bool = True,
):
    """The single wiring point for the cached-embedding fast path.

    If `train_cfg.cache_embeddings` applies (fusion model + frozen
    encoders), precompute every split's embeddings and return
    `(new_splits, head_task)`; otherwise return `(splits, None)` — with a
    loud warning when the flag was set but its preconditions do not hold,
    so a user never silently measures the slow path believing it cached.

    `splits` is a {name: Arrays} dict; order and names are preserved.
    """
    from ecgmm_tpu.workloads.tasks import make_fusion_head_task

    if not cache_applies(model, train_cfg, frozen):
        return splits, None
    new_splits = {
        name: precompute_fusion_embeddings(
            model, state, arrs, train_cfg.eval_bs, mesh
        )
        for name, arrs in splits.items()
    }
    return new_splits, make_fusion_head_task(model, train_cfg)
