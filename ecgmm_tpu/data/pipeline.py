"""Offline dataset materialization + sharded device feeding.

The reference pays PIL decode + scipy filtfilt per sample, per epoch, in
DataLoader worker processes (`/root/reference/dataset.py:53-74` — its CPU
bottleneck). The whole cohort is tiny (~244 × (2476 floats + 224² image)),
so here every split is materialised ONCE into device-resident arrays:

  * images stay uint8 in HBM (4× smaller than f32); the ±0.5 normalisation
    runs on device fused into the first conv's input;
  * signals are scaler-transformed + filtered by the jittable ops in
    preprocess.py in one batched pass;
  * per-epoch batching is pure index shuffling on host; batches are sliced
    on device from the materialised arrays, already sharded over the
    'data' mesh axis.

Epoch iteration therefore does zero host→device copies of sample data.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ecgmm_tpu.config import Config
from ecgmm_tpu.data import preprocess, splits, synthetic
from ecgmm_tpu.parallel import batch_sharding


class Arrays(NamedTuple):
    """One materialised split. Fields may be None for unimodal tasks."""

    images: Optional[jnp.ndarray]    # (N, H, W, 3) uint8
    signals: Optional[jnp.ndarray]   # (N, T) or (N, C, T) float32
    clinical: Optional[jnp.ndarray]  # (N, C) float32
    labels: jnp.ndarray              # (N,) int32
    indices: np.ndarray              # (N,) original patient ids (host)

    @property
    def n(self) -> int:
        return int(self.labels.shape[0])


@dataclasses.dataclass
class MaterializedData:
    train: Arrays
    val: Arrays
    test: Arrays
    ecg_scaler: preprocess.Scaler
    clinical_scaler: preprocess.Scaler


def normalize_images(images_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 → float, matching torchvision ToTensor + Normalize(±0.5)
    (reference dataset.py:119-123): (x/255 − 0.5)/0.5.

    `dtype` lets bf16-compute models normalize directly in their compute
    dtype: the (B, 224, 224, 3) float32 intermediate is the single largest
    tensor in the flagship step, and writing it in bf16 halves the stem's
    HBM traffic (values 0…255 are exactly representable; the /127.5 fma
    adds ≤2⁻⁸ relative rounding before BatchNorm renormalizes anyway)."""
    return images_u8.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(
        1.0, dtype
    )


def filter_signals_host(sig_np: np.ndarray) -> np.ndarray:
    """The hospital signal filter on host: prefer the threaded C++
    engine (ecgmm_tpu/native, scipy-exact), fall back to the JAX
    lax.scan implementation on CPU. Shared by the offline
    materialisation AND the serving request path so train and serve see
    the same preprocessing implementation."""
    try:
        from ecgmm_tpu import native

        if native.available():
            return native.preprocess_hospital(sig_np).astype(np.float32)
    except Exception:
        pass
    return np.asarray(
        preprocess.preprocess_hospital(jnp.asarray(sig_np)), np.float32
    )


def materialize_trimodal(
    cohort: synthetic.SyntheticCohort,
    cfg: Config,
    apply_signal_filter: bool = True,
    scale_all_clinical: Optional[bool] = None,
    device: bool = True,
) -> MaterializedData:
    """Split + scale + preprocess a trimodal cohort into device arrays.

    Mirrors get_dataloaders semantics (reference dataset.py:118-213):
    stratified 8:1:1 on seed, StandardScaler fit on train only (full ECG
    matrix; AGE/Wt for clinical), per-sample baseline-removal + low-pass
    on the scaled signals.

    scale_all_clinical: the canonical variant scales only AGE/Wt
    (dataset.py:198); the modal-balance variant scales every clinical
    column (dataset_image.py:36 / dataset_kfold.py:36). Defaults by
    cfg.model.variant.

    device=False keeps the splits as host-resident numpy (HostArrays) —
    used by the --split-cache save path so over-HBM datasets can be
    persisted without ever touching the device (and without the
    device→host readback a post-promotion save would cost).

    device=True promotes each split to device residency ONLY when it
    fits the HBM budget (resolve_hbm_budget); over-budget splits stay
    HostArrays for the streaming engine path. Checking BEFORE the
    upload matters: an unconditional _promote of a larger-than-HBM
    split would OOM before any later fit_in_budget could demote it.
    """
    sp = splits.stratified_811(cohort.labels, seed=cfg.train.seed)

    if scale_all_clinical is None:
        scale_all_clinical = cfg.model.variant == "modal_balance"
    n_scaled = cohort.clinical.shape[1] if scale_all_clinical else 2

    ecg_scaler = preprocess.Scaler.fit(cohort.signals[sp.train])
    clin_scaler = preprocess.Scaler.fit(cohort.clinical[sp.train, :n_scaled])

    def build(idx: np.ndarray) -> Arrays:
        # The zero-phase IIR filtering runs in float64 (scipy parity);
        # TPUs have no f64, so the offline materialisation pass is pinned
        # to the host CPU backend. Results transfer to the accelerator
        # once, below.
        with jax.default_device(jax.devices("cpu")[0]):
            sig = np.asarray(ecg_scaler.transform(cohort.signals[idx]))
            if apply_signal_filter:
                sig = filter_signals_host(sig)
            sig = np.asarray(sig, np.float32)
            clin = clin_scaler.transform(cohort.clinical[idx, :n_scaled])
            if cohort.clinical.shape[1] > n_scaled:
                clin = jnp.concatenate(
                    [clin, jnp.asarray(cohort.clinical[idx, n_scaled:])],
                    axis=1,
                )
            clin = np.asarray(clin, np.float32)
        host = HostArrays(
            images=np.asarray(cohort.images[idx]),
            signals=np.asarray(sig, np.float32),
            clinical=clin,
            labels=np.asarray(cohort.labels[idx], np.int32),
            indices=cohort.indices[idx],
        )
        return host

    tr, va, te = build(sp.train), build(sp.val), build(sp.test)
    if device:
        # cumulative: the three splits share one budget (train first —
        # it is the hot split; val/test demote first when space runs out)
        tr, va, te = fit_splits_in_budget(
            (tr, va, te), resolve_hbm_budget()
        )
    return MaterializedData(
        train=tr,
        val=va,
        test=te,
        ecg_scaler=ecg_scaler,
        clinical_scaler=clin_scaler,
    )


def materialize_signal(
    signals: np.ndarray,
    labels: np.ndarray,
    split: splits.Split,
    preprocess_fn=None,
    spectrogram: bool = False,
    device: bool = True,
) -> "MaterializedData":
    """Signal-only task materialization (train_signal_only*.py /
    train_physionet*.py / train_signal_only_ptb.py families).

    preprocess_fn: host-side (N, ..., T) -> (N, ..., T') applied per
    split. spectrogram converts to log-STFT images for the CRNN
    (train_physionet2.py). device=False → host-resident splits (see
    materialize_trimodal)."""
    from ecgmm_tpu.ops.spectrogram import log_spectrogram

    def build(idx: np.ndarray) -> Arrays:
        with jax.default_device(jax.devices("cpu")[0]):
            sig = signals[idx]
            if preprocess_fn is not None:
                sig = np.asarray(preprocess_fn(sig), np.float32)
            if spectrogram:
                sig = np.asarray(
                    log_spectrogram(jnp.asarray(sig, jnp.float32)),
                    np.float32,
                )
        host = HostArrays(
            images=None,
            signals=np.asarray(sig, np.float32),
            clinical=None,
            labels=np.asarray(labels[idx], np.int32),
            indices=np.asarray(idx),
        )
        return host

    tr, va, te = build(split.train), build(split.val), build(split.test)
    if device:
        tr, va, te = fit_splits_in_budget(
            (tr, va, te), resolve_hbm_budget()
        )
    ident = preprocess.Scaler(np.zeros(1), np.ones(1))
    return MaterializedData(
        train=tr,
        val=va,
        test=te,
        ecg_scaler=ident,
        clinical_scaler=ident,
    )


class Batch(NamedTuple):
    images: Optional[jnp.ndarray]
    signals: Optional[jnp.ndarray]
    clinical: Optional[jnp.ndarray]
    labels: jnp.ndarray
    # 1.0 for real samples, 0.0 for pad rows (batch padded to a multiple of
    # the data-axis size so shapes stay static under jit).
    mask: jnp.ndarray


def epoch_order(
    n: int, *, shuffle: bool, seed: int, epoch: int,
    sample_weights: Optional[np.ndarray] = None,
) -> np.ndarray:
    """THE per-epoch sample order — shared by iterate_batches,
    prefetch_batches and engine.epoch_indices so the streamed and
    resident paths provably see the same samples in the same order (the
    bit-parity tests depend on one implementation, not three copies).
    sample_weights enables weighted sampling WITH replacement — the
    reference's WeightedRandomSampler (train_signal_only_ptb.py:230-241).
    """
    rng = np.random.RandomState(seed + epoch)
    if sample_weights is not None:
        p = np.asarray(sample_weights, np.float64)
        p = p / p.sum()
        return rng.choice(n, size=n, replace=True, p=p)
    order = np.arange(n)
    if shuffle:
        rng.shuffle(order)
    return order


def _pad_indices(idx: np.ndarray, multiple: int) -> Tuple[np.ndarray, np.ndarray]:
    n = len(idx)
    padded = ((n + multiple - 1) // multiple) * multiple
    mask = np.zeros(padded, np.float32)
    mask[:n] = 1.0
    if padded > n:
        idx = np.concatenate([idx, np.full(padded - n, idx[-1] if n else 0)])
    return idx, mask


def iterate_batches(
    arrays: Arrays,
    batch_size: int,
    *,
    shuffle: bool,
    seed: int,
    epoch: int = 0,
    mesh=None,
    drop_remainder: bool = False,
    sample_weights: Optional[np.ndarray] = None,
) -> Iterator[Batch]:
    """Host-side index iteration over device-resident arrays.

    Gathers batch slices on device via jnp.take (a device-side gather from
    HBM — no host copies), then constrains the result to the 'data'
    sharding so downstream jit sees sharded inputs.

    sample_weights enables weighted sampling WITH replacement — the
    reference's WeightedRandomSampler class balancing
    (train_signal_only_ptb.py:230-241).
    """
    n = arrays.n
    order = epoch_order(
        n, shuffle=shuffle, seed=seed, epoch=epoch,
        sample_weights=sample_weights,
    )
    sharding = batch_sharding(mesh) if mesh is not None else None

    for start in range(0, n, batch_size):
        idx = order[start:start + batch_size]
        if drop_remainder and len(idx) < batch_size:
            break
        # pad the tail to the FULL batch size: a ragged tail shape would
        # force a second trace/compile of any jitted consumer (30–250 s
        # per compile on the relayed TPU) for one batch; pad rows are
        # metric-neutral via the mask
        idx, mask = _pad_indices(idx, batch_size)
        didx = jnp.asarray(idx, jnp.int32)

        def take(a):
            if a is None:
                return None
            out = jnp.take(a, didx, axis=0)
            if sharding is not None:
                out = jax.device_put(out, sharding)
            return out

        yield Batch(
            images=take(arrays.images),
            signals=take(arrays.signals),
            clinical=take(arrays.clinical),
            labels=take(arrays.labels),
            mask=(
                jax.device_put(jnp.asarray(mask), sharding)
                if sharding is not None else jnp.asarray(mask)
            ),
        )


def num_batches(n: int, batch_size: int, drop_remainder: bool = False) -> int:
    return n // batch_size if drop_remainder else -(-n // batch_size)


# ---------------------------------------------------------------------------
# Streaming path for datasets over the HBM budget (SURVEY §2.4 comm row).
# ---------------------------------------------------------------------------

class HostArrays(NamedTuple):
    """A split that stays in host RAM (numpy); batches are streamed to the
    device through a double-buffered prefetcher instead of being gathered
    from a device-resident pool. Produced by `to_host_resident` /
    `fit_in_budget` when a split exceeds the HBM budget."""

    images: Optional[np.ndarray]
    signals: Optional[np.ndarray]
    clinical: Optional[np.ndarray]
    labels: np.ndarray
    indices: np.ndarray

    @property
    def n(self) -> int:
        return int(self.labels.shape[0])


def split_nbytes(arrays) -> int:
    return sum(
        a.nbytes for a in
        (arrays.images, arrays.signals, arrays.clinical, arrays.labels)
        if a is not None
    )


def to_host_resident(arrays: Arrays) -> HostArrays:
    return HostArrays(
        images=None if arrays.images is None else np.asarray(arrays.images),
        signals=(
            None if arrays.signals is None else np.asarray(arrays.signals)
        ),
        clinical=(
            None if arrays.clinical is None else np.asarray(arrays.clinical)
        ),
        labels=np.asarray(arrays.labels),
        indices=arrays.indices,
    )


def fit_in_budget(arrays, hbm_budget_bytes: Optional[int]):
    """Keep the split device-resident when it fits the budget; otherwise
    demote it to HostArrays for the streaming engine path. budget None/0 =
    unlimited (the 244-patient cohort and even full PTB-XL fit v5e HBM;
    the budget exists so larger-than-HBM datasets still train). Accepts
    either residency: in-budget HostArrays are promoted, over-budget
    Arrays demoted."""
    if not hbm_budget_bytes or split_nbytes(arrays) <= hbm_budget_bytes:
        return arrays if isinstance(arrays, Arrays) else _promote(arrays)
    return arrays if isinstance(arrays, HostArrays) \
        else to_host_resident(arrays)


def fit_splits_in_budget(splits_seq, hbm_budget_bytes: Optional[int]):
    """`fit_in_budget` across splits CUMULATIVELY: bytes promoted by
    earlier splits are charged against the budget the later ones see, so
    the SUM of device-resident splits respects the budget — three splits
    at 0.4× budget each must not all promote. Per-split checks alone
    would let their sum exceed the budget and OOM at materialization.
    Budget None/0 = unlimited, as in fit_in_budget."""
    out, remaining = [], hbm_budget_bytes
    for a in splits_seq:
        if hbm_budget_bytes and remaining <= 0:
            # exhausted: demote outright (fit_in_budget reads 0 as
            # "unlimited", so it cannot express this state)
            out.append(a if isinstance(a, HostArrays)
                       else to_host_resident(a))
            continue
        fitted = fit_in_budget(a, remaining)
        out.append(fitted)
        if hbm_budget_bytes and isinstance(fitted, Arrays):
            remaining -= split_nbytes(fitted)
    return out


def auto_chunk_batches(budget: int, split, batch_size: int,
                       eval_batch_size: int = 0) -> int:
    """Auto super-chunk size K for streamed splits: each chunk ≤ budget/6
    so the engine's 3-deep transient (computing / dispatched / uploading —
    prefetch_chunks) stays within half the budget, leaving the rest for
    params, optimizer state and activations. Sized for the LARGER of the
    train/eval batch shapes — the engine reuses the same K for val chunks
    of eval_batch_size rows. Returns ≥1 (1 = per-batch streaming floor)."""
    row_bytes = max(1, split_nbytes(split) // max(1, split.n))
    rows = max(batch_size, eval_batch_size or batch_size)
    return max(1, budget // (6 * row_bytes * rows))


def resolve_hbm_budget() -> int:
    """The HBM byte budget for device-resident splits:
    `ECGMM_HBM_BUDGET_BYTES` when set; otherwise 60% of the device's
    reported `bytes_limit` (leaving the rest for params, optimizer
    state and activations); 0 = unlimited when the backend reports no
    limit (CPU meshes and the relayed TPU backend report none — there
    the env var is the only control)."""
    import os

    env = os.environ.get("ECGMM_HBM_BUDGET_BYTES")
    if env:
        return int(env)
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0) or 0)
    except Exception:
        limit = 0
    return int(limit * 0.6) if limit else 0


# ---------------------------------------------------------------------------
# Disk-backed split cache: memmap streaming for over-RAM datasets.
# ---------------------------------------------------------------------------
# The reference re-runs PIL decode + scipy filtfilt per sample, per
# epoch, in DataLoader workers (/root/reference/dataset.py:53-74); here
# materialization already runs once — and with the cache it runs once
# EVER: `save_materialized` persists the packed splits + fitted scalers,
# and `load_materialized` reopens them memory-mapped, so (a) the
# CPU-pinned scipy-parity preprocessing is amortized across runs, and
# (b) datasets larger than host RAM train straight from disk through
# the streaming engine path (the per-chunk row gather only touches the
# pages it reads).

_SPLIT_FIELDS = ("images", "signals", "clinical", "labels", "indices")


def has_materialized(cache_dir: str) -> bool:
    import os

    return os.path.exists(os.path.join(cache_dir, "scalers.npz")) and \
        os.path.exists(os.path.join(cache_dir, "train", "labels.npy"))


def save_materialized(data: MaterializedData, cache_dir: str,
                      meta: Optional[dict] = None) -> None:
    """Persist all three splits (one .npy per modality) + the fitted
    scalers. Fields that are None for the task (e.g. images in
    signal-only presets) are simply absent on disk.

    meta: optional JSON-serializable fingerprint of the run configuration
    that produced the cache (preset, data source, seed, shapes…) —
    `load_materialized(expect_meta=…)` refuses to reopen a cache whose
    fingerprint differs, so a stale cache can't silently feed the wrong
    cohort/preprocessing into a later run."""
    import json
    import os

    for split in ("train", "val", "test"):
        d = os.path.join(cache_dir, split)
        os.makedirs(d, exist_ok=True)
        arrs = getattr(data, split)
        for f in _SPLIT_FIELDS:
            a = getattr(arrs, f)
            if a is not None:
                np.save(os.path.join(d, f + ".npy"), np.asarray(a))
    sc = {}
    for name, s in (("ecg", data.ecg_scaler),
                    ("clinical", data.clinical_scaler)):
        if s is not None:
            sc[name + "_mean"] = np.asarray(s.mean)
            sc[name + "_scale"] = np.asarray(s.scale)
    np.savez(os.path.join(cache_dir, "scalers.npz"), **sc)
    if meta is not None:
        with open(os.path.join(cache_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)


def _load_split(d: str, mmap: bool):
    import os

    def rd(f):
        pth = os.path.join(d, f + ".npy")
        if not os.path.exists(pth):
            return None
        return np.load(pth, mmap_mode="r" if mmap else None)

    return HostArrays(
        images=rd("images"), signals=rd("signals"),
        clinical=rd("clinical"), labels=rd("labels"),
        indices=np.asarray(rd("indices")),
    )


def _promote(host: HostArrays) -> Arrays:
    """HostArrays → device-resident Arrays (one upload per modality)."""

    def up(a):
        return None if a is None else jnp.asarray(np.asarray(a))

    return Arrays(
        images=up(host.images), signals=up(host.signals),
        clinical=up(host.clinical), labels=up(host.labels),
        indices=np.asarray(host.indices),
    )


def load_materialized(
    cache_dir: str, hbm_budget_bytes: Optional[int] = None,
    expect_meta: Optional[dict] = None,
) -> MaterializedData:
    """Reopen a `save_materialized` cache. Splits that exceed the budget
    stay memory-mapped HostArrays and stream (never copied into RAM,
    never into HBM) — including the test split, whose protocol streams
    via engine.evaluate_streamed when over budget; in-budget splits are
    promoted to device-resident Arrays, exactly as a fresh
    materialization would produce.

    expect_meta: the requesting run's configuration fingerprint; when the
    cache carries a meta.json (written by save_materialized) the two are
    compared key-by-key and a mismatch raises instead of silently
    training on a stale cohort. Caches without meta.json load
    unvalidated."""
    import json
    import os

    if expect_meta is not None:
        mpth = os.path.join(cache_dir, "meta.json")
        if os.path.exists(mpth):
            with open(mpth) as f:
                saved = json.load(f)
            diff = {
                k: (saved.get(k), v) for k, v in expect_meta.items()
                if saved.get(k) != v
            }
            if diff:
                raise ValueError(
                    f"split cache at {cache_dir} was built for a "
                    "different run configuration: " + "; ".join(
                        f"{k}: cached={c!r} requested={r!r}"
                        for k, (c, r) in sorted(diff.items())
                    ) + " — point --split-cache at a fresh directory or "
                    "delete the stale cache"
                )

    budget = hbm_budget_bytes if hbm_budget_bytes is not None \
        else resolve_hbm_budget()

    def split(name):
        host = _load_split(os.path.join(cache_dir, name), mmap=True)
        if not budget or split_nbytes(host) <= budget:
            return _promote(host)
        return host

    z = np.load(os.path.join(cache_dir, "scalers.npz"))

    def scaler(name):
        if name + "_mean" not in z:
            return None
        return preprocess.Scaler(
            mean=z[name + "_mean"], scale=z[name + "_scale"]
        )

    return MaterializedData(
        train=split("train"),
        val=split("val"),
        test=split("test"),
        ecg_scaler=scaler("ecg"),
        clinical_scaler=scaler("clinical"),
    )


def _row_uploader(sharding, timers: Optional[dict] = None):
    """Shared host-gather → dtype-cast → async device_put for the
    streaming paths. Returns put(array, rows, dtype) so prefetch_batches
    and prefetch_chunks apply identical conversions — the tested
    bit-parity between the streaming modes depends on that.

    timers: optional dict accumulating host seconds spent in the numpy
    fancy-gather+cast ('gather_s') vs the device_put call ('put_s' —
    normally the async enqueue, but it blocks when the transfer queue is
    full, so a large put_s means uploads are the bottleneck). Feeds the
    streamed-epoch host profile (BASELINE.md 'streamed path')."""

    def put(a, rows, dtype=None):
        if a is None:
            return None
        t0 = time.perf_counter() if timers is not None else 0.0
        out = np.asarray(a[rows])
        if dtype is not None:
            out = out.astype(dtype, copy=False)
        t1 = time.perf_counter() if timers is not None else 0.0
        # device_put straight from host numpy: with a sharding this
        # splits across devices in ONE host→device transfer; staging
        # through jnp.asarray first would materialize an unsharded copy
        # on device 0 and double the transferred bytes (plus an extra
        # chunk-sized transient the HBM-budget accounting ignores).
        ret = jax.device_put(out, sharding) if sharding is not None \
            else jnp.asarray(out)
        if timers is not None:
            t2 = time.perf_counter()
            timers["gather_s"] = timers.get("gather_s", 0.0) + (t1 - t0)
            timers["put_s"] = timers.get("put_s", 0.0) + (t2 - t1)
        return ret

    return put


def prefetch_batches(
    arrays: HostArrays,
    batch_size: int,
    *,
    shuffle: bool,
    seed: int,
    epoch: int = 0,
    mesh=None,
    sample_weights: Optional[np.ndarray] = None,
    prefetch: int = 2,
) -> Iterator[Batch]:
    """Double-buffered host→device feeding: slice batches from host numpy,
    device_put them ahead of consumption (JAX transfers are async — the
    copy of batch i+k overlaps the compute of batch i), keep `prefetch`
    batches in flight. The sample ORDER is epoch_order — the same real
    rows in the same sequence as iterate_batches/epoch_indices. Tail-
    batch PADDING deliberately differs (here: pad to batch_size with the
    last row; resident plans: pad to the data-axis multiple with row 0 —
    PARITY.md "BatchNorm vs batch padding"), so bit-parity tests use
    divisible sizes."""
    import collections

    n = arrays.n
    order = epoch_order(
        n, shuffle=shuffle, seed=seed, epoch=epoch,
        sample_weights=sample_weights,
    )
    sharding = batch_sharding(mesh) if mesh is not None else None

    put = _row_uploader(sharding)

    def make(start: int) -> Batch:
        idx = order[start:start + batch_size]
        idx, mask = _pad_indices(idx, batch_size)  # static batch shape
        return Batch(
            images=put(arrays.images, idx),
            signals=put(arrays.signals, idx, np.float32),
            clinical=put(arrays.clinical, idx, np.float32),
            labels=put(arrays.labels, idx, np.int32),
            mask=(
                jax.device_put(jnp.asarray(mask), sharding)
                if sharding is not None else jnp.asarray(mask)
            ),
        )

    starts = list(range(0, n, batch_size))
    queue: "collections.deque[Batch]" = collections.deque()
    for s in starts[:prefetch]:
        queue.append(make(s))
    for i, _ in enumerate(starts):
        nxt = i + prefetch
        if nxt < len(starts):
            queue.append(make(starts[nxt]))
        yield queue.popleft()


def prefetch_chunks(
    arrays: HostArrays,
    idx_mat: np.ndarray,
    mask_mat: np.ndarray,
    chunk_batches: int,
    mesh=None,
    stats: Optional[dict] = None,
):
    """Super-chunked streaming: stage `chunk_batches` planned batches per
    host→device transfer and yield (chunk Arrays, per-chunk idx matrix,
    per-chunk device mask matrix, per-chunk HOST mask matrix) — the
    engine runs each chunk through ONE scan-epoch dispatch instead of
    `chunk_batches` per-batch dispatches (each of which costs a full
    relay round trip on relayed backends). The host mask copy lets
    consumers filter readbacks without fetching the device mask (one
    avoided relay round trip per chunk).

    (idx_mat, mask_mat) is the epoch plan from engine.epoch_indices, so
    chunked, per-batch-streamed and device-resident training all see the
    same batches in the same order. The chunk's device arrays contain
    exactly its planned rows (host fancy-gather); the yielded index
    matrix addresses rows WITHIN the chunk. At most two chunk shapes
    compile: the full K-batch chunk and one shorter tail.

    Chunks are STAGED ON A BACKGROUND THREAD: the host fancy-gather +
    device_put of chunk i+1 runs while the dispatch thread computes
    chunk i (numpy indexing and JAX transfers release the GIL, so the
    overlap is real). The queue is bounded at one staged chunk, so at
    most THREE chunks coexist on device (computing / staged / being
    built) — the same 3-deep transient as before, which run.py's auto-K
    sizes to stay within half the HBM budget; the engine additionally
    syncs on the previous chunk's metrics.

    stats: optional dict accumulating the host profile — 'gather_s'
    (numpy fancy-gather + cast), 'put_s' (device_put enqueue; blocks
    only when transfers are the bottleneck), 'chunks'. Both timers run
    on the producer thread, so they measure staging COST, not critical-
    path stall (the point of the thread is that this cost overlaps
    compute)."""
    import queue as _q
    import threading as _t

    from ecgmm_tpu.parallel import batch_sharding

    sharding = batch_sharding(mesh) if mesh is not None else None
    n_batches = idx_mat.shape[0]
    put = _row_uploader(sharding, timers=stats)

    def make(c0: int):
        c1 = min(c0 + chunk_batches, n_batches)
        flat = idx_mat[c0:c1].reshape(-1)
        k = c1 - c0
        local_idx = np.arange(k * idx_mat.shape[1], dtype=np.int32)
        chunk = Arrays(
            images=put(arrays.images, flat),
            signals=put(arrays.signals, flat, np.float32),
            clinical=put(arrays.clinical, flat, np.float32),
            labels=put(arrays.labels, flat, np.int32),
            # host-only bookkeeping; the engine strips it before jit
            indices=np.asarray(arrays.indices)[
                flat[np.asarray(mask_mat[c0:c1]).reshape(-1) > 0]
            ],
        )
        # The per-chunk plan (in-chunk gather indices + batch masks) is
        # small planning data; jit/GSPMD replicates it at the program
        # boundary — no explicit sharding needed.
        idx_dev = jnp.asarray(local_idx.reshape(k, idx_mat.shape[1]))
        mask_host = np.asarray(mask_mat[c0:c1], np.float32)
        mask_dev = jnp.asarray(mask_host)
        if stats is not None:
            stats["chunks"] = stats.get("chunks", 0) + 1
        return chunk, idx_dev, mask_dev, mask_host

    starts = list(range(0, n_batches, chunk_batches))
    q: "_q.Queue" = _q.Queue(maxsize=1)
    stop = _t.Event()

    def send(item) -> bool:
        """stop-aware bounded put; False once the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except _q.Full:
                continue
        return False

    def producer():
        try:
            for s in starts:
                if not send(("chunk", make(s))):
                    return
            send(("done", None))
        except BaseException as e:  # surfaced on the consumer thread
            send(("error", e))

    worker = _t.Thread(target=producer, daemon=True,
                       name="ecgmm-chunk-stager")
    worker.start()
    try:
        while True:
            kind, item = q.get()
            if kind == "done":
                break
            if kind == "error":
                raise item
            yield item
    finally:
        # consumer abandoned the generator (exception / early break):
        # unblock and retire the stager so it can't pin chunk buffers
        stop.set()
        while True:          # drain anything it managed to enqueue
            try:
                q.get_nowait()
            except _q.Empty:
                break
        worker.join(timeout=5.0)
