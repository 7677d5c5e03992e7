"""Training-engine tests: end-to-end smoke training on the 8-device CPU
mesh, loss-decrease, freeze semantics, plateau LR decay, early stop,
checkpoint save/restore round trip."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecgmm_tpu.config import Config, ModelConfig, TrainConfig
from ecgmm_tpu.data import pipeline, synthetic
from ecgmm_tpu.models import ECGMultimodalModel, ResNet1DSE
from ecgmm_tpu.train import engine, optim as optim_lib
from ecgmm_tpu.train.checkpoint import CheckpointManager
from ecgmm_tpu.train.state import (
    create_state,
    encoder_freeze_predicate,
)
from ecgmm_tpu.utils.tree import flatten_path_dict
from ecgmm_tpu.workloads import make_fusion_task, make_signal_task


@pytest.fixture(scope="module")
def small_data():
    cohort = synthetic.make_cohort(n=64, signal_len=512, img_hw=(32, 64))
    return pipeline.materialize_trimodal(cohort, Config())


def _signal_setup(cfg: TrainConfig, steps_per_epoch=8):
    model = ResNet1DSE(num_classes=2, base_filters=8)
    tx = optim_lib.make_optimizer(cfg, steps_per_epoch)
    variables = model.init(
        jax.random.PRNGKey(cfg.seed), jnp.ones((1, 512, 1))
    )
    state = create_state(variables, tx, jax.random.PRNGKey(cfg.seed))
    return model, tx, state


@pytest.mark.slow
def test_signal_training_loss_decreases(small_data, mesh8):
    cfg = TrainConfig(
        batch_size=16, num_epochs=3, lr=3e-3, loss="focal",
        schedule="constant", patience=10,
    )
    model, tx, state = _signal_setup(cfg)
    task = make_signal_task(model, cfg)
    result = engine.fit(
        task, state, tx, small_data.train, small_data.val, cfg,
        mesh=mesh8, verbose=False,
    )
    assert result.history[-1]["Loss/Train"] < result.history[0]["Loss/Train"]
    # eval runs and produces gathered logits
    ev = engine.evaluate(
        engine.make_eval_step(task), result.state, small_data.test,
        cfg.eval_bs, mesh8,
    )
    assert ev.logits.shape == (small_data.test.n, 2)


@pytest.mark.slow
def test_fusion_training_freeze_semantics(small_data, mesh8):
    cfg = TrainConfig(batch_size=16, num_epochs=1, lr=1e-3, patience=10)
    mcfg = ModelConfig(dtype="float32")
    model = ECGMultimodalModel(cfg=mcfg)
    tx = optim_lib.make_optimizer(cfg)
    b = small_data.train
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1,) + b.images.shape[1:], jnp.float32),
        jnp.ones((1, b.signals.shape[1])),
        jnp.ones((1, 2)),
    )
    state = create_state(
        variables, tx, jax.random.PRNGKey(0),
        freeze_predicate=encoder_freeze_predicate,
    )
    # encoders are in the frozen partition
    frozen_keys = set(flatten_path_dict(state.frozen))
    assert any(k.startswith("image_encoder") for k in frozen_keys)
    assert not any(k.startswith("attention_fusion") for k in frozen_keys)

    frozen_before = jax.tree_util.tree_map(np.asarray, state.frozen)
    task = make_fusion_task(model, cfg)
    result = engine.fit(
        task, state, tx, small_data.train, small_data.val, cfg,
        mesh=mesh8, verbose=False,
    )
    # frozen params unchanged bit-for-bit
    fb = flatten_path_dict(frozen_before)
    fa = flatten_path_dict(
        jax.tree_util.tree_map(np.asarray, result.state.frozen)
    )
    for k in fb:
        np.testing.assert_array_equal(fb[k], fa[k])
    # attention weights were logged
    assert "AttentionWeights/Image_w" in result.history[0]


class _ValSequenceTask:
    """Wraps a task to force a fixed validation-loss sequence, driving the
    plateau/early-stop control paths deterministically."""


@pytest.mark.slow
def test_plateau_and_early_stop(small_data, monkeypatch, mesh8):
    cfg = TrainConfig(
        batch_size=32, num_epochs=12, lr=1e-3, schedule="constant",
        patience=5, plateau_patience=2,
    )
    model, tx, state = _signal_setup(cfg)
    task = make_signal_task(model, cfg)

    # Force a non-improving validation loss after epoch 0 by stubbing the
    # jitted eval-epoch factory.
    import jax.numpy as jnp

    seq = iter([1.0] + [2.0] * 20)

    def fake_make_eval_epoch(task_, arrays, mesh=None):
        def epoch_fn(st, idx, mask):
            loss = next(seq)
            return (
                jnp.full((idx.shape[0],), loss),
                jnp.zeros(tuple(idx.shape) + (2,), jnp.float32),
                jnp.zeros(tuple(idx.shape), jnp.int32),
                {},
            )

        return epoch_fn

    monkeypatch.setattr(engine, "make_eval_epoch", fake_make_eval_epoch)
    result = engine.fit(
        task, state, tx, small_data.train, small_data.val, cfg,
        mesh=mesh8, verbose=False,
    )
    # early stop after patience=5 stale epochs → 6 epochs total
    assert result.stopped_early
    assert len(result.history) == 6
    # LR decayed twice (epochs 2 and 4 stale pairs): 1e-3 → 1e-5
    lr = optim_lib.get_lr(result.state.opt_state)
    assert lr == pytest.approx(1e-5, rel=1e-3)
    assert result.best_epoch == 0


@pytest.mark.slow
def test_patience_zero_disables_early_stop_and_plateau(
        small_data, monkeypatch, mesh8):
    """patience=0 / plateau_patience=0 must disable early stopping and
    plateau LR decay — the semantics of the reference trainers that ship
    with early stopping commented out and no plateau block
    (train_signal_only.py:301-304, train_physionet2.py:226-229)."""
    cfg = TrainConfig(
        batch_size=32, num_epochs=8, lr=1e-3, schedule="constant",
        patience=0, plateau_patience=0,
    )
    model, tx, state = _signal_setup(cfg)
    task = make_signal_task(model, cfg)

    seq = iter([1.0] + [2.0] * 20)

    def fake_make_eval_epoch(task_, arrays, mesh=None):
        def epoch_fn(st, idx, mask):
            loss = next(seq)
            return (
                jnp.full((idx.shape[0],), loss),
                jnp.zeros(tuple(idx.shape) + (2,), jnp.float32),
                jnp.zeros(tuple(idx.shape), jnp.int32),
                {},
            )

        return epoch_fn

    monkeypatch.setattr(engine, "make_eval_epoch", fake_make_eval_epoch)
    result = engine.fit(
        task, state, tx, small_data.train, small_data.val, cfg,
        mesh=mesh8, verbose=False,
    )
    # never stops early: all 8 epochs run despite 7 stale ones
    assert not result.stopped_early
    assert len(result.history) == 8
    # LR never plateau-decayed
    lr = optim_lib.get_lr(result.state.opt_state)
    assert lr == pytest.approx(1e-3, rel=1e-6)
    assert result.best_epoch == 0


@pytest.mark.slow
def test_checkpoint_roundtrip(small_data, tmp_path, mesh8):
    cfg = TrainConfig(batch_size=16, num_epochs=2, lr=1e-3, patience=10)
    model, tx, state = _signal_setup(cfg)
    task = make_signal_task(model, cfg)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    result = engine.fit(
        task, state, tx, small_data.train, small_data.val, cfg,
        mesh=mesh8, ckpt=ckpt, verbose=False,
    )
    assert ckpt.exists("last") and ckpt.exists("best")

    # restore into a fresh state skeleton
    _, tx2, fresh = _signal_setup(cfg)
    restored = ckpt.restore("last", fresh)
    np.testing.assert_array_equal(
        np.asarray(restored.step), np.asarray(result.state.step)
    )
    a = flatten_path_dict(
        jax.tree_util.tree_map(np.asarray, restored.trainable)
    )
    b = flatten_path_dict(
        jax.tree_util.tree_map(np.asarray, result.state.trainable)
    )
    for k in b:
        np.testing.assert_array_equal(a[k], b[k])
    # resume continues from the stored epoch without redoing epochs
    assert int(restored.epoch) == 2


@pytest.mark.slow
def test_onecycle_schedule_runs(small_data, mesh8):
    cfg = TrainConfig(
        batch_size=16, num_epochs=2, loss="focal", schedule="onecycle",
        onecycle_peak_lr=1e-3, patience=10,
    )
    n_steps = pipeline.num_batches(small_data.train.n, cfg.batch_size)
    model, tx, state = _signal_setup(cfg, steps_per_epoch=n_steps)
    task = make_signal_task(model, cfg)
    result = engine.fit(
        task, state, tx, small_data.train, small_data.val, cfg,
        mesh=mesh8, verbose=False,
    )
    assert len(result.history) == 2
    assert np.isfinite(result.history[-1]["Loss/Train"])


def test_onecycle_schedule_matches_torch_onecyclelr():
    """The optim.py claim that optax.cosine_onecycle_schedule defaults
    equal torch OneCycleLR defaults (cos anneal, pct_start .3, div 25,
    final_div 1e4 — the scheduler the reference signal trainers use,
    train_signal_only.py:236-238) must hold numerically: same start LR,
    same peak, ≤1% relative deviation at every step."""
    torch = pytest.importorskip("torch")
    import optax

    S, E = 13, 30  # deliberately non-round steps/epoch
    total = S * E
    m = torch.nn.Linear(1, 1)
    opt = torch.optim.Adam(m.parameters(), lr=1e-3)
    sch = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=1e-3, steps_per_epoch=S, epochs=E
    )
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sch.step()
    torch_lrs = np.asarray(torch_lrs)

    sched = optax.cosine_onecycle_schedule(
        transition_steps=total, peak_value=1e-3
    )
    ours = np.asarray([float(sched(i)) for i in range(total)])

    assert ours[0] == pytest.approx(torch_lrs[0], rel=1e-3)  # peak/25
    assert ours.max() == pytest.approx(1e-3, rel=1e-3)
    np.testing.assert_allclose(ours, torch_lrs, rtol=0, atol=1e-5)


@pytest.mark.slow
def test_last_checkpoint_carries_updated_counters(small_data, tmp_path,
                                                  mesh8):
    """'last' must be written AFTER best_val_loss / early-stop counters are
    updated for the epoch just evaluated — otherwise a crash + --resume
    re-enters the improvement branch with a stale best and can overwrite
    'best' with a worse model (round-1 advisor finding)."""
    cfg = TrainConfig(batch_size=16, num_epochs=3, lr=1e-3, patience=10)
    model, tx, state = _signal_setup(cfg)
    task = make_signal_task(model, cfg)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    result = engine.fit(
        task, state, tx, small_data.train, small_data.val, cfg,
        mesh=mesh8, ckpt=ckpt, verbose=False,
    )
    _, _, fresh = _signal_setup(cfg)
    restored = ckpt.restore("last", fresh)
    best_so_far = min(h["Loss/Val"] for h in result.history)
    assert float(restored.best_val_loss) == pytest.approx(
        best_so_far, rel=1e-6
    )
    assert float(restored.best_val_loss) == pytest.approx(
        float(result.state.best_val_loss), rel=1e-6
    )
    assert int(restored.early_stop_counter) == int(
        result.state.early_stop_counter
    )
    assert int(restored.lr_reduce_counter) == int(
        result.state.lr_reduce_counter
    )


def test_async_checkpoint_saves_overlap(tmp_path, monkeypatch):
    """save() must return without waiting for the disk write (SURVEY §5
    async checkpointing); wait_until_finished() drains and re-raises."""
    import time as _time

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    writes = []

    def slow_write(name, host_state, overwrite=True):
        _time.sleep(0.5)
        writes.append(name)

    monkeypatch.setattr(ckpt, "_write", slow_write)
    state = {"w": jnp.arange(4.0)}
    t0 = _time.perf_counter()
    ckpt.save("last", state)
    enqueue_dt = _time.perf_counter() - t0
    assert enqueue_dt < 0.4, f"async save blocked for {enqueue_dt:.2f}s"
    ckpt.wait_until_finished()
    assert writes == ["last"]
    # block=True is synchronous (the SIGTERM durability path)
    t0 = _time.perf_counter()
    ckpt.save("last", state, block=True)
    assert _time.perf_counter() - t0 >= 0.5
    assert writes == ["last", "last"]

    # writer errors surface on drain, not silently
    def bad_write(name, host_state, overwrite=True):
        raise IOError("disk full")

    monkeypatch.setattr(ckpt, "_write", bad_write)
    ckpt.save("best", state)
    with pytest.raises(IOError):
        ckpt.wait_until_finished()


def test_async_checkpoint_snapshot_is_donation_safe(tmp_path):
    """The device→host snapshot happens inside save(): mutating/replacing
    the live state afterwards must not corrupt the checkpoint."""
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    state = {"w": jnp.arange(4.0)}
    ckpt.save("last", state)
    state["w"] = state["w"] * 0.0  # simulate donation/overwrite
    restored = ckpt.restore("last", {"w": jnp.zeros(4)})
    np.testing.assert_array_equal(
        np.asarray(restored["w"]), np.arange(4.0)
    )
    ckpt.close()


@pytest.mark.slow
def test_weight_decay_keeps_plateau_lr_working(small_data, mesh8):
    """weight_decay wraps the optimizer in optax.chain; get_lr/scale_lr
    must traverse the chain state or plateau decay silently dies
    (round-1 advisor finding)."""
    cfg = TrainConfig(
        batch_size=16, num_epochs=1, lr=1e-3, weight_decay=1e-4,
        schedule="constant", patience=10,
    )
    model, tx, state = _signal_setup(cfg)
    assert optim_lib.get_lr(state.opt_state) == pytest.approx(1e-3)
    scaled = optim_lib.scale_lr(state.opt_state, 0.1)
    assert optim_lib.get_lr(scaled) == pytest.approx(1e-4)
    # and the full fit loop still runs with decay available
    task = make_signal_task(model, cfg)
    result = engine.fit(
        task, state, tx, small_data.train, small_data.val, cfg,
        mesh=mesh8, verbose=False,
    )
    assert "LR" in result.history[0]


def test_scale_lr_through_masked_wrapper():
    """scale_lr must traverse namedtuple wrapper states (optax.masked,
    MultiSteps) symmetrically with get_lr — otherwise fit() believes
    plateau decay applied while the state came back unchanged."""
    import optax

    params = {"a": jnp.zeros(3), "b": jnp.zeros(2)}
    tx = optax.masked(
        optax.inject_hyperparams(optax.adam)(learning_rate=1e-3),
        {"a": True, "b": False},
    )
    state = tx.init(params)
    assert optim_lib.get_lr(state) == pytest.approx(1e-3)
    scaled = optim_lib.scale_lr(state, 0.1)
    assert optim_lib.get_lr(scaled) == pytest.approx(1e-4)
    # the wrapper type survives the rebuild
    assert type(scaled) is type(state)


def _empty_arrays(like: pipeline.Arrays) -> pipeline.Arrays:
    return pipeline.Arrays(
        images=None,
        signals=jnp.zeros((0,) + tuple(np.shape(like.signals)[1:])),
        clinical=None,
        labels=jnp.zeros((0,), jnp.int32),
        indices=np.zeros((0,), np.int64),
    )


@pytest.mark.slow
def test_nan_val_loss_is_not_an_early_stop_signal(small_data, mesh8):
    """An empty (or NaN-loss) val set must not count as stale epochs:
    `nan < best` is False every epoch, and before the fix patience
    no-signal epochs silently early-stopped the run with no 'best'
    checkpoint ever written (round-3 review finding; PARITY.md row)."""
    cfg = TrainConfig(
        batch_size=16, num_epochs=4, lr=1e-3, patience=2,
        plateau_patience=2,
    )
    model, tx, state = _signal_setup(cfg)
    task = make_signal_task(model, cfg)
    result = engine.fit(
        task, state, tx, small_data.train, _empty_arrays(small_data.val),
        cfg, mesh=mesh8, verbose=False,
    )
    assert not result.stopped_early
    assert len(result.history) == 4  # ran the full schedule
    assert int(result.state.early_stop_counter) == 0
    # and the LR was never plateau-decayed on no-signal epochs
    assert optim_lib.get_lr(result.state.opt_state) == pytest.approx(
        cfg.lr
    )


def test_streamed_fit_with_empty_train_split(small_data, mesh8):
    """The per-batch streamed path must handle an n=0 train split with
    zero metrics like the resident/chunked paths do, not crash on
    jnp.stack([]) (round-3 review finding)."""
    cfg = TrainConfig(batch_size=16, num_epochs=1, patience=10)
    model, tx, state = _signal_setup(cfg)
    task = make_signal_task(model, cfg)
    empty_host = pipeline.to_host_resident(_empty_arrays(small_data.val))
    result = engine.fit(
        task, state, tx, empty_host,
        pipeline.to_host_resident(small_data.val), cfg,
        mesh=mesh8, verbose=False,
    )
    assert len(result.history) == 1
    assert result.history[0]["Accuracy/Train"] == 0.0


@pytest.mark.slow
def test_debug_nans_is_restored_after_fit(small_data, mesh8):
    """cfg.debug_nans must be scoped to the fit that asked for it — a
    later run in the same process must not inherit the per-dispatch
    NaN-scan (round-3 review finding)."""
    before = bool(jax.config.jax_debug_nans)
    assert not before
    cfg = TrainConfig(
        batch_size=16, num_epochs=1, patience=10, debug_nans=True
    )
    model, tx, state = _signal_setup(cfg)
    task = make_signal_task(model, cfg)
    engine.fit(
        task, state, tx, small_data.train, small_data.val, cfg,
        mesh=mesh8, verbose=False,
    )
    assert bool(jax.config.jax_debug_nans) == before


@pytest.mark.slow
def test_fit_keep_best_returns_best_state(small_data, mesh8):
    """keep_best=True must hand back the best-val snapshot — the CV
    harnesses score it on the outer test (reference protocol loads
    best_inner.pth, train_kfold.py:117-133); the final state is patience
    epochs past best on every early stop."""
    cfg = TrainConfig(
        batch_size=16, num_epochs=6, lr=5e-2, patience=1,
        plateau_patience=0, donate_state=True,
    )
    model, tx, state = _signal_setup(cfg)
    task = make_signal_task(model, cfg)
    result = engine.fit(
        task, state, tx, small_data.train, small_data.val, cfg,
        mesh=mesh8, verbose=False, keep_best=True,
    )
    assert result.best_state is not None
    best_val = float(result.best_state.best_val_loss)
    hist_min = min(h["Loss/Val"] for h in result.history)
    assert best_val == pytest.approx(hist_min, rel=1e-6)
    # the snapshot is host-resident (donation-safe) and usable for eval
    ev = engine.evaluate(
        engine.make_eval_step(task), result.best_state, small_data.test,
        cfg.eval_bs, mesh8,
    )
    assert np.isfinite(ev.loss)


def test_checkpoint_epoch_retention_survives_resume(small_data, tmp_path):
    """A resumed run's manager must keep pruning epochN dirs written by
    its predecessor (round-3 review finding: the retention window
    started empty per process)."""
    import os

    cfg = TrainConfig(batch_size=16, num_epochs=1, patience=10)
    model, tx, state = _signal_setup(cfg)
    m1 = CheckpointManager(str(tmp_path), keep_epochs=2)
    for e in (1, 2, 3):
        m1.save_epoch(e, state)
    m1.close()
    assert sorted(
        d for d in os.listdir(tmp_path) if d.startswith("epoch")
    ) == ["epoch2", "epoch3"]

    m2 = CheckpointManager(str(tmp_path), keep_epochs=2)  # "resume"
    m2.save_epoch(4, state)
    m2.close()
    assert sorted(
        d for d in os.listdir(tmp_path) if d.startswith("epoch")
    ) == ["epoch3", "epoch4"]


def test_cleanup_survives_exception_in_fit(small_data, mesh8):
    """debug_nans scope and the SIGTERM handler must be restored even
    when the epoch loop dies (round-3 review finding: the cleanup was
    not in a finally, so a FloatingPointError from the very trap
    debug_nans arms would leak a globally-True jax_debug_nans into
    every later fit in the process, and leave a dead SIGTERM handler
    installed)."""
    import signal as _signal

    before_nans = bool(jax.config.jax_debug_nans)
    before_handler = _signal.getsignal(_signal.SIGTERM)
    cfg = TrainConfig(
        batch_size=16, num_epochs=2, patience=10, debug_nans=True
    )
    model, tx, state = _signal_setup(cfg)
    base_task = make_signal_task(model, cfg)

    def exploding_loss(outputs, batch):
        raise RuntimeError("boom mid-epoch")

    task = dataclasses.replace(base_task, loss=exploding_loss)
    with pytest.raises(RuntimeError, match="boom"):
        engine.fit(
            task, state, tx, small_data.train, small_data.val, cfg,
            mesh=mesh8, verbose=False,
        )
    assert bool(jax.config.jax_debug_nans) == before_nans
    assert _signal.getsignal(_signal.SIGTERM) is before_handler


def test_eval_tail_batch_is_padded_to_full_batch(small_data, mesh8):
    """iterate_batches must pad the ragged tail to the FULL batch size
    (one static shape ⇒ one compile of any jitted consumer — a second
    trace costs 30-250 s on the relayed TPU; round-3 review finding)."""
    batches = list(pipeline.iterate_batches(
        small_data.test, 24, shuffle=False, seed=0, mesh=mesh8
    ))
    shapes = {b.labels.shape[0] for b in batches}
    assert shapes == {24}, shapes
    assert sum(int(b.mask.sum()) for b in batches) == small_data.test.n
