"""Streaming input pipeline: datasets over the HBM budget stay in host RAM
(pipeline.HostArrays) and train through the double-buffered prefetch path
(pipeline.prefetch_batches + per-batch jitted step in engine.fit), with the
SAME epoch plan as the device-resident scan path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from ecgmm_tpu.config import Config, TrainConfig
from ecgmm_tpu.data import pipeline, synthetic
from ecgmm_tpu.models import ResNet1DSE
from ecgmm_tpu.train import engine
from ecgmm_tpu.train.state import create_state
from ecgmm_tpu.utils.tree import flatten_path_dict
from ecgmm_tpu.workloads import make_signal_task


def _trim(arrays: pipeline.Arrays, k: int) -> pipeline.Arrays:
    """First k rows — used to make split sizes batch-divisible, so the
    resident and streamed paths see zero pad rows (their pad-row
    conventions deliberately differ: epoch_indices pads with index 0,
    prefetch_batches with the last index; both mask-aware)."""
    return pipeline.Arrays(
        images=None if arrays.images is None else arrays.images[:k],
        signals=None if arrays.signals is None else arrays.signals[:k],
        clinical=None if arrays.clinical is None else arrays.clinical[:k],
        labels=arrays.labels[:k],
        indices=arrays.indices[:k],
    )


@pytest.fixture(scope="module")
def data64():
    cohort = synthetic.make_cohort(n=80, signal_len=256, img_hw=(16, 32))
    d = pipeline.materialize_trimodal(cohort, Config())
    return pipeline.MaterializedData(
        train=_trim(d.train, 48),
        val=_trim(d.val, 8),
        test=_trim(d.test, 8),
        ecg_scaler=d.ecg_scaler,
        clinical_scaler=d.clinical_scaler,
    )


def test_fit_in_budget_demotes_only_over_budget(data64):
    big = pipeline.split_nbytes(data64.train)
    assert isinstance(
        pipeline.fit_in_budget(data64.train, big + 1), pipeline.Arrays
    )
    assert isinstance(
        pipeline.fit_in_budget(data64.train, big - 1), pipeline.HostArrays
    )
    assert isinstance(
        pipeline.fit_in_budget(data64.train, None), pipeline.Arrays
    )


def test_fit_splits_in_budget_is_cumulative(data64):
    """Three splits each under the budget individually must NOT all
    promote when their SUM exceeds it — the budget bounds total
    device-resident bytes, and an over-sum upload is exactly the OOM
    the check exists to prevent. Train (first) wins; later splits
    demote once the remainder can't hold them."""
    tr_b = pipeline.split_nbytes(data64.train)
    va_b = pipeline.split_nbytes(data64.val)
    budget = tr_b + va_b // 2  # train fits; val/test don't after it
    tr, va, te = pipeline.fit_splits_in_budget(
        (data64.train, data64.val, data64.test), budget
    )
    assert isinstance(tr, pipeline.Arrays)
    assert isinstance(va, pipeline.HostArrays)
    assert isinstance(te, pipeline.HostArrays)
    # unlimited still promotes everything
    tr, va, te = pipeline.fit_splits_in_budget(
        (data64.train, data64.val, data64.test), None
    )
    assert all(isinstance(s, pipeline.Arrays) for s in (tr, va, te))
    # generous budget promotes everything too
    total = sum(pipeline.split_nbytes(s)
                for s in (data64.train, data64.val, data64.test))
    tr, va, te = pipeline.fit_splits_in_budget(
        (data64.train, data64.val, data64.test), total
    )
    assert all(isinstance(s, pipeline.Arrays) for s in (tr, va, te))


def test_prefetch_matches_resident_batches(data64, mesh8):
    host = pipeline.to_host_resident(data64.train)
    resident = list(pipeline.iterate_batches(
        data64.train, 16, shuffle=False, seed=0, mesh=mesh8
    ))
    streamed = list(pipeline.prefetch_batches(
        host, 16, shuffle=False, seed=0, mesh=mesh8
    ))
    assert len(resident) == len(streamed)
    for r, s in zip(resident, streamed):
        np.testing.assert_array_equal(
            np.asarray(r.signals), np.asarray(s.signals)
        )
        np.testing.assert_array_equal(
            np.asarray(r.labels), np.asarray(s.labels)
        )
        np.testing.assert_array_equal(
            np.asarray(r.mask), np.asarray(s.mask)
        )


def test_streamed_fit_equals_resident_fit(data64, mesh8):
    """n divisible by batch size ⇒ identical batch plan ⇒ the streamed
    per-batch path and the resident scan path produce the same params
    (SGD, so fp reordering noise isn't Adam-amplified)."""
    cfg = TrainConfig(
        batch_size=16, num_epochs=2, lr=1e-2, patience=10,
        donate_state=False,
    )
    model = ResNet1DSE(num_classes=2, base_filters=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 256, 1)))
    tx = optax.sgd(0.05)
    task = make_signal_task(model, cfg)

    def fresh():
        return create_state(variables, tx, jax.random.PRNGKey(0))

    res_resident = engine.fit(
        task, fresh(), tx, data64.train, data64.val, cfg,
        mesh=mesh8, verbose=False,
    )
    host_train = pipeline.to_host_resident(data64.train)
    host_val = pipeline.to_host_resident(data64.val)
    res_streamed = engine.fit(
        task, fresh(), tx, host_train, host_val, cfg,
        mesh=mesh8, verbose=False,
    )
    a = flatten_path_dict(jax.tree_util.tree_map(
        np.asarray, res_resident.state.trainable
    ))
    b = flatten_path_dict(jax.tree_util.tree_map(
        np.asarray, res_streamed.state.trainable
    ))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=2e-5, err_msg=k)
    for h_r, h_s in zip(res_resident.history, res_streamed.history):
        np.testing.assert_allclose(
            h_r["Loss/Train"], h_s["Loss/Train"], rtol=1e-4
        )
        np.testing.assert_allclose(
            h_r["Loss/Val"], h_s["Loss/Val"], rtol=1e-4
        )


def test_chunked_streaming_equals_resident_fit(data64, mesh8):
    """Super-chunked streaming (stream_chunk_batches > 1) runs the SAME
    epoch plan through the SAME scan program as the resident path — with
    a non-divisible chunk count (3 batches/epoch, chunks of 2 → one tail
    chunk), params and losses must match the resident fit bit-tight."""
    cfg = TrainConfig(
        batch_size=16, num_epochs=2, lr=1e-2, patience=10,
        donate_state=False, stream_chunk_batches=2,
    )
    model = ResNet1DSE(num_classes=2, base_filters=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 256, 1)))
    tx = optax.sgd(0.05)
    task = make_signal_task(model, cfg)

    def fresh():
        return create_state(variables, tx, jax.random.PRNGKey(0))

    res_resident = engine.fit(
        task, fresh(), tx, data64.train, data64.val,
        TrainConfig(batch_size=16, num_epochs=2, lr=1e-2, patience=10,
                    donate_state=False),
        mesh=mesh8, verbose=False,
    )
    res_chunked = engine.fit(
        task, fresh(), tx,
        pipeline.to_host_resident(data64.train),
        pipeline.to_host_resident(data64.val),
        cfg, mesh=mesh8, verbose=False,
    )
    a = flatten_path_dict(jax.tree_util.tree_map(
        np.asarray, res_resident.state.trainable
    ))
    b = flatten_path_dict(jax.tree_util.tree_map(
        np.asarray, res_chunked.state.trainable
    ))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=2e-5, err_msg=k)
    for h_r, h_s in zip(res_resident.history, res_chunked.history):
        np.testing.assert_allclose(
            h_r["Loss/Train"], h_s["Loss/Train"], rtol=1e-4
        )
        np.testing.assert_allclose(
            h_r["Loss/Val"], h_s["Loss/Val"], rtol=1e-4
        )


def test_prefetch_chunks_plan_and_shapes(data64):
    """Chunk contents must equal the epoch plan's rows, with in-chunk
    indices and the tail chunk sized to the remaining batches."""
    host = pipeline.to_host_resident(data64.train)
    idx, mask = engine.epoch_indices(
        host.n, 16, shuffle=True, seed=7, epoch=0
    )
    chunks = list(pipeline.prefetch_chunks(host, idx, mask, 2))
    assert [c[1].shape[0] for c in chunks] == [2, 1]  # 3 batches → 2+1
    data_c, idx_c, mask_c, mask_h = chunks[0]
    np.testing.assert_array_equal(np.asarray(mask_c), mask[:2])
    np.testing.assert_array_equal(mask_h, mask[:2])  # host copy matches
    # row i of the chunk == planned global row
    flat = idx[:2].reshape(-1)
    np.testing.assert_array_equal(
        np.asarray(data_c.signals), np.asarray(host.signals[flat])
    )
    np.testing.assert_array_equal(
        np.asarray(idx_c), np.arange(32).reshape(2, 16)
    )


def test_over_budget_training_runs_end_to_end(mesh8, tmp_path):
    """The VERDICT done-criterion: arrays exceed the (tiny) budget and
    training still runs — streamed train+val, checkpoints, finite loss."""
    from ecgmm_tpu.train.checkpoint import CheckpointManager

    cohort = synthetic.make_cohort(n=48, signal_len=256, img_hw=(16, 32))
    data = pipeline.materialize_trimodal(cohort, Config())
    train = pipeline.fit_in_budget(data.train, 1)   # 1 byte: force stream
    val = pipeline.fit_in_budget(data.val, 1)
    assert isinstance(train, pipeline.HostArrays)

    cfg = TrainConfig(batch_size=16, num_epochs=2, lr=1e-3, patience=10)
    model = ResNet1DSE(num_classes=2, base_filters=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 256, 1)))
    from ecgmm_tpu.train import optim as optim_lib

    tx = optim_lib.make_optimizer(cfg)
    state = create_state(variables, tx, jax.random.PRNGKey(0))
    task = make_signal_task(model, cfg)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    result = engine.fit(
        task, state, tx, train, val, cfg, mesh=mesh8, ckpt=ckpt,
        verbose=False,
    )
    assert len(result.history) == 2
    assert np.isfinite(result.history[-1]["Loss/Train"])
    assert np.isfinite(result.history[-1]["Loss/Val"])
    assert ckpt.exists("last") and ckpt.exists("best")


def test_auto_chunk_batches_sizes_for_eval_batches(data64):
    """Auto-K must bound the 3-deep chunk transient for BOTH loops: with
    eval_batch_size > batch_size the val chunks are the larger shape, so
    K shrinks accordingly (the round-3 review finding)."""
    host = pipeline.to_host_resident(data64.train)
    row = pipeline.split_nbytes(host) // host.n
    budget = row * 16 * 6 * 4  # fits K=4 chunks of 16-row batches

    assert pipeline.auto_chunk_batches(budget, host, 16) == 4
    # 4× larger eval batches → 4× smaller K
    assert pipeline.auto_chunk_batches(budget, host, 16, 64) == 1
    # eval_batch_size=0 means "same as batch_size"
    assert pipeline.auto_chunk_batches(budget, host, 16, 0) == 4
    # floor at 1 (per-batch streaming), never 0
    assert pipeline.auto_chunk_batches(1, host, 16, 64) == 1


def test_evaluate_streamed_equals_scan(data64, mesh8):
    """The streamed test protocol (engine.evaluate_streamed, both the
    per-batch and chunked flavors) must reproduce the resident
    one-dispatch evaluate_scan bit-for-bit on a divisible split — an
    over-HBM test split streams through it instead of being force-
    promoted to device residency (the round-3 review finding)."""
    cfg = TrainConfig(batch_size=8, num_epochs=1, patience=10)
    model = ResNet1DSE(num_classes=2, base_filters=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 256, 1)))
    from ecgmm_tpu.train import optim as optim_lib

    tx = optim_lib.make_optimizer(cfg)
    state = create_state(variables, tx, jax.random.PRNGKey(0))
    task = make_signal_task(model, cfg)

    # batch 8 (divisible by the 8-device mesh) over the 48-row split:
    # 6 batches per-batch-streamed, 3 chunks of 2 when chunked
    resident = engine.evaluate_scan(task, state, data64.train, 8, mesh8)
    host_split = pipeline.to_host_resident(data64.train)
    perbatch = engine.evaluate_streamed(task, state, host_split, 8, mesh8)
    chunked = engine.evaluate_streamed(
        task, state, host_split, 8, mesh8, stream_chunk_batches=2
    )
    for ev in (perbatch, chunked):
        np.testing.assert_allclose(ev.loss, resident.loss, rtol=1e-6)
        np.testing.assert_allclose(
            ev.logits, resident.logits, atol=1e-6
        )
        np.testing.assert_array_equal(ev.labels, resident.labels)
        assert ev.accuracy == resident.accuracy


def test_run_streams_test_split_end_to_end(tmp_path, monkeypatch):
    """run() with a 1-byte HBM budget: ALL splits (incl. test) stream,
    and the best/last test protocol still reports finite metrics."""
    from ecgmm_tpu.config import get_preset
    from ecgmm_tpu.workloads import run as run_mod
    import dataclasses as dc

    monkeypatch.setenv("ECGMM_HBM_BUDGET_BYTES", "1")
    monkeypatch.setenv("ECGMM_STREAM_CHUNK_BATCHES", "2")
    cfg = get_preset("signal_only")
    cfg = dc.replace(
        cfg,
        data=dc.replace(cfg.data, signal_len=256),
        train=dc.replace(
            cfg.train, num_epochs=1, batch_size=8,
            checkpoint_dir=str(tmp_path / "ckpt"),
            output_dir=str(tmp_path / "out"),
            log_dir=str(tmp_path / "logs"),
        ),
    )
    cohort = synthetic.make_cohort(n=48, signal_len=256, img_hw=(16, 32))
    data = pipeline.materialize_trimodal(cohort, cfg, device=False)
    data = pipeline.MaterializedData(
        train=pipeline.fit_in_budget(data.train, 1),
        val=pipeline.fit_in_budget(data.val, 1),
        test=pipeline.fit_in_budget(data.test, 1),
        ecg_scaler=data.ecg_scaler,
        clinical_scaler=data.clinical_scaler,
    )
    assert isinstance(data.test, pipeline.HostArrays)
    _, results = run_mod.run(cfg, data, verbose=False)
    for tag in ("best", "last"):
        assert np.isfinite(results[tag]["accuracy"])


# Suite tiering: every test in this module is multi-second e2e work —
# the fast tier (pytest -m "not slow") skips it; CI and the full local
# run still execute it.
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
