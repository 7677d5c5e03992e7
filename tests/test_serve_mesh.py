"""Data-parallel mesh serving: enable_batching(n_data=N) shards every
bucketed batched dispatch's batch axis across a 1-D `data` mesh of the
first N visible devices (8 virtual CPU devices here — tests/conftest.py).
The batched program is per-sample independent (a vmap), so GSPMD inserts
no collectives and the sharded responses must equal the single-device
ones."""

import json
import threading

import jax
import numpy as np
import pytest

from ecgmm_tpu.data import synthetic
from ecgmm_tpu.serve.api import ServingPipeline


@pytest.fixture(scope="module")
def cohort():
    return synthetic.make_cohort(n=4, signal_len=2476, img_hw=(250, 2500))


@pytest.fixture(scope="module")
def pipelines():
    ref = ServingPipeline.demo()
    sharded = ServingPipeline.demo()
    sharded.enable_batching(
        window_ms=150, max_batch=4, buckets=(2, 4), n_data=2
    )
    yield ref, sharded
    sharded.close_batching()


def _concurrent_predict(pipe, cohort, n):
    results = [None] * n
    barrier = threading.Barrier(n)

    def worker(i):
        barrier.wait()
        results[i] = pipe.predict(
            cohort.images[i], {"age": 50 + i, "weight": 70 + i}
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results


def test_sharded_batched_equals_unbatched(pipelines, cohort):
    ref, sharded = pipelines
    got = _concurrent_predict(sharded, cohort, 4)
    assert sharded._batcher.n_dispatches >= 1
    for i, b in enumerate(got):
        a = ref.predict(
            cohort.images[i], {"age": 50 + i, "weight": 70 + i}
        )
        assert a["label"] == b["label"]
        assert np.isclose(
            a["probability"], b["probability"], rtol=1e-3, atol=1e-4
        )
        assert a["ecg_signal"] == b["ecg_signal"]
        for k in ("image", "signal", "age", "wt"):
            assert np.isclose(
                a["feature_importance"][k], b["feature_importance"][k],
                rtol=5e-2, atol=0.5,
            ), k
        assert set(a) == set(b)


def test_dispatch_is_actually_sharded(pipelines):
    """The bucketed program's output carries the data-axis sharding —
    the dispatch genuinely ran split across devices."""
    _, sharded = pipelines
    h, w = sharded.img_hw
    import jax.numpy as jnp

    out = sharded._batcher._batch_fn(
        jnp.zeros((2, h, w, 3), jnp.float32),
        jnp.zeros((2, sharded.signal_len), jnp.float32),
        jnp.zeros((2, sharded.n_clin), jnp.float32),
    )[0]
    assert len(out.sharding.device_set) == 2


def test_stats_reports_n_data(pipelines):
    _, sharded = pipelines
    st = sharded.stats()
    assert st["batching"]["n_data"] == 2


def test_validation_errors(pipelines):
    ref, _ = pipelines
    with pytest.raises(ValueError, match="not divisible"):
        ref.enable_batching(buckets=(2, 3), n_data=2)
    with pytest.raises(ValueError, match="exceeds"):
        ref.enable_batching(n_data=len(jax.devices()) + 1)
    with pytest.raises(ValueError, match=">= 1"):
        ref.enable_batching(n_data=0)
    assert ref._batcher is None  # no failed enable left a batcher behind


def test_bundle_rejects_mesh(tmp_path):
    """An AOT pipeline (fixed single-device program) must refuse
    n_data > 1 without touching the filesystem: fake the minimal bundle
    state instead of exporting one (export is covered in test_export)."""
    pipe = ServingPipeline.__new__(ServingPipeline)
    pipe._init_packing()
    pipe.model = None
    pipe._predict_many = lambda *a: a
    pipe._exported_buckets = (2, 4)
    with pytest.raises(ValueError, match="live model"):
        pipe.enable_batching(n_data=2, buckets=(2, 4))


def test_default_buckets_scale_with_n_data():
    pipe = ServingPipeline.demo()
    try:
        pipe.enable_batching(window_ms=50, n_data=2)
        assert pipe._batcher._buckets == (2, 4, 8, 16)
    finally:
        pipe.close_batching()


def test_reenable_reuses_compiled_sharded_program(pipelines):
    """Re-enabling mesh batching with the same n_data must reuse the
    cached jitted program (Mesh equality is structural, not identity) —
    a recompile costs 30-250 s per bucket on the relayed TPU."""
    _, sharded = pipelines
    fn_before = sharded._batcher._batch_fn
    sharded.enable_batching(
        window_ms=120, max_batch=4, buckets=(2, 4), n_data=2
    )
    assert sharded._batcher._batch_fn is fn_before


# Suite tiering: every test in this module is multi-second e2e work —
# the fast tier (pytest -m "not slow") skips it; CI and the full local
# run still execute it.
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
