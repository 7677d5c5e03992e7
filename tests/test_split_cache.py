"""Disk-backed split cache: save/load roundtrip, memmap streaming for
over-budget splits, budget resolution, and the --split-cache CLI path
(pipeline.save_materialized / load_materialized / resolve_hbm_budget).
The reference has no equivalent — it re-runs per-sample preprocessing in
DataLoader workers every epoch (/root/reference/dataset.py:53-74)."""

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


@pytest.fixture(scope="module")
def small_data():
    cohort = synthetic.make_cohort(n=80, signal_len=256, img_hw=(16, 32))
    return pipeline.materialize_trimodal(cohort, Config())


def test_roundtrip_promoted_is_bitwise_equal(small_data, tmp_path):
    """budget=0 (unlimited) reopens every split device-resident and
    bit-identical to the original materialization, scalers included."""
    cache = str(tmp_path / "cache")
    pipeline.save_materialized(small_data, cache)
    assert pipeline.has_materialized(cache)
    loaded = pipeline.load_materialized(cache, hbm_budget_bytes=0)
    for split in ("train", "val", "test"):
        a, b = getattr(small_data, split), getattr(loaded, split)
        assert isinstance(b, pipeline.Arrays)
        for f in ("images", "signals", "clinical", "labels"):
            fa, fb = getattr(a, f), getattr(b, f)
            assert np.asarray(fa).dtype == np.asarray(fb).dtype
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
        np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_array_equal(
        small_data.ecg_scaler.mean, loaded.ecg_scaler.mean
    )
    np.testing.assert_array_equal(
        small_data.clinical_scaler.scale, loaded.clinical_scaler.scale
    )


def test_over_budget_load_is_memmap_backed(small_data, tmp_path):
    """A 1-byte budget keeps ALL splits as HostArrays whose fields are
    np.memmap views (no RAM copy) — including test, whose protocol
    streams via engine.evaluate_streamed when over budget (the old
    always-promote OOMed at exactly the scales streaming targets)."""
    cache = str(tmp_path / "cache")
    pipeline.save_materialized(small_data, cache)
    loaded = pipeline.load_materialized(cache, hbm_budget_bytes=1)
    assert isinstance(loaded.train, pipeline.HostArrays)
    assert isinstance(loaded.val, pipeline.HostArrays)
    assert isinstance(loaded.test, pipeline.HostArrays)
    # an ample budget still promotes everything
    roomy = pipeline.load_materialized(cache, hbm_budget_bytes=1 << 40)
    assert isinstance(roomy.test, pipeline.Arrays)
    assert isinstance(loaded.train.signals, np.memmap)
    assert isinstance(loaded.train.labels, np.memmap)
    np.testing.assert_array_equal(
        np.asarray(loaded.train.signals),
        np.asarray(small_data.train.signals),
    )


def test_memmap_streamed_fit_equals_resident_fit(small_data, tmp_path,
                                                 mesh8):
    """Training straight from the memory-mapped cache (streamed engine
    path) matches training from the in-HBM materialization."""
    cache = str(tmp_path / "cache")
    pipeline.save_materialized(small_data, cache)
    loaded = pipeline.load_materialized(cache, hbm_budget_bytes=1)

    cfg = TrainConfig(
        batch_size=16, num_epochs=1, lr=1e-2, patience=10,
        donate_state=False,
    )
    model = ResNet1DSE(num_classes=2, base_filters=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 256, 1)))
    tx = optax.sgd(0.05)
    task = make_signal_task(model, cfg)

    def fresh():
        return create_state(variables, tx, jax.random.PRNGKey(0))

    res_mem = engine.fit(
        task, fresh(), tx, loaded.train, loaded.val, cfg,
        mesh=mesh8, verbose=False,
    )
    res_dev = engine.fit(
        task, fresh(), tx, small_data.train, small_data.val, cfg,
        mesh=mesh8, verbose=False,
    )
    a = flatten_path_dict(jax.tree_util.tree_map(
        np.asarray, res_dev.state.trainable
    ))
    b = flatten_path_dict(jax.tree_util.tree_map(
        np.asarray, res_mem.state.trainable
    ))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=2e-5, err_msg=k)


def test_none_fields_survive_roundtrip(tmp_path):
    """Signal-only materializations (images/clinical absent) cache and
    reload with the absent modalities still None."""
    cohort = synthetic.make_cohort(n=40, signal_len=128, img_hw=(8, 16))
    d = pipeline.materialize_trimodal(cohort, Config())
    signal_only = pipeline.MaterializedData(
        train=d.train._replace(images=None, clinical=None),
        val=d.val._replace(images=None, clinical=None),
        test=d.test._replace(images=None, clinical=None),
        ecg_scaler=d.ecg_scaler,
        clinical_scaler=None,
    )
    cache = str(tmp_path / "cache")
    pipeline.save_materialized(signal_only, cache)
    loaded = pipeline.load_materialized(cache, hbm_budget_bytes=0)
    assert loaded.train.images is None
    assert loaded.train.clinical is None
    assert loaded.clinical_scaler is None
    np.testing.assert_array_equal(
        np.asarray(loaded.train.signals),
        np.asarray(signal_only.train.signals),
    )


def test_meta_fingerprint_guard(small_data, tmp_path):
    """A cache saved with a run-config fingerprint refuses to reopen
    under a different fingerprint (stale-cache guard); matching
    fingerprints and legacy caches without meta.json load normally."""
    import os

    cache = str(tmp_path / "cache")
    meta = {"preset": "fusion", "n_synth": 80, "seed": 42}
    pipeline.save_materialized(small_data, cache, meta=meta)
    pipeline.load_materialized(cache, hbm_budget_bytes=0, expect_meta=meta)
    with pytest.raises(ValueError, match="n_synth"):
        pipeline.load_materialized(
            cache, hbm_budget_bytes=0,
            expect_meta={**meta, "n_synth": 999},
        )
    os.remove(os.path.join(cache, "meta.json"))
    pipeline.load_materialized(cache, hbm_budget_bytes=0, expect_meta=meta)


def test_materialize_host_side_matches_device(tmp_path):
    """device=False materialization returns HostArrays numerically equal
    to the device-promoted materialization (the --split-cache save path
    writes these without any device round trip)."""
    from ecgmm_tpu.config import Config as Cfg

    cohort = synthetic.make_cohort(n=40, signal_len=128, img_hw=(8, 16))
    host = pipeline.materialize_trimodal(cohort, Cfg(), device=False)
    dev = pipeline.materialize_trimodal(cohort, Cfg())
    assert isinstance(host.train, pipeline.HostArrays)
    assert isinstance(host.train.images, np.ndarray)
    for f in ("images", "signals", "clinical", "labels"):
        np.testing.assert_array_equal(
            np.asarray(getattr(host.train, f)),
            np.asarray(getattr(dev.train, f)),
        )
    # fit_in_budget promotes in-budget host splits to device residency
    promoted = pipeline.fit_in_budget(host.train, None)
    assert isinstance(promoted, pipeline.Arrays)


def test_cli_split_cache_fingerprint_mismatch(tmp_path, capsys):
    """Reusing a --split-cache dir with a different cohort size is an
    error, not a silent reuse of the stale splits."""
    from ecgmm_tpu.workloads import run as run_mod

    cache = str(tmp_path / "cache")
    run_mod.main([
        "--preset", "signal_only", "--epochs", "1", "--n-synth", "48",
        "--split-cache", cache, "--run-dir", str(tmp_path / "run1"),
    ])
    capsys.readouterr()
    with pytest.raises(ValueError, match="n_synth"):
        run_mod.main([
            "--preset", "signal_only", "--epochs", "1", "--n-synth", "64",
            "--split-cache", cache, "--run-dir", str(tmp_path / "run2"),
        ])


def test_resolve_hbm_budget_env(monkeypatch):
    monkeypatch.setenv("ECGMM_HBM_BUDGET_BYTES", "123456")
    assert pipeline.resolve_hbm_budget() == 123456
    monkeypatch.setenv("ECGMM_HBM_BUDGET_BYTES", "0")
    assert pipeline.resolve_hbm_budget() == 0
    # unset + CPU backend (no bytes_limit) → unlimited
    monkeypatch.delenv("ECGMM_HBM_BUDGET_BYTES", raising=False)
    assert pipeline.resolve_hbm_budget() == 0


def test_cli_split_cache_saves_then_reopens(tmp_path, capsys):
    """Second --split-cache run skips materialization and reopens the
    cached splits."""
    from ecgmm_tpu.workloads import run as run_mod

    cache = str(tmp_path / "cache")
    args = [
        "--preset", "signal_only", "--epochs", "1", "--n-synth", "48",
        "--split-cache", cache,
        "--run-dir", str(tmp_path / "run1"),
    ]
    run_mod.main(args)
    out1 = capsys.readouterr().out
    assert "saved materialized splits" in out1
    assert pipeline.has_materialized(cache)

    args[-1] = str(tmp_path / "run2")
    run_mod.main(args)
    out2 = capsys.readouterr().out
    assert "reopened materialized splits" in out2


# Suite tiering: every test in this module is multi-second e2e work —
# the fast tier (pytest -m "not slow") skips it; CI and the full local
# run still execute it.
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
