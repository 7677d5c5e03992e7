"""AOT serving bundles (serve/export.py): export the whole request
program via jax.export, rehydrate it WITHOUT model code, and demand the
exported pipeline's responses match the live pipeline's."""

import numpy as np
import pytest

from ecgmm_tpu.data import synthetic
from ecgmm_tpu.serve.api import ServingPipeline
from ecgmm_tpu.serve.export import export_bundle, load_bundle


@pytest.fixture(scope="module")
def demo_pipeline():
    return ServingPipeline.demo()


@pytest.fixture(scope="module")
def bundle(demo_pipeline, tmp_path_factory):
    out = tmp_path_factory.mktemp("serving") / "bundle"
    # CPU-only on the test backend; production exports ("cpu", "tpu")
    # are covered by the multi-platform lowering test below.
    return export_bundle(demo_pipeline, str(out), platforms=("cpu",))


def test_bundle_contents_and_meta(bundle):
    _, meta, host = load_bundle(bundle)
    assert meta["format_version"] == 1
    assert meta["platforms"] == ["cpu"]
    assert meta["img_hw"] == [224, 224]
    assert meta["signal_len"] == 2476
    assert "background" in host


def test_exported_predict_matches_live(demo_pipeline, bundle):
    exported = ServingPipeline.from_exported(bundle)
    assert exported.model is None  # no model code rehydrated
    cohort = synthetic.make_cohort(n=1, signal_len=2476, img_hw=(250, 2500))
    q = {"age": 63, "weight": 71, "sex": "F"}
    live = demo_pipeline.predict(cohort.images[0], q)
    aot = exported.predict(cohort.images[0], q)
    assert aot["label"] == live["label"]
    assert np.isclose(aot["probability"], live["probability"],
                      rtol=1e-4, atol=1e-5)
    for k in ("image", "signal", "age", "wt"):
        assert np.isclose(
            aot["feature_importance"][k], live["feature_importance"][k],
            rtol=1e-3, atol=1e-4,
        ), k
    assert aot["ecg_signal"] == live["ecg_signal"]
    assert set(aot) == set(live)


def test_multi_platform_lowering(demo_pipeline, tmp_path):
    """A ("cpu", "tpu") bundle lowers and round-trips even on the CPU-only
    test backend — the artifact that ships to the TPU serving fleet."""
    out = export_bundle(
        demo_pipeline, str(tmp_path / "b2"), platforms=("cpu", "tpu")
    )
    _, meta, _ = load_bundle(out)
    assert meta["platforms"] == ["cpu", "tpu"]
    exported = ServingPipeline.from_exported(out)
    cohort = synthetic.make_cohort(n=1, signal_len=2476, img_hw=(250, 2500))
    r = exported.predict(cohort.images[0], {"age": 50, "weight": 80})
    assert r["label"] in ("Normal", "Abnormal")


def test_cli_run_dir_wiring(monkeypatch, tmp_path):
    """--run-dir must reach from_run WITH the data split it needs
    (regression: the CLI once omitted the required 'data' argument)."""
    from ecgmm_tpu.serve import export as ex

    captured = {}

    def fake_from_run(cls, run_dir, data, **kw):
        captured["run_dir"] = run_dir
        captured["n"] = data.train.n + data.val.n + data.test.n
        return object()

    monkeypatch.setattr(
        ServingPipeline, "from_run", classmethod(fake_from_run)
    )
    monkeypatch.setattr(
        ex, "export_bundle",
        lambda pipe, out, platforms, batch_buckets=None: out,
    )
    ex.main(["--out", str(tmp_path / "b"), "--run-dir", "/some/run",
             "--n-synth", "32", "--platforms", "cpu"])
    assert captured["run_dir"] == "/some/run"
    assert captured["n"] == 32


def test_format_version_gate(demo_pipeline, tmp_path):
    import json
    import os

    out = export_bundle(demo_pipeline, str(tmp_path / "b3"),
                        platforms=("cpu",))
    meta_path = os.path.join(out, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["format_version"] = 999
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="re-export"):
        load_bundle(out)


# Suite tiering: every test in this module is multi-second e2e work —
# the fast tier (pytest -m "not slow") skips it; CI and the full local
# run still execute it.
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
