"""Batched serving (ServingPipeline.enable_batching): concurrent
requests coalesce into bucketed vmapped dispatches and produce the same
responses as the unbatched path — at pipeline level, over HTTP, and from
an AOT bundle exported with batched programs."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from ecgmm_tpu.data import synthetic
from ecgmm_tpu.serve.api import ENDPOINT, ServingPipeline, serve


@pytest.fixture(scope="module")
def cohort():
    return synthetic.make_cohort(n=4, signal_len=2476, img_hw=(250, 2500))


@pytest.fixture(scope="module")
def pipelines():
    """One demo pipeline for reference responses, one with batching on."""
    ref = ServingPipeline.demo()
    batched = ServingPipeline.demo()
    batched.enable_batching(window_ms=150, max_batch=4, buckets=(1, 2, 4))
    yield ref, batched
    batched.close_batching()


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


def _assert_same_response(a, b):
    assert a["label"] == b["label"]
    assert np.isclose(a["probability"], b["probability"],
                      rtol=1e-3, atol=1e-4)
    for k in ("image", "signal", "age", "wt"):
        assert np.isclose(
            a["feature_importance"][k], b["feature_importance"][k],
            rtol=5e-2, atol=0.5,
        ), k
    assert a["ecg_signal"] == b["ecg_signal"]
    assert set(a) == set(b)


def test_batched_matches_unbatched(pipelines, cohort):
    ref, batched = pipelines
    expected = [
        ref.predict(cohort.images[i], {"age": 50 + i, "weight": 70 + i})
        for i in range(4)
    ]
    got = _concurrent_predict(batched, cohort, 4)
    for e, g in zip(expected, got):
        _assert_same_response(e, g)
    # the 4 concurrent requests coalesced into fewer device dispatches
    sizes = batched._batcher.dispatch_sizes
    assert sum(sizes) >= 4
    assert len(sizes) < 4


def test_batched_http_endpoint(pipelines, cohort):
    from PIL import Image
    import io

    _, batched = pipelines
    # ephemeral port: a fixed one collides when two suites overlap
    httpd = serve(batched, port=0, background=True)
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        def post(i):
            buf = io.BytesIO()
            Image.fromarray(cohort.images[i]).save(buf, format="PNG")
            boundary = "b123"
            parts = [
                f"--{boundary}".encode(),
                b'Content-Disposition: form-data; name="file"; '
                b'filename="e.png"',
                b"", buf.getvalue(),
                f"--{boundary}".encode(),
                b'Content-Disposition: form-data; name="questionnaire"',
                b"", json.dumps({"age": 60, "weight": 70}).encode(),
                f"--{boundary}--".encode(),
            ]
            req = urllib.request.Request(
                base + ENDPOINT,
                data=b"\r\n".join(parts),
                headers={"Content-Type":
                         f"multipart/form-data; boundary={boundary}"},
            )
            return json.load(urllib.request.urlopen(req, timeout=300))

        results = [None, None]
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(i, post(i))
            )
            for i in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for r in results:
            assert r["label"] in ("Normal", "Abnormal")
            assert set(r) >= {
                "label", "probability", "ecg_signal", "heatmap",
                "feature_importance", "gpt_result",
            }
    finally:
        httpd.shutdown()


def test_exported_bundle_serves_batched(cohort, tmp_path):
    from ecgmm_tpu.serve.export import export_bundle

    ref = ServingPipeline.demo()
    out = export_bundle(
        ref, str(tmp_path / "bundle"), platforms=("cpu",),
        batch_buckets=(1, 2),
    )
    pipe = ServingPipeline.from_exported(out)
    pipe.enable_batching(window_ms=150, max_batch=2, buckets=(1, 2))
    try:
        expected = [
            ref.predict(cohort.images[i], {"age": 50 + i, "weight": 70 + i})
            for i in range(2)
        ]
        got = _concurrent_predict(pipe, cohort, 2)
        for e, g in zip(expected, got):
            _assert_same_response(e, g)
    finally:
        pipe.close_batching()


def test_failed_reenable_keeps_live_batcher(pipelines, cohort):
    """A bad re-enable must not tear down a working batcher."""
    _, batched = pipelines
    old = batched._batcher
    with pytest.raises(ValueError):
        # max_batch 6 != max(default buckets (1,2,4,8))
        batched.enable_batching(window_ms=5, max_batch=6)
    assert batched._batcher is old
    r = batched.predict(cohort.images[0], {"age": 60, "weight": 70})
    assert r["label"] in ("Normal", "Abnormal")


def test_enable_batching_without_programs_raises(tmp_path):
    from ecgmm_tpu.serve.export import export_bundle

    ref = ServingPipeline.demo()
    out = export_bundle(ref, str(tmp_path / "nb"), platforms=("cpu",))
    pipe = ServingPipeline.from_exported(out)
    with pytest.raises(ValueError, match="batch"):
        pipe.enable_batching()


def test_closed_race_falls_back_dispatch_failure_surfaces(pipelines, cohort):
    """predict() quietly retries unbatched when submit races a close
    (BatcherClosed: the request was never dispatched) but PROPAGATES a
    BatchDispatchError — a persistently failing batched program must
    surface, not silently degrade to double work (round-3 review
    finding)."""
    from ecgmm_tpu.serve import batching

    ref, batched = pipelines

    class _ClosedStub:
        def submit(self, *a):
            raise batching.BatcherClosed("MicroBatcher is closed")

    class _BoomStub:
        def submit(self, *a):
            err = batching.BatchDispatchError(
                "batched dispatch failed: XlaRuntimeError('OOM')"
            )
            raise err

    want = ref.predict(cohort.images[0], {"age": 50, "weight": 70})
    orig = batched._batcher
    try:
        batched._batcher = _ClosedStub()
        got = batched.predict(cohort.images[0], {"age": 50, "weight": 70})
        _assert_same_response(want, got)

        batched._batcher = _BoomStub()
        with pytest.raises(batching.BatchDispatchError):
            batched.predict(cohort.images[0], {"age": 50, "weight": 70})
    finally:
        batched._batcher = orig


# Suite tiering: every test in this module is multi-second e2e work —
# the fast tier (pytest -m "not slow") skips it; CI and the full local
# run still execute it.
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
