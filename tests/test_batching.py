"""MicroBatcher (serve/batching.py): coalescing, bucketing, shape
grouping, error propagation — pure host-threading tests with a counting
fake device fn, plus a batched-serving integration test against the live
pipeline (see test_serve_batched.py for the HTTP-level test)."""

import threading

import numpy as np
import pytest

from ecgmm_tpu.serve.batching import MicroBatcher, _bucket_for


def test_bucket_for():
    assert _bucket_for(1, (1, 2, 4, 8)) == 1
    assert _bucket_for(3, (1, 2, 4, 8)) == 4
    assert _bucket_for(8, (1, 2, 4, 8)) == 8


def _counting_fn(calls):
    def fn(x, y):
        calls.append(x.shape[0])
        return (x * 2.0, y + 1.0)

    return fn


def test_single_submit_roundtrip():
    calls = []
    mb = MicroBatcher(_counting_fn(calls), window_ms=1, max_batch=8)
    try:
        out_x, out_y = mb.submit(np.full((3,), 2.0), np.zeros((2, 2)))
        np.testing.assert_array_equal(out_x, np.full((3,), 4.0))
        np.testing.assert_array_equal(out_y, np.ones((2, 2)))
        assert calls == [1]  # padded to bucket 1
    finally:
        mb.close()


def test_concurrent_submits_coalesce():
    calls = []
    mb = MicroBatcher(_counting_fn(calls), window_ms=200, max_batch=8)
    try:
        results = [None] * 8
        barrier = threading.Barrier(8)

        def worker(i):
            barrier.wait()
            results[i] = mb.submit(
                np.full((4,), float(i)), np.zeros((1,))
            )

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(8):
            np.testing.assert_array_equal(
                results[i][0], np.full((4,), 2.0 * i)
            )
        # 8 requests inside one 200 ms window → far fewer dispatches than
        # requests (max_batch fills cut the window short)
        assert sum(calls) >= 8
        assert len(calls) <= 4
    finally:
        mb.close()


def test_batch_padding_discards_pad_rows():
    calls = []
    mb = MicroBatcher(_counting_fn(calls), window_ms=150, max_batch=8,
                      buckets=(1, 2, 4, 8))
    try:
        results = [None] * 3
        barrier = threading.Barrier(3)

        def worker(i):
            barrier.wait()
            results[i] = mb.submit(np.full((2,), float(i)), np.zeros(()))

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(3):
            np.testing.assert_array_equal(
                results[i][0], np.full((2,), 2.0 * i)
            )
        # every dispatch size is a bucket size
        assert all(c in (1, 2, 4, 8) for c in calls)
    finally:
        mb.close()


def test_heterogeneous_shapes_never_share_a_dispatch():
    shapes_seen = []

    def fn(x):
        shapes_seen.append(x.shape)
        return (x,)

    mb = MicroBatcher(fn, window_ms=100, max_batch=8)
    try:
        results = {}
        barrier = threading.Barrier(4)

        def worker(i, shape):
            barrier.wait()
            results[i] = mb.submit(np.full(shape, float(i)))

        specs = [(0, (3,)), (1, (4,)), (2, (3,)), (3, (4,))]
        threads = [
            threading.Thread(target=worker, args=s) for s in specs
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, shape in specs:
            assert results[i][0].shape == shape
            np.testing.assert_array_equal(
                results[i][0], np.full(shape, float(i))
            )
        # each dispatch is shape-homogeneous
        assert all(s[1:] in ((3,), (4,)) for s in shapes_seen)
    finally:
        mb.close()


def test_error_propagates_to_submitter():
    def boom(x):
        raise RuntimeError("device on fire")

    mb = MicroBatcher(boom, window_ms=1, max_batch=2, buckets=(1, 2))
    try:
        with pytest.raises(RuntimeError, match="device on fire"):
            mb.submit(np.zeros((1,)))
        # the worker survives an erroring dispatch
        with pytest.raises(RuntimeError, match="device on fire"):
            mb.submit(np.zeros((1,)))
    finally:
        mb.close()


def test_submit_after_close_raises():
    mb = MicroBatcher(lambda x: (x,), window_ms=1, max_batch=1,
                      buckets=(1,))
    mb.close()
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit(np.zeros((1,)))
