"""Serving micro-batcher (service/batching.py)."""

import threading
import time

import numpy as np
import pytest

from cross_modal_video_engine_tpu.service.batching import (
    MicroBatcher, make_padded_array_fn)


def test_coalesces_concurrent_rows():
    calls = []

    def fn(rows):
        calls.append(len(rows))
        time.sleep(0.02)               # slow device call -> queue builds
        return [r * 2 for r in rows]

    b = MicroBatcher(fn, max_batch=16, max_wait_ms=10)
    results = [None] * 24
    def worker(i):
        results[i] = b.submit(np.float32(i))
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()
    assert [float(r) for r in results] == [2.0 * i for i in range(24)]
    assert b.rows_run == 24
    # far fewer device calls than rows
    assert b.batches_run < 24
    assert max(calls) > 1


def test_error_fans_out():
    def fn(rows):
        raise ValueError("boom")

    b = MicroBatcher(fn, max_batch=4, max_wait_ms=1)
    with pytest.raises(ValueError):
        b.submit(np.zeros(2))
    b.close()


def test_padded_array_fn_shapes():
    seen = []

    def array_fn(batch):
        seen.append(batch.shape[0])
        return batch + 1

    fn = make_padded_array_fn(array_fn, max_batch=8)
    rows = [np.full((3,), i, np.float32) for i in range(5)]
    out = fn(rows)
    assert seen == [8]                  # 5 -> padded to 8
    assert len(out) == 5
    np.testing.assert_allclose(out[4], np.full((3,), 5.0))


def test_single_row_fast_path():
    fn = make_padded_array_fn(lambda b: b * 3, max_batch=8)
    b = MicroBatcher(fn, max_batch=8, max_wait_ms=1)
    out = b.submit(np.ones((2,), np.float32))
    np.testing.assert_allclose(out, [3.0, 3.0])
    b.close()


def test_service_metrics_endpoint():
    from cross_modal_video_engine_tpu.service.app import EngineService

    svc = EngineService()
    svc.register("echo", lambda p: {"ok": p["x"]})
    for i in range(5):
        svc.dispatch("echo", {"x": i})
    try:
        svc.dispatch("echo", {})     # KeyError inside handler -> error count
    except KeyError:
        pass
    m = svc.dispatch("metrics", {})
    assert m["echo"]["requests"] == 6
    assert m["echo"]["errors"] == 1
    assert m["echo"]["latency_ms_p50"] is not None


def test_short_result_list_fails_all_futures():
    """A handler returning fewer results than rows must raise into every
    pending future instead of leaving them blocked forever."""
    import pytest
    from cross_modal_video_engine_tpu.service.batching import MicroBatcher

    bad = MicroBatcher(lambda rows: rows[:-1], max_batch=4, max_wait_ms=1)
    with pytest.raises(RuntimeError, match="returned 0 results for 1"):
        bad.submit(np.zeros(2), timeout=5)
    bad.close()
