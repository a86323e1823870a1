"""Prefetch thread: ordering, exception propagation, cancellation."""
import threading
import time

import pytest

from recsys_tpu.data.prefetch import prefetch


def test_prefetch_preserves_order_and_items():
    assert list(prefetch(iter(range(50)), depth=4)) == list(range(50))


def test_prefetch_reraises_generator_exception():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetch_abandoned_consumer_stops_worker():
    """Closing the iterator mid-stream must let the worker thread exit even
    though the queue is full (the pre-fix behaviour blocked forever on
    q.put, pinning buffered batches)."""
    started = threading.active_count()
    release = threading.Event()

    def gen():
        for i in range(1000):
            yield i

    it = prefetch(gen(), depth=1)
    assert next(it) == 0
    it.close()  # abandon: triggers GeneratorExit -> stop event
    deadline = time.time() + 5.0
    while threading.active_count() > started and time.time() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= started, "worker thread leaked"
    release.set()
