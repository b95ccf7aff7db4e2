"""Prefetching loader: order, completeness, overlap, and error propagation."""

import time

import pytest

from cosy_tpu.data.prefetch import prefetch


def test_order_and_completeness():
    assert list(prefetch(range(17), depth=3)) == list(range(17))


def test_empty_source():
    assert list(prefetch([], depth=2)) == []


def test_overlaps_producer_and_consumer():
    def slow_source():
        for i in range(6):
            time.sleep(0.05)
            yield i

    t0 = time.time()
    total = 0
    for x in prefetch(slow_source(), depth=2):
        time.sleep(0.05)  # consumer work overlaps producer work
        total += x
    elapsed = time.time() - t0
    assert total == 15
    # serial would be ~0.6s; overlapped ~0.35s. generous bound:
    assert elapsed < 0.55, elapsed


def test_propagates_source_exception():
    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        for _ in it:
            pass


def test_close_unblocks():
    def infinite():
        i = 0
        while True:
            yield i
            i += 1

    it = prefetch(infinite(), depth=2)
    assert next(it) == 0
    it.close()  # must not hang
