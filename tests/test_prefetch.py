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

    def consume(it):
        t0 = time.time()
        total = 0
        for x in it:
            time.sleep(0.05)  # consumer work overlaps producer work
            total += x
        return total, time.time() - t0

    # Self-calibrating: compare against a serial control run measured in the
    # same environment, so a loaded/contended box (sleeps stretch uniformly)
    # doesn't flip a fixed wall-clock bound. Retry to ride out one-off stalls.
    ratios = []
    for _ in range(3):
        total_s, serial = consume(slow_source())
        total_p, overlapped = consume(prefetch(slow_source(), depth=2))
        assert total_s == total_p == 15
        ratios.append(overlapped / serial)
        if ratios[-1] < 0.85:  # ideal is ~0.58 (0.35s vs 0.6s)
            return
    raise AssertionError(f"no overlap observed: overlapped/serial ratios {ratios}")


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
