"""Background-thread batch prefetching.

The reference overlaps host-side data prep with device compute via
DataLoader worker processes (train_joint.py:290-298, num_workers).  The
TPU-native equivalent: a small bounded queue fed by a daemon thread, so
parquet decode / augmentation / collation for batch N+1 runs while the
device executes step N.  Threads (not processes) suffice because the heavy
work is numpy/pyarrow which releases the GIL.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional


class _Sentinel:
    pass


_DONE = _Sentinel()


class PrefetchIterator:
    """Wrap any batch iterable; pulls ``depth`` batches ahead on a daemon
    thread.  Exceptions in the source re-raise in the consumer."""

    def __init__(self, source: Iterable, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()

        def worker():
            try:
                for item in source:
                    if self._stop.is_set():
                        return
                    self._q.put(item)
            except BaseException as e:  # noqa: BLE001
                self._err = e
            finally:
                self._q.put(_DONE)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is _DONE:
            self._thread.join(timeout=5)
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # drain so the worker unblocks from a full queue
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


def prefetch(source: Iterable, depth: int = 2) -> PrefetchIterator:
    return PrefetchIterator(source, depth)
