"""Background batch prefetching.

Equivalent of the reference's torch DataLoader worker processes
(`det3d/datasets/loader/build_loader.py:25`, workers_per_gpu=4): a thread
pool builds upcoming batches (file IO + packing run in the native C++ loader
which releases the GIL) while the accelerator consumes the current one.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional


class PrefetchIterator:
    """Wrap a batch iterator; keep `depth` batches materialized ahead."""

    def __init__(self, it: Iterator, depth: int = 2):
        self._it = it
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()

    def _pump(self):
        try:
            for item in self._it:
                self._q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(it: Iterator, depth: int = 2) -> PrefetchIterator:
    return PrefetchIterator(it, depth)
