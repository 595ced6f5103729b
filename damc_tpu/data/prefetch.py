"""Host-side background batch prefetch.

The native C++ loader overlaps batch assembly with device compute via its
own worker pool, but the NumPy fallback `Loader` — the path lazy datasets
take (LSUN lmdb, image folders: per-batch JPEG decode) — produces batches
synchronously inside the training loop, serializing decode with the device
step. `Prefetcher` moves any batch iterator onto a daemon thread with a
small bounded queue so the next batch decodes while the TPU runs the
current one.

Exceptions from the producer propagate to the consumer on the next
`__next__`; `close()` (or the context manager) stops the thread promptly
even when the queue is full.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class _End:
    pass


class _Error:
    def __init__(self, exc: BaseException):
        self.exc = exc


class Prefetcher:
    """Wrap an iterable so items are produced on a background thread."""

    def __init__(self, iterable: Iterable, depth: int = 2):
        self._queue: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._fill, args=(iter(iterable),), daemon=True
        )
        self._thread.start()

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _fill(self, it: Iterator) -> None:
        try:
            for item in it:
                if not self._put(item):
                    return
            self._put(_End())
        except BaseException as e:  # surfaced to the consumer
            self._put(_Error(e))

    def __iter__(self) -> "Prefetcher":
        return self

    def __next__(self):
        item = self._queue.get()
        if isinstance(item, _End):
            raise StopIteration
        if isinstance(item, _Error):
            raise item.exc
        return item

    def close(self) -> None:
        self._stop.set()
        # Drain so a producer blocked on put() sees the stop event.
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self) -> "Prefetcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):
        # Drivers close() on normal return; this stops the producer thread
        # when an exception path skips it (it only spins on a 0.1 s timer,
        # but there is no reason to leave it running).
        try:
            self.close()
        except Exception:
            pass
