"""Background batch prefetcher (data/prefetch.py)."""

import time

import numpy as np
import pytest

from damc_tpu.data.datasets import Loader
from damc_tpu.data.prefetch import Prefetcher


def test_yields_same_items_in_order():
    items = list(range(50))
    with Prefetcher(iter(items), depth=3) as pf:
        assert list(pf) == items


def test_wraps_loader_stream_identically():
    imgs = (np.random.RandomState(0).rand(40, 8, 8, 3) * 255).astype(np.uint8)
    direct = Loader(imgs, batch_size=8, shuffle=True, seed=3).stream()
    wrapped = Loader(imgs, batch_size=8, shuffle=True, seed=3).stream()
    with Prefetcher(wrapped, depth=2) as pf:
        for _ in range(12):
            xa, ia = next(direct)
            xb, ib = next(pf)
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ia, ib)


def test_producer_exception_propagates():
    def gen():
        yield 1
        raise ValueError("boom")

    with Prefetcher(gen(), depth=2) as pf:
        assert next(pf) == 1
        with pytest.raises(ValueError, match="boom"):
            next(pf)


def test_close_stops_blocked_producer_thread():
    produced = []

    def gen():
        i = 0
        while True:
            produced.append(i)
            yield i
            i += 1

    pf = Prefetcher(gen(), depth=1)
    assert next(pf) == 0
    time.sleep(0.2)  # let the producer fill the queue and block
    pf.close()
    assert not pf._thread.is_alive()
    # Producer stopped promptly: bounded by depth + in-flight item.
    assert len(produced) < 10


def test_overlap_actually_happens():
    """With a slow producer and slow consumer, wall time approaches
    max(producer, consumer) rather than their sum."""
    def slow_gen():
        for i in range(8):
            time.sleep(0.03)
            yield i

    t0 = time.perf_counter()
    with Prefetcher(slow_gen(), depth=2) as pf:
        out = []
        for v in pf:
            time.sleep(0.03)  # consumer work
            out.append(v)
    dt = time.perf_counter() - t0
    assert out == list(range(8))
    assert dt < 8 * 0.03 * 2 * 0.85, f"no overlap: {dt:.3f}s"
