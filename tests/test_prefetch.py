"""Background batch prefetcher (data/prefetch.py)."""

import threading
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


def test_producer_exception_propagates_and_latches():
    def gen():
        yield 1
        raise ValueError("boom")

    with Prefetcher(gen(), depth=2) as pf:
        assert next(pf) == 1
        with pytest.raises(ValueError, match="boom"):
            next(pf)
        with pytest.raises(ValueError, match="boom"):  # latched, no hang
            next(pf)


def test_close_preserves_unconsumed_producer_error():
    """close() drains the queue to unblock the producer; a not-yet-consumed
    _Error found in the drain must be latched (not discarded) so a later
    __next__ still raises — a dead loader must not look cleanly exhausted."""
    errored = threading.Event()

    def gen():
        try:
            raise ValueError("boom")
            yield  # unreachable; makes this a generator function
        finally:
            errored.set()

    pf = Prefetcher(gen(), depth=2)
    assert errored.wait(timeout=5.0)
    pf._thread.join(timeout=5.0)  # _Error is now enqueued, unconsumed
    pf.close()
    with pytest.raises(ValueError, match="boom"):
        next(pf)
    with pytest.raises(ValueError, match="boom"):  # still latched
        next(pf)


def test_exhausted_iterator_latches_stopiteration():
    pf = Prefetcher(iter([1, 2]), depth=2)
    assert list(pf) == [1, 2]
    for _ in range(3):  # repeated next() must re-raise, never block
        with pytest.raises(StopIteration):
            next(pf)
    pf.close()


def test_abandoned_prefetcher_is_collectable():
    """The producer thread must not keep the Prefetcher reachable — an
    abandoned instance gets garbage-collected and __del__ stops the
    thread (exception paths in drivers skip close())."""
    import gc
    import weakref

    def gen():
        i = 0
        while True:
            yield i
            i += 1

    pf = Prefetcher(gen(), depth=1)
    assert next(pf) == 0
    thread = pf._thread
    ref = weakref.ref(pf)
    del pf
    gc.collect()
    assert ref() is None, "producer thread kept the Prefetcher alive"
    thread.join(timeout=5.0)
    assert not thread.is_alive()


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


def test_driver_runs_with_lazy_dataset_through_prefetcher(tmp_path):
    """A lazy batch-indexable dataset (the LSUN/image-folder shape) routes
    through the NumPy Loader + Prefetcher inside train_gen_recon."""
    import dataclasses

    import jax

    from damc_tpu.train.gen_recon import train_gen_recon
    from damc_tpu.utils import preset

    class LazyImages:
        """Batch-indexable view without ndarray dtype (decodes on access)."""

        def __init__(self, n):
            self._rng = np.random.RandomState(0)
            self._base = (self._rng.rand(n, 32, 32, 3) * 255).astype(np.uint8)

        def __len__(self):
            return len(self._base)

        def __getitem__(self, idx):
            return self._base[idx]

    cfg = preset("cifar10")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, nz=8, ngf=4, nif=4, nxemb=16, ntemb=8),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
        train=dataclasses.replace(
            cfg.train, batch_size=8, q_updates=1, print_every=1,
            plot_every=0, ckpt_every=0, eval_every=0,
        ),
    )
    # Assert the ROUTING the docstring claims: lazy stores take the NumPy
    # Loader and get wrapped in a Prefetcher by make_stream.
    import damc_tpu.data.prefetch as prefetch_mod
    from damc_tpu.data.datasets import Loader
    from damc_tpu.data.native_loader import make_loader

    assert isinstance(make_loader(LazyImages(40), batch_size=8), Loader)
    constructed = []
    real_prefetcher = prefetch_mod.Prefetcher

    class RecordingPrefetcher(real_prefetcher):
        def __init__(self, *a, **k):
            constructed.append(True)
            super().__init__(*a, **k)

    import unittest.mock as mock

    with mock.patch.object(prefetch_mod, "Prefetcher", RecordingPrefetcher):
        state = train_gen_recon(
            cfg, LazyImages(40), iterations=3, log_dir=str(tmp_path), seed=0
        )
    assert constructed, "lazy dataset did not route through the Prefetcher"
    assert int(state.step) == 3
    assert (tmp_path / "metrics.jsonl").exists()


def test_overlap_actually_happens():
    """The producer runs ahead of the consumer (structural overlap check).

    A wall-clock version of this test (assert >=25% time saving over
    serial) flaked on a loaded 1-core CI box where time.sleep overshot 2x.
    Overlap is instead asserted by ordering: without prefetch, production
    and consumption strictly alternate, so the producer's lead
    (produced - consumed) never exceeds 1; with a depth-2 Prefetcher the
    producer fills the queue during consumer work and the lead reaches 2.
    Scheduling-robust — the producer only needs to be scheduled during ANY
    of the 8 consumer sleeps to build its lead."""
    produced = 0
    max_lead = 0

    def slow_gen():
        nonlocal produced
        for i in range(8):
            time.sleep(0.02)
            produced += 1
            yield i

    out = []
    with Prefetcher(slow_gen(), depth=2) as pf:
        for v in pf:
            time.sleep(0.05)  # consumer work: the producer's window to run ahead
            max_lead = max(max_lead, produced - len(out))
            out.append(v)
    assert out == list(range(8))
    assert max_lead >= 2, f"producer never ran ahead (max lead {max_lead})"
