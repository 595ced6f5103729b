"""Native C++ batch-loader tests (skipped when no toolchain)."""

import numpy as np
import pytest

from damc_tpu.data.native_loader import (
    NativeLoader,
    make_loader,
    native_loader_available,
)

needs_native = pytest.mark.skipif(
    not native_loader_available(), reason="g++ toolchain unavailable"
)


@needs_native
def test_batch_content_matches_store():
    imgs = np.random.RandomState(0).randint(0, 256, (64, 4, 6, 3), np.uint8)
    loader = NativeLoader(imgs, batch_size=8, augment_flip=False, seed=0)
    try:
        b, idx = loader.next()
        assert b.shape == (8, 4, 6, 3) and b.dtype == np.float32
        for i in range(8):
            ref = imgs[idx[i]].astype(np.float32) / 255.0 * 2.0 - 1.0
            np.testing.assert_allclose(b[i], ref, atol=1e-6)
    finally:
        loader.close()


@needs_native
def test_flip_augmentation():
    imgs = np.random.RandomState(1).randint(0, 256, (64, 4, 6, 3), np.uint8)
    loader = NativeLoader(imgs, batch_size=32, augment_flip=True, seed=0)
    try:
        b, idx = loader.next()
        flips = 0
        for i in range(32):
            ref = imgs[idx[i]].astype(np.float32) / 255.0 * 2.0 - 1.0
            if np.allclose(b[i], ref, atol=1e-6):
                continue
            np.testing.assert_allclose(b[i], ref[:, ::-1], atol=1e-6)
            flips += 1
        assert 0 < flips < 32  # Bernoulli(0.5) flips, some of each
    finally:
        loader.close()


@needs_native
def test_epoch_covers_all_samples():
    n, bs = 48, 8
    imgs = np.zeros((n, 2, 2, 1), np.uint8)
    loader = NativeLoader(imgs, batch_size=bs, augment_flip=False, seed=3,
                          num_threads=1, prefetch_depth=1)
    try:
        seen = []
        for _ in range(n // bs):
            _, idx = loader.next()
            seen.extend(idx.tolist())
        assert sorted(seen) == list(range(n))  # one full shuffled epoch
    finally:
        loader.close()


@needs_native
def test_stream_is_infinite():
    imgs = np.zeros((16, 2, 2, 1), np.uint8)
    loader = NativeLoader(imgs, batch_size=8, seed=0)
    try:
        s = loader.stream()
        for _ in range(10):  # > several epochs
            b, _ = next(s)
            assert b.shape == (8, 2, 2, 1)
    finally:
        loader.close()


def test_make_loader_falls_back_for_float_store():
    from damc_tpu.data.datasets import Loader

    imgs = np.zeros((16, 2, 2, 1), np.float32)
    loader = make_loader(imgs, batch_size=8)
    assert isinstance(loader, Loader)


@needs_native
def test_multithreaded_batch_order_is_deterministic():
    """Workers finish in scheduler order, but the ready buffer is keyed by
    claim sequence — a fixed seed must yield the identical batch stream
    regardless of thread count (review finding: completion-order push made
    seeded runs non-reproducible on multi-core hosts)."""
    imgs = (np.random.RandomState(0).rand(64, 8, 8, 3) * 255).astype(np.uint8)

    def collect(threads):
        ld = NativeLoader(
            imgs, batch_size=8, shuffle=True, drop_last=True,
            augment_flip=True, seed=123, num_threads=threads,
        )
        out = [ld.next() for _ in range(24)]  # 3 epochs
        ld.close()
        return out

    a, b, c = collect(1), collect(4), collect(4)
    for (xa, ia), (xb, ib), (xc, ic) in zip(a, b, c):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ia, ic)
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(xa, xc)


@needs_native
def test_drop_last_false_rejected_and_falls_back():
    """The native engine implements drop_last-only; drop_last=False must
    raise (direct use) and route make_loader to the NumPy Loader."""
    from damc_tpu.data.datasets import Loader
    from damc_tpu.data.native_loader import make_loader

    imgs = (np.random.RandomState(1).rand(20, 8, 8, 3) * 255).astype(np.uint8)
    with pytest.raises(RuntimeError):
        NativeLoader(imgs, batch_size=8, drop_last=False)
    ld = make_loader(imgs, batch_size=8, drop_last=False)
    assert isinstance(ld, Loader)
