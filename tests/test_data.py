"""Data pipeline tests: MNIST anomaly split semantics, loaders."""

import numpy as np
import pytest

from damc_tpu.data.datasets import (
    Loader,
    adapt_labels,
    load_mnist_anomaly,
    synthetic_mnist_npz,
)


@pytest.fixture(scope="module")
def mnist_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mnist")
    synthetic_mnist_npz(str(root / "mnist.npz"), n_per_split=(600, 100, 100))
    return str(root)


class TestAnomalySplit:
    def test_train_has_no_heldout_digit_and_zero_labels(self, mnist_root):
        imgs, lbls = load_mnist_anomaly(mnist_root, heldout=1, split="train")
        assert imgs.shape[1:] == (28, 28, 1)
        assert imgs.dtype == np.float32
        assert imgs.min() >= -1.0 and imgs.max() <= 1.0
        assert np.all(lbls == 0)  # train is all-normal

    def test_test_split_contains_all_anomalies(self, mnist_root):
        data = dict(np.load(f"{mnist_root}/mnist.npz"))
        full_y = np.concatenate([data["y_train"], data["y_test"], data["y_valid"]])
        n_anom = int((full_y == 1).sum())
        n_normal = int((full_y != 1).sum())

        imgs_tr, _ = load_mnist_anomaly(mnist_root, heldout=1, split="train")
        imgs_te, lbls_te = load_mnist_anomaly(mnist_root, heldout=1, split="test")
        assert int(lbls_te.sum()) == n_anom  # every anomaly is in test
        # 80/20 normal split (`data/dataset.py:286-295`)
        assert len(imgs_tr) == int(n_normal * 0.8)
        assert len(imgs_te) == n_normal - int(n_normal * 0.8) + n_anom

    def test_split_is_deterministic_and_cached(self, mnist_root):
        a_imgs, a_lbls = load_mnist_anomaly(mnist_root, heldout=4, split="test")
        # Second call hits the .npy cache (`data/dataset.py:271-276`).
        import os

        assert os.path.exists(f"{mnist_root}/heldout_4_test.npy")
        b_imgs, b_lbls = load_mnist_anomaly(mnist_root, heldout=4, split="test")
        np.testing.assert_array_equal(a_imgs, b_imgs)
        np.testing.assert_array_equal(a_lbls, b_lbls)

    def test_adapt_labels(self):
        y = np.array([0, 1, 2, 1, 9])
        np.testing.assert_array_equal(adapt_labels(y, 1), [0, 1, 0, 1, 0])
        np.testing.assert_array_equal(adapt_labels(y, 0), [1, 0, 0, 0, 0])


class TestLoader:
    def test_shapes_and_range_uint8(self):
        imgs = np.random.RandomState(0).randint(0, 256, (50, 8, 8, 3), np.uint8)
        loader = Loader(imgs, batch_size=16, drop_last=True, seed=0)
        batches = list(loader)
        assert len(batches) == 3  # 50 // 16
        x, idx = batches[0]
        assert x.shape == (16, 8, 8, 3) and x.dtype == np.float32
        assert x.min() >= -1.0 and x.max() <= 1.0
        assert idx.shape == (16,)

    def test_epoch_shuffling_differs(self):
        imgs = np.arange(40, dtype=np.uint8).reshape(40, 1, 1, 1)
        loader = Loader(imgs, batch_size=40, drop_last=True, shuffle=True, seed=0)
        (x1, i1), = list(loader)
        (x2, i2), = list(loader)
        assert not np.array_equal(i1, i2)

    def test_stream_cycles(self):
        imgs = np.zeros((20, 2, 2, 1), np.uint8)
        stream = Loader(imgs, batch_size=8, seed=0).stream()
        for _ in range(7):  # > one epoch (2 batches/epoch with drop_last)
            x, _ = next(stream)
            assert x.shape == (8, 2, 2, 1)

    def test_flip_augmentation_flips_some(self):
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 256, (64, 4, 4, 1), np.uint8)
        loader = Loader(imgs, batch_size=64, augment_flip=True, shuffle=False, seed=3)
        x, idx = next(iter(loader))
        ref = imgs.astype(np.float32) / 255.0 * 2 - 1
        flipped = np.array(
            [not np.allclose(x[i], ref[idx[i]]) for i in range(64)]
        )
        assert flipped.any() and not flipped.all()
        # every flipped row equals its mirror
        for i in np.where(flipped)[0]:
            np.testing.assert_allclose(x[i], ref[idx[i]][:, ::-1])
