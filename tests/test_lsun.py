"""LSUN lmdb reader tests (D2, reference `data/dataset.py:28-185`).

The `lmdb` package is not installed in this image, so these tests exercise
the reader through its injectable env seam with a dict-backed fake
implementing the exact lmdb API surface the reader uses (begin() -> txn with
stat()/get()/cursor().iternext()). The decode/crop/resize/indexing logic —
all of the reader's actual behavior — runs for real.
"""

import contextlib
import io
import pickle

import numpy as np
import pytest
from PIL import Image

from damc_tpu.data.datasets import (
    Loader,
    LSUNClassImages,
    LSUNImages,
    _decode_crop_resize,
)


from fake_lmdb import FakeEnv, FakeTxn  # noqa: E402 (shared with test_native_jpeg)


def encode_image(arr: np.ndarray, fmt="PNG") -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, fmt)
    return buf.getvalue()


def make_store(n, h, w, seed=0):
    """n images of shape (h, w, 3) with deterministic content."""
    rng = np.random.RandomState(seed)
    imgs = rng.randint(0, 256, (n, h, w, 3), np.uint8)
    store = {f"key{i:04d}".encode(): encode_image(imgs[i]) for i in range(n)}
    return store, imgs


class TestDecodeCropResize:
    def test_square_passthrough_size(self):
        img = np.random.RandomState(0).randint(0, 256, (16, 16, 3), np.uint8)
        out = _decode_crop_resize(encode_image(img), 16)
        np.testing.assert_array_equal(out, img)  # PNG is lossless, no resize

    def test_center_crop_tall_and_wide(self):
        # 20x12 tall image: crop rows [4, 16) (offset (20-12)//2 = 4).
        img = np.arange(20 * 12 * 3, dtype=np.uint8).reshape(20, 12, 3)
        out = _decode_crop_resize(encode_image(img), 12)
        np.testing.assert_array_equal(out, img[4:16])
        # 12x20 wide image: crop cols [4, 16).
        img_w = img.transpose(1, 0, 2).copy()
        out_w = _decode_crop_resize(encode_image(img_w), 12)
        np.testing.assert_array_equal(out_w, img_w[:, 4:16])

    def test_resize_shape_and_dtype(self):
        img = np.random.RandomState(1).randint(0, 256, (37, 53, 3), np.uint8)
        out = _decode_crop_resize(encode_image(img), 8)
        assert out.shape == (8, 8, 3) and out.dtype == np.uint8


class TestLSUNClassImages:
    def test_len_indexing_and_batch(self, tmp_path):
        store, imgs = make_store(7, 10, 10)
        db = LSUNClassImages(str(tmp_path), size=10, env=FakeEnv(store))
        assert len(db) == 7
        np.testing.assert_array_equal(db[3], imgs[3])
        batch = db[np.array([0, 6, 2])]
        assert batch.shape == (3, 10, 10, 3)
        np.testing.assert_array_equal(batch, imgs[[0, 6, 2]])

    def test_key_cache_written_and_reused(self, tmp_path):
        store, _ = make_store(4, 8, 8)
        LSUNClassImages(str(tmp_path), size=8, env=FakeEnv(store))
        cache = tmp_path / "_keys_cache.pkl"
        assert cache.exists()
        keys = pickle.load(open(cache, "rb"))
        assert keys == list(store.keys())
        # Second open must read the cache, not the cursor.
        class NoCursorTxn(FakeTxn):
            def cursor(self):
                raise AssertionError("cursor used despite warm key cache")

        class NoCursorEnv(FakeEnv):
            @contextlib.contextmanager
            def begin(self, write=False):
                yield NoCursorTxn(self._store)

        db = LSUNClassImages(str(tmp_path), size=8, env=NoCursorEnv(store))
        assert len(db) == 4

    def test_stale_cache_rejected(self, tmp_path):
        store, _ = make_store(4, 8, 8)
        pickle.dump([b"only_one_key"], open(tmp_path / "_keys_cache.pkl", "wb"))
        with pytest.raises(ValueError, match="stale key cache"):
            LSUNClassImages(str(tmp_path), size=8, env=FakeEnv(store))

    def test_missing_key_raises(self, tmp_path):
        store, _ = make_store(2, 8, 8)
        db = LSUNClassImages(str(tmp_path), size=8, env=FakeEnv(store))
        del store[b"key0001"]
        with pytest.raises(KeyError):
            db[1]


class TestLSUNImages:
    def test_multiclass_cumulative_indexing(self, tmp_path):
        (tmp_path / "tower_train_lmdb").mkdir()
        (tmp_path / "bridge_train_lmdb").mkdir()
        s1, imgs1 = make_store(3, 8, 8, seed=1)
        s2, imgs2 = make_store(5, 8, 8, seed=2)
        view = LSUNImages(
            str(tmp_path), ["tower_train", "bridge_train"], size=8,
            envs=[FakeEnv(s1), FakeEnv(s2)],
        )
        assert len(view) == 8
        np.testing.assert_array_equal(view[2], imgs1[2])
        np.testing.assert_array_equal(view[3], imgs2[0])  # crosses db boundary
        batch = view[np.array([0, 3, 7])]
        np.testing.assert_array_equal(batch[0], imgs1[0])
        np.testing.assert_array_equal(batch[2], imgs2[4])

    def test_reference_eval_usage_tower_train(self, tmp_path):
        # eval_stylegan_inv.py:75: LSUN(root, classes=['tower_train'])
        (tmp_path / "tower_train_lmdb").mkdir()
        s, imgs = make_store(2, 8, 8)
        view = LSUNImages(str(tmp_path), ["tower_train"], size=8, envs=[FakeEnv(s)])
        np.testing.assert_array_equal(view[1], imgs[1])

    def test_invalid_class_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="unknown LSUN class"):
            LSUNImages(str(tmp_path), ["castle_train"], size=8, envs=[None])

    def test_streams_through_loader(self, tmp_path):
        (tmp_path / "tower_val_lmdb").mkdir()
        s, imgs = make_store(10, 8, 8)
        view = LSUNImages(str(tmp_path), ["tower_val"], size=8, envs=[FakeEnv(s)])
        loader = Loader(view, batch_size=4, shuffle=False, drop_last=True, seed=0)
        x, idx = next(iter(loader))
        assert x.shape == (4, 8, 8, 3) and x.dtype == np.float32
        ref = imgs[:4].astype(np.float32) / 255.0 * 2 - 1
        np.testing.assert_allclose(x, ref)


def test_lmdb_gate_message():
    """Without the lmdb package the native parser takes over; a path that is
    not a database raises a pointed OSError (or, with no toolchain to build
    the parser either, an ImportError explaining the fix)."""
    try:
        import lmdb  # noqa: F401

        pytest.skip("lmdb installed; gate not reachable")
    except ImportError:
        pass
    from damc_tpu.data.datasets import _open_lmdb_env
    from damc_tpu.data.native_lmdb import native_lmdb_available

    if native_lmdb_available():
        with pytest.raises(OSError, match="LMDB"):
            _open_lmdb_env("/nonexistent")
    else:
        with pytest.raises(ImportError, match="lmdb"):
            _open_lmdb_env("/nonexistent")
