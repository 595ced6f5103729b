"""Dataset pipelines: MNIST anomaly splits, CIFAR-10, SVHN, image folders.

Self-contained NumPy/PIL loaders (torchvision is not a dependency), feeding
NHWC float32 batches in [-1, 1] — the reference's
`Normalize((0.5,...), (0.5,...))` convention (`train_gen_recon.py:49-57`).

* MNIST anomaly split reproduces `data/dataset.py:231-335` exactly: all
  splits concatenated, held-out digit removed from train, RandomState(42)
  permutations, 80/20 normal split, test = held-out normals + all anomalies,
  labels adapted to {1 = anomalous, 0 = normal}, and the result cached to
  `heldout_{label}_{split}.npy`.
* CIFAR-10 reads the python pickle batches; SVHN reads the .mat files via
  scipy (`train_gen_recon.py:58-69` used torchvision for both).
* ImageFolder walks a directory of images via PIL with center-crop+resize
  (CelebA-64/HQ, FFHQ; `train_gen_recon.py:70-107`).
* LSUN (`data/dataset.py:28-185`): lazy lmdb-backed `LSUNImages` /
  `LSUNClassImages` (batch-indexable, streams through `Loader` without
  materializing the database) + eager `load_lsun`. The lmdb env is
  injectable so the reader is testable without the optional `lmdb` module.

The reference's `__getitem__` swallowed exceptions and silently substituted
sample 0 (`data/dataset.py:317-324`) — a documented bug we do NOT copy;
loading errors here raise.
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Iterator, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# MNIST anomaly detection split (D1)
# --------------------------------------------------------------------------

def adapt_labels(true_labels: np.ndarray, label: int) -> np.ndarray:
    """1 = anomalous (the held-out digit), 0 = normal
    (`data/dataset.py:234-249`)."""
    out = np.zeros_like(true_labels)
    out[true_labels == label] = 1
    return out


def load_mnist_anomaly(
    root: str, heldout: int, split: str, cache: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (images (N, 28, 28, 1) float32 in [-1, 1], labels (N,) int)."""
    assert split in ("train", "test")
    cache_path = osp.join(root, f"heldout_{heldout}_{split}.npy")
    if cache and osp.exists(cache_path):
        dataset = np.load(cache_path, allow_pickle=True).item()
        imgs, lbls = dataset["img"], dataset["lbl"]
    else:
        data = dict(np.load(osp.join(root, "mnist.npz")))
        full_x = np.concatenate(
            [data["x_train"], data["x_test"], data["x_valid"]], axis=0
        )
        full_y = np.concatenate(
            [data["y_train"], data["y_test"], data["y_valid"]], axis=0
        )

        normal_x = full_x[full_y != heldout]
        normal_y = full_y[full_y != heldout]

        rng = np.random.RandomState(42)
        inds = rng.permutation(normal_x.shape[0])
        normal_x, normal_y = normal_x[inds], normal_y[inds]

        index = int(normal_x.shape[0] * 0.8)
        if split == "train":
            imgs, lbls = normal_x[:index], adapt_labels(normal_y[:index], heldout)
        else:
            test_x = np.concatenate(
                [normal_x[index:], full_x[full_y == heldout]], axis=0
            )
            test_y = np.concatenate(
                [normal_y[index:], full_y[full_y == heldout]], axis=0
            )
            inds = rng.permutation(test_x.shape[0])
            imgs, lbls = test_x[inds], adapt_labels(test_y[inds], heldout)
        if cache:
            np.save(cache_path, {"img": imgs, "lbl": lbls})

    imgs = np.asarray(imgs)
    if imgs.dtype == np.uint8:
        imgs = imgs.astype(np.float32) / 255.0
    imgs = imgs.reshape(-1, 28, 28, 1).astype(np.float32)
    return imgs * 2.0 - 1.0, np.asarray(lbls).astype(np.int32)


# --------------------------------------------------------------------------
# CIFAR-10 / SVHN (self-contained readers)
# --------------------------------------------------------------------------

def load_cifar10(root: str, split: str = "train") -> np.ndarray:
    """(N, 32, 32, 3) uint8 from the python-version pickle batches."""
    base = osp.join(root, "cifar-10-batches-py")
    files = (
        [f"data_batch_{i}" for i in range(1, 6)] if split == "train" else ["test_batch"]
    )
    chunks = []
    for f in files:
        with open(osp.join(base, f), "rb") as fh:
            entry = pickle.load(fh, encoding="latin1")
        chunks.append(np.asarray(entry["data"], np.uint8))
    data = np.concatenate(chunks, axis=0).reshape(-1, 3, 32, 32)
    return data.transpose(0, 2, 3, 1)


def load_svhn(root: str, split: str = "train") -> np.ndarray:
    """(N, 32, 32, 3) uint8 from SVHN's {split}_32x32.mat."""
    from scipy import io as sio

    mat = sio.loadmat(osp.join(root, f"{split}_32x32.mat"))
    return np.transpose(mat["X"], (3, 0, 1, 2)).astype(np.uint8)


def load_image_folder(
    root: str, size: int, limit: Optional[int] = None
) -> np.ndarray:
    """(N, size, size, 3) uint8 via PIL: shorter-side resize (torchvision
    `Resize(size)` semantics) then center crop."""
    from PIL import Image

    exts = (".png", ".jpg", ".jpeg", ".webp", ".bmp")
    paths = []
    for dirpath, _, filenames in sorted(os.walk(root)):
        for fn in sorted(filenames):
            if fn.lower().endswith(exts):
                paths.append(osp.join(dirpath, fn))
    if limit is not None:
        paths = paths[:limit]
    if not paths:
        raise FileNotFoundError(f"no images under {root}")
    out = np.empty((len(paths), size, size, 3), np.uint8)
    for i, p in enumerate(paths):
        img = Image.open(p).convert("RGB")
        w, h = img.size
        scale = size / min(w, h)
        img = img.resize((max(size, round(w * scale)), max(size, round(h * scale))), Image.BILINEAR)
        w, h = img.size
        left, top = (w - size) // 2, (h - size) // 2
        out[i] = np.asarray(img.crop((left, top, left + size, top + size)))
    return out


def load_image_folder_cached(
    root: str, size: int, cache_path: Optional[str] = None
) -> np.ndarray:
    """Folder -> uint8 (N, size, size, 3) memory-mapped .npy cache.

    FFHQ/CelebA-HQ-scale folders (70k x 256^2 x 3 = ~13 GB) should not live in
    RAM: the first call decodes once into `<root>_<size>.npy`, subsequent
    calls mmap it read-only. The native C++ loader reads straight from the
    mapped pages (it borrows the pointer), so steady-state training touches
    only the pages of the current batches.
    """
    cache_path = cache_path or (root.rstrip("/") + f"_{size}.npy")
    if not osp.exists(cache_path):
        data = load_image_folder(root, size)
        np.save(cache_path, data)
        del data
    return np.load(cache_path, mmap_mode="r")


# --------------------------------------------------------------------------
# LSUN (lmdb-backed; D2)
# --------------------------------------------------------------------------

LSUN_CATEGORIES = (
    "bedroom", "bridge", "church_outdoor", "classroom", "conference_room",
    "dining_room", "kitchen", "living_room", "restaurant", "tower",
)


def _open_lmdb_env(path: str):
    """Open an LSUN lmdb database read-only (reference `data/dataset.py:36`:
    single reader, no lock/readahead/meminit — the access pattern is random
    point reads of jpeg blobs).

    Prefers the `lmdb` package when installed; otherwise falls back to the
    repo's native read-only parser (`native/lmdb_reader.cpp` via
    `data/native_lmdb.py`), which serves the same point-read/key-scan
    surface straight off the memory-mapped data.mdb."""
    try:
        import lmdb
    except ImportError as e:
        from .native_lmdb import NativeLMDBEnv, native_lmdb_available

        if native_lmdb_available():
            return NativeLMDBEnv(path)
        raise ImportError(
            "LSUN requires the `lmdb` package (not installed) or the native "
            "reader (no C++ toolchain found to build it); install either, "
            "pass a compatible `env` object to LSUNClassImages, or convert "
            "the data to an image folder and use load_image_folder()."
        ) from e
    return lmdb.open(
        path, max_readers=1, readonly=True, lock=False,
        readahead=False, meminit=False,
    )


def _decode_crop_resize(imgbuf: bytes, size: int) -> np.ndarray:
    """jpeg bytes -> uint8 (size, size, 3): center-crop to the short side,
    then antialiased resize (reference `data/dataset.py:47-64`)."""
    import io

    from PIL import Image

    img = np.asarray(Image.open(io.BytesIO(imgbuf)).convert("RGB"))
    crop = min(img.shape[:2])
    top = (img.shape[0] - crop) // 2
    left = (img.shape[1] - crop) // 2
    img = img[top : top + crop, left : left + crop]
    # Image.ANTIALIAS in the reference is the (now-removed) alias of LANCZOS.
    return np.asarray(
        Image.fromarray(img, "RGB").resize((size, size), Image.LANCZOS)
    )


class LSUNClassImages:
    """One LSUN class database as a lazily-decoded, batch-indexable array.

    Mirrors reference `LSUNClass` (`data/dataset.py:28-75`): lmdb point reads
    by key, key list cached to a pickle (stored INSIDE the db directory as
    `_keys_cache.pkl` — the reference writes `_cache_<letters>` into the CWD,
    `data/dataset.py:38-44`, a working-directory pollution quirk not worth
    copying), center-crop + resize decode per item.

    Supports `len()` and fancy indexing with an int or an index array
    (returning a uint8 (B, size, size, 3) batch), which is exactly the
    surface `Loader`/the native loader need — so LSUN streams through the
    same pipeline as every other dataset without materializing the ~100 GB
    database in RAM.

    `env` is injectable: anything with `begin()` returning a context manager
    whose value has `.stat()["entries"]`, `.get(key)`, and
    `.cursor().iternext(keys=True, values=False)` works (tests use a
    filesystem-backed fake; production uses lmdb).
    """

    def __init__(self, root: str, size: int = 256, env=None, cache_keys: bool = True):
        self.root = root
        self.size = size
        self.env = env if env is not None else _open_lmdb_env(root)
        with self.env.begin() as txn:
            self.length = int(txn.stat()["entries"])
        cache_path = osp.join(root, "_keys_cache.pkl")
        if cache_keys and osp.isfile(cache_path):
            with open(cache_path, "rb") as fh:
                self.keys = pickle.load(fh)
        else:
            with self.env.begin() as txn:
                self.keys = list(txn.cursor().iternext(keys=True, values=False))
            if cache_keys and osp.isdir(root):
                # Atomic + best-effort: dataset mounts are often read-only
                # (GCS fuse / shared NFS on TPU VMs) — a failed cache write
                # must not abort construction when all READS work; and a
                # temp-file + rename keeps concurrent hosts from ever
                # observing a torn pickle.
                try:
                    tmp = cache_path + f".tmp.{os.getpid()}"
                    with open(tmp, "wb") as fh:
                        pickle.dump(self.keys, fh)
                    os.replace(tmp, cache_path)
                except OSError as e:
                    print(f"[damc] lsun key cache not written ({e}); "
                          "continuing uncached")
        if len(self.keys) != self.length:
            raise ValueError(
                f"stale key cache for {root}: {len(self.keys)} keys vs "
                f"{self.length} entries; delete _keys_cache.pkl"
            )

    def __len__(self) -> int:
        return self.length

    def _get_buf(self, index: int) -> bytes:
        with self.env.begin() as txn:
            imgbuf = txn.get(self.keys[int(index)])
        if imgbuf is None:
            raise KeyError(f"missing lmdb key at index {index} in {self.root}")
        return bytes(imgbuf)

    def _get_one(self, index: int) -> np.ndarray:
        return _decode_crop_resize(self._get_buf(index), self.size)

    def __getitem__(self, index):
        if np.isscalar(index) or isinstance(index, (int, np.integer)):
            return self._get_one(int(index))
        index = np.asarray(index)
        bufs = [self._get_buf(int(j)) for j in index]
        # Batch fast path: LSUN blobs are JPEG — decode+crop+Lanczos in the
        # native C++ thread pool (damc_tpu/data/native_jpeg.py). Non-JPEG
        # payloads (or no toolchain) fall back to the PIL path per item.
        if bufs and all(b[:2] == b"\xff\xd8" for b in bufs):
            from .native_jpeg import decode_crop_resize_batch, native_jpeg_available

            if native_jpeg_available():
                # strict=False + per-item PIL retry: libjpeg cannot convert
                # CMYK/YCCK (Adobe) sources to RGB, but PIL's convert('RGB')
                # can — one Adobe-encoded image must not abort the batch.
                # Genuinely corrupt data still raises (from the PIL path):
                # the reference's silent substitute-sample-0 bug
                # (`data/dataset.py:317-324`) stays fixed.
                out, ok = decode_crop_resize_batch(bufs, self.size, strict=False)
                for i in np.nonzero(~ok)[0]:
                    out[i] = _decode_crop_resize(bufs[int(i)], self.size)
                return out
        out = np.empty((len(index), self.size, self.size, 3), np.uint8)
        for i, b in enumerate(bufs):
            out[i] = _decode_crop_resize(b, self.size)
        return out


class LSUNImages:
    """Multi-class LSUN view with cumulative indexing (reference `LSUN`,
    `data/dataset.py:77-185`): class c lives at `<root>/<c>_lmdb`.

    `classes` is a list like `['tower_train']` (the reference's
    eval_stylegan_inv usage, `eval_stylegan_inv.py:75-77`) or 'train'/'val'/
    'test' to expand over all ten categories. Same batch-indexable surface
    as `LSUNClassImages`.
    """

    def __init__(self, root: str, classes="train", size: int = 256, envs=None):
        self.classes = self._expand_classes(classes)
        self.dbs = [
            LSUNClassImages(
                osp.join(root, f"{c}_lmdb"),
                size=size,
                env=None if envs is None else envs[i],
            )
            for i, c in enumerate(self.classes)
        ]
        self.cum = np.cumsum([len(db) for db in self.dbs])
        self.size = size

    @staticmethod
    def _expand_classes(classes):
        if isinstance(classes, str):
            if classes == "test":
                return ["test"]
            if classes in ("train", "val"):
                return [f"{c}_{classes}" for c in LSUN_CATEGORIES]
            classes = [classes]
        classes = list(classes)
        for c in classes:
            cat, _, split = c.rpartition("_")
            if c != "test" and (cat not in LSUN_CATEGORIES or split not in ("train", "val")):
                raise ValueError(
                    f"unknown LSUN class {c!r}; valid: <category>_<train|val> "
                    f"with category in {LSUN_CATEGORIES} or 'test'"
                )
        return classes

    def __len__(self) -> int:
        return int(self.cum[-1]) if len(self.dbs) else 0

    def _get_one(self, index: int) -> np.ndarray:
        db_i = int(np.searchsorted(self.cum, index, side="right"))
        base = 0 if db_i == 0 else int(self.cum[db_i - 1])
        return self.dbs[db_i][index - base]

    def __getitem__(self, index):
        if np.isscalar(index) or isinstance(index, (int, np.integer)):
            return self._get_one(int(index))
        # Partition the batch per class-db so each sub-batch hits
        # LSUNClassImages' batch path (native JPEG thread pool) instead of
        # one-by-one PIL decodes.
        index = np.asarray(index)
        out = np.empty((len(index), self.size, self.size, 3), np.uint8)
        db_ids = np.searchsorted(self.cum, index, side="right")
        for db_i in np.unique(db_ids):
            sel = np.nonzero(db_ids == db_i)[0]
            base = 0 if db_i == 0 else int(self.cum[db_i - 1])
            out[sel] = self.dbs[int(db_i)][index[sel] - base]
        return out


def load_lsun(root: str, classes, size: int = 256, limit: Optional[int] = None) -> np.ndarray:
    """Eagerly decode LSUN into a uint8 (N, size, size, 3) array.

    For training-scale use prefer `LSUNImages` directly with `Loader` (lazy
    per-batch decode); this eager form mirrors the other `load_*` helpers
    for small evals. Requires `lmdb` (reference `data/dataset.py:28-185`).
    """
    view = LSUNImages(root, classes, size=size)
    n = len(view) if limit is None else min(limit, len(view))
    return view[np.arange(n)]


# --------------------------------------------------------------------------
# Batching
# --------------------------------------------------------------------------

class Loader:
    """Epoch-shuffled batch iterator with optional horizontal-flip augment.

    Yields (images float32 [-1,1] NHWC, indices) like the reference's patched
    CIFAR10 (`data/dataset.py:192-225` returns (img, index)). Accepts uint8
    [0,255] or float32 [-1,1] storage; converts per batch to keep the resident
    copy small. Infinite iteration via `stream()` replaces the reference's
    StopIteration/re-iter dance (`train_gen_recon.py:180-185`).
    """

    def __init__(
        self,
        images: np.ndarray,
        labels: Optional[np.ndarray] = None,
        batch_size: int = 128,
        shuffle: bool = True,
        drop_last: bool = True,
        augment_flip: bool = False,
        seed: int = 0,
    ):
        self.images = images
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.augment_flip = augment_flip
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.images)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _to_float(self, batch: np.ndarray) -> np.ndarray:
        if batch.dtype == np.uint8:
            batch = batch.astype(np.float32) / 255.0 * 2.0 - 1.0
        return np.ascontiguousarray(batch, np.float32)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.images)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start : start + self.batch_size]
            batch = self._to_float(self.images[idx])
            if self.augment_flip:
                flip = self._rng.rand(len(idx)) < 0.5
                batch[flip] = batch[flip, :, ::-1]
            lbl = self.labels[idx] if self.labels is not None else idx
            yield batch, lbl

    def stream(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Infinite epoch-cycling stream."""
        if len(self) == 0:
            raise ValueError(
                f"Loader yields no batches: {len(self.images)} images < "
                f"batch_size {self.batch_size} with drop_last — an infinite "
                "stream would spin forever"
            )
        while True:
            yield from self


def synthetic_mnist_npz(path: str, n_per_split=(600, 100, 100), seed: int = 0) -> None:
    """Write a tiny fake mnist.npz (for tests / smoke runs without data)."""
    rng = np.random.RandomState(seed)
    out = {}
    for split, n in zip(("train", "test", "valid"), n_per_split):
        y = rng.randint(0, 10, size=n)
        x = np.zeros((n, 784), np.float32)
        # Give each digit a distinct blocky signature so models can separate.
        for i, digit in enumerate(y):
            img = rng.rand(28, 28) * 0.2
            r, c = divmod(int(digit), 4)
            img[r * 7 : r * 7 + 7, c * 7 : c * 7 + 7] += 0.8
            x[i] = img.reshape(-1)
        out[f"x_{split}"] = x.clip(0, 1)
        out[f"y_{split}"] = y
    np.savez(path, **out)
