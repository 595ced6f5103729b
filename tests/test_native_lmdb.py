"""Native read-only LMDB parser vs spec-conformant fixture databases.

The fixture writer (tests/lmdb_fixture.py) and the C++ reader
(native/lmdb_reader.cpp) encode the on-disk format independently; these
tests drive point reads, ordered scans, meta-page selection, overflow
chains, and deep trees through the real `data.mdb` bytes, then run the full
LSUN pipeline (LSUNClassImages -> Loader) over a database of real JPEGs.
"""

import io
import os

import numpy as np
import pytest

from lmdb_fixture import PSIZE, build_lmdb

from damc_tpu.data.datasets import LSUNClassImages, Loader, _open_lmdb_env
from damc_tpu.data.native_lmdb import NativeLMDBEnv, native_lmdb_available

pytestmark = pytest.mark.skipif(
    not native_lmdb_available(), reason="no C++ toolchain to build the reader"
)


def _items_small(n=64, seed=0):
    rng = np.random.RandomState(seed)
    return {
        f"key_{i:05d}".encode(): rng.bytes(int(rng.randint(1, 400)))
        for i in range(n)
    }


def test_point_reads_and_missing(tmp_path):
    items = _items_small()
    path = build_lmdb(str(tmp_path / "db_lmdb"), items)
    env = NativeLMDBEnv(path)
    with env.begin() as txn:
        assert txn.stat()["entries"] == len(items)
        for k, v in items.items():
            assert txn.get(k) == v
        assert txn.get(b"absent") is None
        assert txn.get(b"") is None
        assert txn.get(b"zzzz_beyond_all") is None
    env.close()


def test_key_scan_is_sorted_and_complete(tmp_path):
    items = _items_small(n=200, seed=1)
    path = build_lmdb(str(tmp_path / "db_lmdb"), items)
    env = NativeLMDBEnv(path)
    with env.begin() as txn:
        keys = list(txn.cursor().iternext(keys=True, values=False))
    assert keys == sorted(items.keys())


def test_overflow_values_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    items = {
        b"small": b"x" * 10,
        b"one_page": rng.bytes(3000),       # 1 overflow page
        b"three_pages": rng.bytes(2 * PSIZE + 500),
        b"ten_pages": rng.bytes(9 * PSIZE + 123),
    }
    env = NativeLMDBEnv(build_lmdb(str(tmp_path / "db_lmdb"), items))
    with env.begin() as txn:
        for k, v in items.items():
            got = txn.get(k)
            assert got == v, k
    env.close()


def test_deep_tree_many_levels(tmp_path):
    # Tiny fanout forces depth >= 4 with few keys; exercises multi-level
    # branch descent and the implicit -inf key on every branch page.
    items = _items_small(n=150, seed=3)
    path = build_lmdb(
        str(tmp_path / "db_lmdb"), items, max_leaf_entries=4, max_branch_entries=3
    )
    env = NativeLMDBEnv(path)
    with env.begin() as txn:
        assert txn.stat()["entries"] == len(items)
        for k, v in items.items():
            assert txn.get(k) == v
        keys = list(txn.cursor().iternext(keys=True, values=False))
    assert keys == sorted(items.keys())


@pytest.mark.parametrize("live_slot", [0, 1])
def test_meta_page_selection_by_txnid(tmp_path, live_slot):
    # The stale meta (lower txnid) describes an EMPTY database — picking the
    # wrong one is caught by the entry count, regardless of slot order.
    items = _items_small(n=16, seed=4)
    path = build_lmdb(
        str(tmp_path / f"db{live_slot}_lmdb"), items, live_meta_slot=live_slot
    )
    env = NativeLMDBEnv(path)
    with env.begin() as txn:
        assert txn.stat()["entries"] == len(items)
        assert txn.get(b"key_00003") == items[b"key_00003"]
    env.close()


def test_nosubdir_layout_and_empty_db(tmp_path):
    items = _items_small(n=8, seed=5)
    file_path = str(tmp_path / "standalone.mdb")
    build_lmdb(file_path, items, subdir=False)
    env = NativeLMDBEnv(file_path)
    with env.begin() as txn:
        assert txn.get(b"key_00000") == items[b"key_00000"]

    empty = NativeLMDBEnv(build_lmdb(str(tmp_path / "empty_lmdb"), {}))
    with empty.begin() as txn:
        assert txn.stat()["entries"] == 0
        assert txn.get(b"anything") is None
        assert list(txn.cursor().iternext(keys=True, values=False)) == []


def test_fuzz_corrupted_databases_never_crash(tmp_path):
    """Random byte corruptions of a valid database must surface as clean
    Python exceptions (or silently-wrong-but-bounded reads), never as
    memory errors — exercises every bounds check in the C++ walker. A
    segfault would abort the test process, so passing is the evidence."""
    items = _items_small(n=120, seed=11)
    items[b"big_val"] = np.random.RandomState(12).bytes(2 * PSIZE)
    base_dir = tmp_path / "base_lmdb"
    build_lmdb(str(base_dir), items, max_leaf_entries=8, max_branch_entries=4)
    base = (base_dir / "data.mdb").read_bytes()

    rng = np.random.RandomState(13)
    probe_keys = list(items.keys())[::7] + [b"big_val", b"absent"]
    for trial in range(120):
        data = bytearray(base)
        for _ in range(int(rng.randint(1, 8))):
            data[int(rng.randint(0, len(data)))] = int(rng.randint(0, 256))
        d = tmp_path / f"fuzz_{trial}_lmdb"
        d.mkdir(exist_ok=True)
        (d / "data.mdb").write_bytes(bytes(data))
        try:
            env = NativeLMDBEnv(str(d))
        except OSError:
            continue  # corrupted meta rejected cleanly
        try:
            with env.begin() as txn:
                txn.stat()
                for k in probe_keys:
                    try:
                        txn.get(k)
                    except OSError:
                        pass
                try:
                    list(txn.cursor().iternext(keys=True, values=False))
                except OSError:
                    pass
        finally:
            env.close()


def test_corrupt_leaf_lower_field_is_bounded(tmp_path):
    """Regression for the review finding: a leaf page whose `lower` field is
    0xFFFF must not send the node-pointer reads past the page/mmap (the
    scenario randomized fuzzing is unlikely to hit: the LAST page of the
    file with a maximal lower)."""
    import struct

    items = _items_small(n=40, seed=21)
    d = tmp_path / "corrupt_lower_lmdb"
    build_lmdb(str(d), items, max_leaf_entries=6)
    path = d / "data.mdb"
    data = bytearray(path.read_bytes())
    # Corrupt `lower` (offset 12) of EVERY leaf page (flags==P_LEAF at
    # offset 10) — including the final page of the file.
    n_leaves = 0
    for off in range(0, len(data), PSIZE):
        if struct.unpack_from("<H", data, off + 10)[0] == 0x02:
            struct.pack_into("<H", data, off + 12, 0xFFFF)
            n_leaves += 1
    assert n_leaves >= 2
    path.write_bytes(bytes(data))

    env = NativeLMDBEnv(str(d))
    with env.begin() as txn:
        for k in list(items)[:10] + [b"absent"]:
            try:
                txn.get(k)
            except OSError:
                pass
        try:
            txn.cursor()
        except OSError:
            pass
    env.close()


def test_rejects_garbage_file(tmp_path):
    bad = tmp_path / "bad_lmdb"
    bad.mkdir()
    (bad / "data.mdb").write_bytes(b"\x00" * (4 * PSIZE))
    with pytest.raises(OSError, match="magic"):
        NativeLMDBEnv(str(bad))
    with pytest.raises(OSError, match="stat|data.mdb"):
        NativeLMDBEnv(str(tmp_path / "does_not_exist"))


def test_write_txn_refused(tmp_path):
    env = NativeLMDBEnv(build_lmdb(str(tmp_path / "db_lmdb"), _items_small(8)))
    with pytest.raises(NotImplementedError):
        env.begin(write=True)


def _jpeg_bytes(rng, h, w):
    from PIL import Image

    arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def test_lsun_pipeline_over_native_env(tmp_path):
    """Full LSUN surface on a native-parsed database of real JPEGs — the
    production path when the `lmdb` package is absent (reference
    `data/dataset.py:28-75` semantics)."""
    rng = np.random.RandomState(7)
    items = {
        f"{i:08x}".encode(): _jpeg_bytes(rng, 96 + 16 * (i % 3), 128) for i in range(24)
    }
    root = build_lmdb(str(tmp_path / "tower_train_lmdb"), items)

    ds = LSUNClassImages(root, size=64, env=NativeLMDBEnv(root))
    assert len(ds) == 24
    one = ds[0]
    assert one.shape == (64, 64, 3) and one.dtype == np.uint8
    batch = ds[np.arange(8)]
    assert batch.shape == (8, 64, 64, 3)
    # single-item decode uses PIL, batches the native JPEG pipeline; the two
    # Lanczos implementations agree closely but not exactly
    diff = np.abs(batch[0].astype(int) - one.astype(int))
    assert diff.max() <= 16 and diff.mean() < 2.0

    # Through the standard Loader (the training-time surface).
    loader = Loader(ds, batch_size=6, shuffle=True, drop_last=True, seed=0)
    xb, idx = next(iter(loader))
    assert xb.shape == (6, 64, 64, 3) and xb.dtype == np.float32
    assert xb.min() >= -1.0 and xb.max() <= 1.0

    # Key cache pickle round-trips against the native env too.
    ds2 = LSUNClassImages(root, size=64, env=NativeLMDBEnv(root))
    assert ds2.keys == ds.keys

    # And the eager helper with NO injected env — the production entry that
    # used to require the lmdb package (reference `data/dataset.py:28-185`).
    from damc_tpu.data.datasets import load_lsun

    arr = load_lsun(str(tmp_path), ["tower_train"], size=32, limit=5)
    assert arr.shape == (5, 32, 32, 3) and arr.dtype == np.uint8


def test_open_lmdb_env_falls_back_to_native(tmp_path):
    """Without the `lmdb` package installed, _open_lmdb_env returns the
    native env (this image has no lmdb, so this tests the real path)."""
    try:
        import lmdb  # noqa: F401

        pytest.skip("lmdb package installed; fallback not reachable")
    except ImportError:
        pass
    root = build_lmdb(str(tmp_path / "db_lmdb"), _items_small(8))
    env = _open_lmdb_env(root)
    assert isinstance(env, NativeLMDBEnv)
    with env.begin() as txn:
        assert txn.stat()["entries"] == 8
