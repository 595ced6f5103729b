"""Dict-backed stand-in for lmdb.Environment (the exact API surface
LSUNClassImages consumes) — shared by test_lsun.py and test_native_jpeg.py
so the fake cannot drift between files."""

import contextlib


class FakeCursor:
    def __init__(self, store):
        self._store = store

    def iternext(self, keys=True, values=False):
        assert keys and not values  # the reader only lists keys
        return iter(self._store.keys())


class FakeTxn:
    def __init__(self, store):
        self._store = store

    def stat(self):
        return {"entries": len(self._store)}

    def get(self, key):
        return self._store.get(key)

    def cursor(self):
        return FakeCursor(self._store)


class FakeEnv:
    def __init__(self, store):
        self._store = store

    @contextlib.contextmanager
    def begin(self, write=False):
        assert not write
        yield FakeTxn(self._store)
