"""Shared build-and-load helper for the native C++ components.

One implementation of the compile-cache discipline used by the batch
loader, the JPEG pipeline, and the LMDB parser: g++ -O3 into
~/.cache/damc, rebuilt when the source is newer, written to a
PER-PROCESS temp file and atomically renamed (concurrent first-use
builds from several processes must not interleave output into one
path), then dlopen'd via ctypes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_CACHE_DIR = os.path.expanduser("~/.cache/damc")


def source_path(src_name: str) -> str:
    return os.path.join(_NATIVE_DIR, src_name)


_compiler_id_cache: Optional[str] = None


def _compiler_id() -> str:
    """`g++ -dumpfullversion` (cached): part of the artifact cache key so a
    toolchain upgrade invalidates previously built libraries."""
    global _compiler_id_cache
    if _compiler_id_cache is None:
        try:
            out = subprocess.run(
                ["g++", "-dumpfullversion", "-dumpversion"],
                capture_output=True, text=True, timeout=10,
            )
            _compiler_id_cache = out.stdout.strip() or "unknown"
        except (OSError, subprocess.SubprocessError):
            _compiler_id_cache = "unknown"
    return _compiler_id_cache


def build_and_load(
    src_name: str, lib_name: str, extra_flags: Sequence[str] = ()
) -> Tuple[Optional[ctypes.CDLL], Optional[str]]:
    """Compile native/<src_name> to ~/.cache/damc/<lib_name> and CDLL it.

    Returns (lib, None) on success, (None, error_message) when the
    toolchain or link dependencies are unavailable.
    """
    src = source_path(src_name)
    # Key the cached artifact on the full compile recipe (source path +
    # flags + compiler identity), not just the source mtime: a library
    # built with stale extra_flags or by an older g++ must not keep being
    # dlopen'd after either changes.
    recipe = f"{src}\x00{' '.join(extra_flags)}\x00{_compiler_id()}"
    tag = hashlib.sha256(recipe.encode()).hexdigest()[:12]
    base, ext = os.path.splitext(lib_name)
    lib_path = os.path.join(_CACHE_DIR, f"{base}.{tag}{ext}")
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        if not (
            os.path.exists(lib_path)
            and os.path.getmtime(lib_path) >= os.path.getmtime(src)
        ):
            tmp = f"{lib_path}.tmp.{os.getpid()}"
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-o", tmp, src, *extra_flags,
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
                os.replace(tmp, lib_path)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        return ctypes.CDLL(lib_path), None
    except (OSError, subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = ""
        if isinstance(e, subprocess.CalledProcessError) and e.stderr:
            detail = ": " + e.stderr.decode(errors="replace")[-300:]
        return None, f"{e}{detail}"


_loaded: dict = {}
_loaded_lock = threading.Lock()


def load_cached(src_name: str, lib_name: str, extra_flags: Sequence[str],
                configure) -> Tuple[Optional[ctypes.CDLL], Optional[str]]:
    """Memoized build_and_load + one-time ctypes configuration.

    `configure(lib)` sets restype/argtypes on first successful load. Returns
    (lib, error); both are cached so repeated failures don't re-invoke g++.
    """
    with _loaded_lock:
        if lib_name not in _loaded:
            lib, err = build_and_load(src_name, lib_name, extra_flags)
            if lib is not None:
                configure(lib)
            _loaded[lib_name] = (lib, err)
        return _loaded[lib_name]
