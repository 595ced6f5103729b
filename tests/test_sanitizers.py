"""Race-detection / memory-safety harness for the native components.

Builds `native/sanitize_stress.cpp` together with the three native sources
under ThreadSanitizer and AddressSanitizer and runs concurrency/churn
stress over each component (threaded batch loader, JPEG worker pool, LMDB
parser hammered from 4 threads). Sanitizer findings turn into a nonzero
exit code and fail the test. This is the "sanitizers" auxiliary subsystem
(SURVEY.md §5 — the reference has none; fully-instrumented C++ drivers, no
Python in the loop, so TSAN sees every synchronization edge).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_NATIVE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SOURCES = ["sanitize_stress.cpp", "batch_loader.cpp", "jpeg_pipeline.cpp", "lmdb_reader.cpp"]


def _build(tmp_path, sanitizer: str) -> str:
    exe = str(tmp_path / f"stress_{sanitizer}")
    cmd = [
        "g++", "-O1", "-g", f"-fsanitize={sanitizer}", "-fno-omit-frame-pointer",
        "-std=c++17", "-pthread", "-o", exe,
    ] + [os.path.join(_NATIVE, s) for s in _SOURCES] + ["-ljpeg"]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip(f"cannot build with -fsanitize={sanitizer}: {proc.stderr[-400:]}")
    return exe


def _run(exe, args, sanitizer):
    env = dict(os.environ)
    env[f"{'TSAN' if sanitizer == 'thread' else 'ASAN'}_OPTIONS"] = "exitcode=66"
    proc = subprocess.run([exe] + args, capture_output=True, text=True, env=env)
    assert proc.returncode == 0, (
        f"{sanitizer} stress {' '.join(args)} rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-1000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )


def _fixture_db(tmp_path):
    from lmdb_fixture import build_lmdb

    rng = np.random.RandomState(0)
    items = {f"k{i:04d}".encode(): rng.bytes(int(rng.randint(10, 6000))) for i in range(64)}
    return build_lmdb(str(tmp_path / "stress_lmdb"), items)


@pytest.mark.parametrize("sanitizer", ["thread", "address"])
def test_native_components_under_sanitizer(tmp_path, sanitizer):
    exe = _build(tmp_path, sanitizer)
    _run(exe, ["loader"], sanitizer)
    _run(exe, ["jpeg"], sanitizer)
    _run(exe, ["lmdb", _fixture_db(tmp_path)], sanitizer)
