"""Tracing / profiling hooks (the reference has none — SURVEY.md §5).

Thin, dependency-free instrumentation:
  * `trace(log_dir)` — context manager around `jax.profiler` for TensorBoard/
    Perfetto traces of the jitted train step;
  * `annotate(name)` — a `TraceAnnotation` so phases (Q-sample, posterior
    Langevin, updates) show up as named spans in the trace;
  * `StepTimer` — wall-clock per-phase step timing with EMA smoothing and
    steps/sec, for the metrics stream.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for everything inside the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace (XLA/TPU op annotations)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-phase wall-clock timer with EMA smoothing.

    Usage:
        timer = StepTimer()
        with timer.phase("train_step"):
            state, metrics = step(state, x)
        metrics |= timer.report()

    ATTRIBUTION CAVEAT: phases measure HOST-side wall time under async
    dispatch — a phase that blocks on the device (e.g. a `device_put`
    whose transfer queues behind the in-flight train step) absorbs the
    PREVIOUS phase's device time. The endurance run's `time_s/data`
    0.05-0.19 s read this way: it was the 0.136 s fused step draining, not
    transfer cost (refuted by tools/ab_data_placement.py — device-resident
    vs host feed differ by only ~1% end-to-end at CIFAR scale). For true
    device-time attribution use `annotate`/`trace` (jax.profiler) or time
    a whole block fenced with `force_sync`.
    """

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._avg: Dict[str, float] = {}
        self._last: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self._last[name] = dt
            prev = self._avg.get(name)
            self._avg[name] = dt if prev is None else self.ema * prev + (1 - self.ema) * dt

    def report(self, prefix: str = "time_s/") -> Dict[str, float]:
        out = {f"{prefix}{k}": v for k, v in self._avg.items()}
        for k, v in self._avg.items():
            if v > 0:
                out[f"steps_per_s/{k}"] = 1.0 / v
        return out


def force_sync(x) -> None:
    """Device fence that provably waits: transfer a scalar derived from x.

    On some remote-execution platforms (the axon TPU tunnel)
    `jax.block_until_ready` can return before the device finishes; a scalar
    device-to-host transfer cannot. All benchmarks use this."""
    import jax
    import numpy as np

    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0])
