"""Shared host-loop plumbing for the training drivers.

gen_recon and anomaly (and any future driver) share the same non-numeric
scaffolding: resume-path resolution (incl. the 'auto' preemption-recovery
mode), the mesh/jit wiring of the fused train step, loader stream
construction with background prefetch for non-native loaders, and the
graceful-preemption checkpoint. One implementation keeps the two drivers
in lockstep.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np

from ..parallel import batch_sharding, replicate, replicated
from ..utils.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from ..utils.logging import MetricsLogger
from .step import make_train_step


def resolve_resume_path(resume_path: Optional[str], ckpt_dir: Optional[str]) -> Optional[str]:
    """'auto' -> newest integer checkpoint in this run's ckpt dir (None when
    the run is fresh); anything else passes through.

    Multi-host: every process must restore the SAME checkpoint. An explicit
    path is identical on all hosts by construction (same CLI args), but the
    'auto' listing races on a shared filesystem — host A's directory view
    can show a checkpoint host B's NFS cache does not yet, and restoring
    different states silently diverges the "replicated" params. Host 0's
    resolved step is therefore broadcast, mirroring make_log_dir. (Torn
    directories from a hard-killed save are already excluded: orbax
    finalizes via atomic tmp-suffix rename, and latest_step only accepts
    integer-named dirs.)"""
    if resume_path != "auto":
        return resume_path
    step_no = latest_step(ckpt_dir) if ckpt_dir else None
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        step_no = int(
            multihost_utils.broadcast_one_to_all(
                np.int64(-1 if step_no is None else step_no)
            )
        )
        if step_no < 0:
            step_no = None
    return os.path.join(ckpt_dir, str(step_no)) if step_no is not None else None


def restore_for_resume(state, resume_path: Optional[str], ckpt_dir: Optional[str]):
    """Returns (state, start_iter), restoring the FULL pytree when resuming
    (incl. EBM, EMA params, optimizer states, PRNG — fixing the reference's
    partial-resume bug, `train_gen_recon.py:163-170`)."""
    resume_path = resolve_resume_path(resume_path, ckpt_dir)
    if not resume_path:
        return state, 0
    directory, name = os.path.split(resume_path.rstrip("/"))
    state = restore_checkpoint(directory, name, state)
    start_iter = int(state.step)
    print(f"[damc] resumed from {resume_path} at iteration {start_iter}")
    return state, start_iter


def make_step_fn(models, opts, cfg, mesh, state):
    """Jit the fused train step (donated state; DP shardings under a mesh).
    Returns (step_fn, state) — the state is device_put-replicated when a
    mesh is active."""
    if mesh is not None:
        n_data = mesh.shape["data"]
        if cfg.train.batch_size % n_data:
            raise ValueError(
                f"batch_size {cfg.train.batch_size} does not divide over the "
                f"data axis ({n_data} devices) — sharded device_put of the "
                "training batch would fail at the first step"
            )
        state = replicate(mesh, state)
        # Pass the mesh into the step builder: the fused Pallas kernels have
        # no GSPMD partitioning rule and must dispatch through shard_map
        # over the data axis (ops/pallas/*_sharded).
        step = jax.jit(
            make_train_step(models, opts, cfg, mesh=mesh),
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=(replicated(mesh), replicated(mesh)),
            donate_argnums=0,
        )
    else:
        step = jax.jit(make_train_step(models, opts, cfg), donate_argnums=0)
    return step, state


def put_batch(mesh, x_np):
    """Device-put one training batch for the step fn.

    Single-host mesh: shard rows over `data`. Multi-host mesh: `x_np` is this
    HOST's local slice of the global batch (global = local * process_count);
    assemble via make_global_batch so rows land on the host that loaded them
    (a plain device_put to a cross-process sharding would fail on the
    non-addressable devices)."""
    if mesh is None:
        return jax.device_put(x_np)
    if jax.process_count() > 1:
        from ..parallel.distributed import make_global_batch

        return make_global_batch(mesh, x_np)
    return jax.device_put(x_np, batch_sharding(mesh))


def host_shard(images):
    """This host's DISJOINT partition of the training set for multi-host
    runs (strided so class/ordering structure spreads evenly). Each host
    then epoch-shuffles its OWN partition — the union of the per-host
    loader streams visits every image exactly once per epoch, like the
    reference's single-process full shuffle. Single-process: identity."""
    n = jax.process_count()
    if n == 1:
        return images
    return images[jax.process_index()::n]


def local_batch_size(global_batch: int) -> int:
    """Per-host share of the global training batch (multi-host runs feed
    per-host loader slices; single-process returns global_batch)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch_size {global_batch} must divide across "
            f"{n} processes"
        )
    return global_batch // n


def is_primary_host() -> bool:
    return jax.process_index() == 0


def host_local_state(state):
    """Pull a (replicated) multi-host state down to host-local numpy so it
    can be checkpointed / evaluated without touching non-addressable
    devices. No-op copy semantics for fully-addressable arrays."""

    def pull(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            return np.asarray(a.addressable_data(0))
        return a

    return jax.tree.map(pull, state)


def init_driver_logging(log_dir: Optional[str], use_mesh: bool):
    """Shared driver preamble: multi-host validation + primary-host-only
    jsonl/side-artifact policy. Returns (logger, ckpt_dir, log_dir,
    multihost) — `ckpt_dir` stays set on EVERY host (orbax saves are
    coordinated all-host writes), while the returned `log_dir` is nulled on
    non-primary hosts so jsonl metrics and image grids are written once."""
    multihost = jax.process_count() > 1
    if multihost and not use_mesh:
        raise ValueError(
            "multi-host training requires use_mesh=True: without a global "
            "mesh each process would silently train an independent model on "
            "its own data shard while writing to a shared checkpoint path "
            "(the CLI's --multihost sets this automatically)"
        )
    ckpt_dir = os.path.join(log_dir, "ckpt") if log_dir else None
    if multihost and not is_primary_host():
        log_dir = None
    logger = MetricsLogger(log_dir, echo=is_primary_host())
    return logger, ckpt_dir, log_dir, multihost


def cd_history_path(logger_path: Optional[str], resume_path: Optional[str]) -> Optional[str]:
    """metrics.jsonl to replay into the CD-gap monitor on resume.

    `--resume_path auto` relaunches into the original run dir, so the
    current logger's jsonl IS the pre-resume history. An EXPLICIT
    `--resume_path <run>/ckpt/<step>` lands in a freshly-stamped dir whose
    jsonl is empty — without a fallback the monitor would re-learn its
    warmup baseline from post-resume (possibly already-runaway) gaps and
    silently disarm. Fall back to the resumed run's own metrics.jsonl, two
    levels up from the checkpoint step dir."""
    if logger_path and os.path.exists(logger_path) and os.path.getsize(logger_path):
        return logger_path
    if resume_path and resume_path != "auto":
        run_dir = os.path.dirname(os.path.dirname(resume_path.rstrip("/")))
        cand = os.path.join(run_dir, "metrics.jsonl")
        if os.path.exists(cand):
            return cand
    return logger_path


def make_stream(loader):
    """loader.stream(), with background prefetch for loaders that do not
    already overlap batch assembly (the native C++ engine does)."""
    stream = loader.stream()
    if not getattr(loader, "native_prefetch", False):
        from ..data.prefetch import Prefetcher

        stream = Prefetcher(stream, depth=2)
    return stream


def make_batch_source(train_images, tc, mesh, seed, augment_flip=True):
    """One `next_batch()` per training iteration, device-ready either way.

    Placement (`tc.data_placement`):
      * 'device', or 'auto' when eligible (single-host + materialized
        array store under the HBM budget): `DeviceDataset` — the whole
        store lives in HBM; each batch is an on-device gather/flip (and
        carries the mesh `data` sharding) with ZERO per-iteration
        host→device transfer. On this platform the per-batch transfer is
        the training loop's wall bottleneck (data/device_data.py).
      * 'host', or the fallback: host loader (native C++ engine when
        possible) with background prefetch, then `put_batch`.

    Returns (next_batch, close, placement_str)."""
    placement = getattr(tc, "data_placement", "auto")
    if placement not in ("auto", "device", "host"):
        raise ValueError(f"data_placement must be auto|device|host, got {placement!r}")
    from ..data.device_data import DEFAULT_DEVICE_BUDGET_BYTES, fits_device

    budget_gb = getattr(tc, "data_device_budget_gb", None)
    budget = (
        int(budget_gb * (1 << 30))
        if budget_gb is not None
        else DEFAULT_DEVICE_BUDGET_BYTES
    )
    eligible = jax.process_count() == 1 and fits_device(train_images, budget)
    if placement == "device" and not eligible:
        raise ValueError(
            "data_placement='device' but the store is ineligible "
            "(multi-host run, lazy dataset, or over the HBM budget) — "
            "use 'auto' or 'host'"
        )
    if placement != "host" and eligible:
        from ..data.device_data import DeviceDataset

        stream = DeviceDataset(
            train_images,
            batch_size=tc.batch_size,
            shuffle=True,
            drop_last=True,
            augment_flip=augment_flip,
            seed=seed,
            mesh=mesh,
        ).stream()

        def next_batch():
            x, _ = next(stream)
            return x

        return next_batch, lambda: None, "device"

    from ..data.native_loader import make_loader

    loader = make_loader(
        host_shard(train_images),
        batch_size=local_batch_size(tc.batch_size),
        shuffle=True,
        drop_last=True,
        augment_flip=augment_flip,
        seed=seed + jax.process_index() * 7919,
    )
    stream = make_stream(loader)

    def next_batch():
        x_np, _ = next(stream)
        return put_batch(mesh, x_np)

    def close():
        if hasattr(stream, "close"):
            stream.close()

    return next_batch, close, "host"


class CDGapMonitor:
    """Early warning for EBM contrastive-divergence runaway (failure
    detection, SURVEY.md §5).

    Characterized in artifacts/CD_DIVERGENCE.md: once the prior Langevin
    chains stop mixing, |e_pos - e_neg| grows without bound for THOUSANDS
    of iterations before anything goes non-finite, while g_loss still
    looks healthy — the NaN fail-fast never fires and a run can burn hours
    in a regime whose checkpoints are useless. The reference's own torch
    loop exhibits the same runaway (66x gap growth on the control run), so
    this is detection ONLY: training dynamics are untouched; the alarm is
    a metric (`cd_gap_alarm`) plus a one-time log line, for operators and
    sweeps to gate on.

    Alarm rule: |gap| > factor x median(|gap| over the first `warmup`
    observations). With the default print cadence this fires ~500 iters
    after onset and ~20k before the g_loss side degrades (both 25k-iter
    endurance runs).

    `gap_ceiling` raises the alarm threshold to at least that value. Used
    by the drivers when `train.e_energy_reg` > 0: the regularized E loss
    pins mean energies at the analytic fixed points ∓1/(2α), so the gap
    DESIGNEDLY saturates at 1/α — far above factor x warmup median, but
    bounded and healthy (CD_DIVERGENCE.md experiment 3; the reg2e4 run
    holds ∓2500 ± 0.4% for >13k iters with g_loss flat). Without the
    ceiling the alarm latches on every regularized run at plateau approach;
    with it, firing means the gap escaped the regularizer's guarantee —
    a real failure again."""

    def __init__(self, warmup: int = 20, factor: float = 50.0,
                 gap_ceiling: Optional[float] = None):
        self._warm = []
        self.warmup = warmup
        self.factor = factor
        self.gap_ceiling = gap_ceiling
        self.fired_at = None

    def update(self, it: int, host_metrics, quiet: bool = False) -> dict:
        if "e_pos" not in host_metrics or "e_neg" not in host_metrics:
            return {}
        gap = abs(host_metrics["e_pos"] - host_metrics["e_neg"])
        if len(self._warm) < self.warmup:
            self._warm.append(gap)
            return {"cd_gap_alarm": 0.0}
        base = max(float(np.median(self._warm)), 1e-3)
        threshold = self.factor * base
        if self.gap_ceiling is not None:
            threshold = max(threshold, self.gap_ceiling)
        alarmed = gap > threshold
        if alarmed and self.fired_at is None:
            self.fired_at = it
            if not quiet:
                print(
                    f"[damc] WARNING: contrastive-divergence gap runaway at "
                    f"iteration {it}: |e_pos - e_neg| = {gap:.3e} > "
                    f"threshold {threshold:.3e} ({self.factor:.0f}x warmup "
                    f"median {base:.3e}"
                    + (f", ceiling {self.gap_ceiling:.3e}"
                       if self.gap_ceiling is not None else "")
                    + "). The EBM prior "
                    "chains have likely stopped mixing; later checkpoints will "
                    "not improve (best-ckpt gating preserves the optimum). See "
                    "artifacts/CD_DIVERGENCE.md.",
                    flush=True,
                )
        return {"cd_gap_alarm": 1.0 if alarmed else 0.0}

    def seed_from_history(self, metrics_path: Optional[str], upto_iter: int) -> None:
        """Replay this run's pre-resume gap trajectory (metrics.jsonl) into
        the monitor. Without this, `--resume_path auto` after runaway onset
        would re-learn its warmup baseline from already-runaway-scale gaps
        and silently disarm the alarm for the rest of the run."""
        if not metrics_path or not os.path.exists(metrics_path):
            return
        with open(metrics_path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail line from a preempted writer
                if row.get("phase") != "train":
                    continue
                step = row.get("step")
                if step is None or step >= upto_iter:
                    continue
                self.update(int(step), row, quiet=True)
        if self.fired_at is not None:
            print(
                f"[damc] note: resumed run had already tripped the CD-gap "
                f"alarm at iteration {self.fired_at}; alarm stays armed with "
                "the pre-resume warmup baseline.",
                flush=True,
            )


def cd_gap_ceiling(e_energy_reg: float) -> Optional[float]:
    """CDGapMonitor ceiling for a run with the opt-in E-energy regularizer:
    the analytic stationary gap is 1/α (mean energies pinned at ∓1/(2α),
    `train/step.py`), so only gaps beyond 1.25x that — escaped the
    regularizer's bound — are alarming. 25% headroom covers the observed
    plateau oscillation (<2% in the endurance runs). None when α = 0
    (exact reference CD: any sustained growth is runaway)."""
    return 1.25 / e_energy_reg if e_energy_reg > 0.0 else None


def metric_float(v) -> float:
    """Host float from a metric that may live replicated on a multi-host
    mesh (plain float() raises on non-fully-addressable arrays)."""
    if isinstance(v, jax.Array) and not v.is_fully_addressable:
        return float(np.asarray(v.addressable_data(0)))
    return float(v)


def shutdown_agreed(shutdown) -> bool:
    """Pod-wide agreement on preemption at an iteration boundary.

    Even a "pod-wide" SIGTERM lands on hosts milliseconds apart, so gating
    the break on the raw per-host flag could have host A entering the
    collective orbax save at iteration k while host B is already inside
    step k's cross-host psum — a deadlock precisely at preemption time.
    Multi-host runs therefore OR the flag across processes each iteration
    (every host calls this at the same loop point, so every host sees the
    same verdict and breaks at the same k). Single-process: just the flag.
    Cost: one scalar DCN allgather per iteration, ~zero vs a train step."""
    local = bool(shutdown)
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.int32(local))
    return bool(np.max(flags))


def broadcast_metric(value: float) -> float:
    """Host-0's value on every host. Gate any collective-save branch (e.g.
    best-checkpoint) on a broadcast score: per-host redundant evals can
    differ in the last ulp (BLAS sqrtm, scipy versions), and a branch taken
    by some hosts but not others deadlocks the orbax save barrier.
    Single-process: identity."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    return float(multihost_utils.broadcast_one_to_all(np.float64(value)))


def preemption_checkpoint(shutdown, ckpt_dir: Optional[str], it: int, state) -> None:
    """Save the full state at a signal-interrupted iteration boundary.

    Multi-host note: orbax coordinates multi-process saves internally; the
    loop gates the break on `shutdown_agreed`, so every process reaches
    this call at the SAME iteration (the signum print is per-host: a host
    that never received the local signal logs signum None)."""
    if ckpt_dir:
        jax.block_until_ready(state)
        path = save_checkpoint(ckpt_dir, str(it), state)
        print(f"[damc] signal {shutdown.signum}: checkpointed to {path}; exiting")
