"""MNIST anomaly-detection training driver (AUPRC workload).

Host loop around the anomaly-variant train step — re-architecture of
`train_anomaly_det.py:29-248`: single-B prior chains, dual-branch Q loss with
a fixed mask (handled inside the step via config), periodic AUPRC eval with
best-checkpoint gating.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from ..metrics.prauc import auprc
from ..parallel import make_mesh
from ..utils.config import Config
from ..utils.preemption import graceful_shutdown
from . import sampling
from .state import DAMCState, ModelBundle, create_state
from ..utils.checkpoint import save_checkpoint
from .driver_utils import (
    CDGapMonitor,
    broadcast_metric,
    cd_gap_ceiling,
    cd_history_path,
    host_local_state,
    init_driver_logging,
    make_batch_source,
    make_step_fn,
    metric_float,
    preemption_checkpoint,
    restore_for_resume,
    shutdown_agreed,
)


def make_score_fn(models, cfg, langevin_steps: int = 10, mesh=None):
    """Jitted fn(state, key, x) -> anomaly scores (state as argument so the
    compiled program is shared across evals). With a mesh, the fused
    Q-sweep kernel shard_maps over `data` (sampling.anomaly_scores)."""
    return jax.jit(
        lambda st, k, x: sampling.anomaly_scores(
            k, st, models, cfg, x, langevin_steps=langevin_steps, mesh=mesh
        )
    )


def evaluate_auprc(
    key: jax.Array,
    state: DAMCState,
    models: ModelBundle,
    cfg: Config,
    test_images: np.ndarray,
    test_labels: np.ndarray,
    batch: int = 500,
    langevin_steps: int = 10,
    score_fn=None,
    mesh=None,
) -> float:
    """Anomaly AUPRC sweep (`train_anomaly_det.py:206-248`): score =
    ||x_hat - x||^2 + E(z) + 0.5||z||^2 after Q init + noiseless Langevin;
    labels are 1 = anomalous. With `mesh`, batches shard over the `data`
    axis (state must already be replicated; scores are per-image, so the
    batch rounds up to a shardable size)."""
    # State is an argument (closure captures embed params as program
    # literals and force a retrace per eval — see stylegan_inv.py note).
    # Pass `score_fn` (built once via make_score_fn) from training loops so
    # repeated evals reuse ONE compiled program instead of re-tracing a
    # fresh jit per call.
    score_fn = score_fn or make_score_fn(models, cfg, langevin_steps, mesh=mesh)
    if mesh is not None:
        from ..parallel import DATA_AXIS, shard_batch

        batch = -(-batch // mesh.shape[DATA_AXIS]) * mesh.shape[DATA_AXIS]
    scores, labels = [], []
    n = len(test_images)
    for i in range(0, n, batch):
        x = test_images[i : i + batch]
        lbl = test_labels[i : i + batch]
        if len(x) < batch:  # pad the tail to keep a single compiled shape
            pad = batch - len(x)
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
        xb = jax.numpy.asarray(x) if mesh is None else shard_batch(mesh, np.asarray(x))
        s = np.asarray(score_fn(state, jax.random.fold_in(key, i), xb))
        scores.append(s[: len(lbl)])
        labels.append(lbl)
    return auprc(np.concatenate(scores), np.concatenate(labels))


def train_anomaly(
    cfg: Config,
    train_images: np.ndarray,
    test_images: Optional[np.ndarray] = None,
    test_labels: Optional[np.ndarray] = None,
    iterations: Optional[int] = None,
    log_dir: Optional[str] = None,
    seed: Optional[int] = None,
    use_mesh: bool = False,
) -> Tuple[DAMCState, float]:
    """Run anomaly training; returns (final state, best AUPRC)."""
    if (test_images is None) != (test_labels is None):
        raise ValueError(
            "test_images and test_labels must be supplied together "
            "(AUPRC needs both)"
        )
    tc = cfg.train
    seed = tc.seed if seed is None else seed
    iterations = tc.iterations if iterations is None else iterations
    # Multi-host: checkpoints are all-host orbax saves; jsonl is
    # primary-only (init_driver_logging; see train/gen_recon.py).
    logger, ckpt_dir, log_dir, multihost = init_driver_logging(log_dir, use_mesh)

    key = jax.random.PRNGKey(seed)
    k_init, k_eval = jax.random.split(key)
    state, models, opts = create_state(k_init, cfg)
    state, start_iter = restore_for_resume(state, tc.resume_path, ckpt_dir)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    step, state = make_step_fn(models, opts, cfg, mesh, state)

    # no flip aug in anomaly (`train_anomaly_det.py:49-56`); placement as
    # in train/gen_recon.py (device-resident when eligible).
    next_batch, close_data, data_placement = make_batch_source(
        train_images, tc, mesh, seed, augment_flip=False
    )
    print(f"[damc] training-batch placement: {data_placement}")

    auc_best = 0.0
    # Multi-host eval runs per-host on a host-local state copy (mesh=None
    # there); a single-host mesh shards the scoring batches over `data` so
    # the fused Q-sweep kernel dispatches through shard_map.
    eval_mesh = None if multihost else mesh
    eval_score_fn = make_score_fn(models, cfg, mesh=eval_mesh)
    import time as _time

    cd_monitor = CDGapMonitor(gap_ceiling=cd_gap_ceiling(tc.e_energy_reg))
    if start_iter > 0:
        cd_monitor.seed_from_history(
            cd_history_path(logger.path, tc.resume_path), start_iter
        )
    last_print = None

    def run_eval(it: int) -> None:
        """AUPRC eval + best-ckpt gating (`train_anomaly_det.py:206-248`);
        called at the eval interval and once more at the terminal iteration
        if the interval didn't land there."""
        nonlocal auc_best
        # Multi-host: per-sample scores run redundantly per host on
        # a host-local state copy (identical replicated values).
        score = evaluate_auprc(
            jax.random.fold_in(k_eval, it),
            host_local_state(state) if multihost else state,
            models, cfg, test_images, test_labels,
            score_fn=eval_score_fn, mesh=eval_mesh,
        )
        if multihost:
            # The best-ckpt branch below must be taken by EVERY
            # host or none (orbax multi-process save barriers):
            # per-host redundant evals could differ in the last
            # ulp, so gate on host 0's score everywhere.
            score = broadcast_metric(score)
        if score > auc_best:
            auc_best = score
            if ckpt_dir:
                save_checkpoint(ckpt_dir, "best", state)
        logger.log(it, {"auprc": score, "auprc_best": auc_best}, prefix="eval")

    # Preemption-safe loop (see train/gen_recon.py / utils/preemption.py).
    preempted = False
    with graceful_shutdown() as shutdown:
        for it in range(start_iter, iterations):
            if shutdown_agreed(shutdown):
                preemption_checkpoint(shutdown, ckpt_dir, it, state)
                preempted = True
                break
            x = next_batch()
            state, metrics = step(state, x)

            if tc.print_every > 0 and it % tc.print_every == 0:
                host_metrics = {k: metric_float(v) for k, v in metrics.items()}
                # Failure detection, same as train/gen_recon.py: a NaN'd run
                # would otherwise train blind to the iteration budget (the
                # CD monitor never alarms on NaN gaps, and `score > auc_best`
                # is False for NaN so the stale best ckpt just persists).
                bad = [k for k, v in host_metrics.items() if not np.isfinite(v)]
                if bad:
                    raise FloatingPointError(
                        f"non-finite training metrics {bad} at iteration {it}; "
                        f"last metrics: {host_metrics}"
                    )
                extra = cd_monitor.update(it, host_metrics)
                now = _time.perf_counter()
                if last_print is not None and it > last_print[0]:
                    extra["iters_per_s_wall"] = (it - last_print[0]) / (now - last_print[1])
                last_print = (it, now)
                logger.log(it, {**host_metrics, **extra})
            # Periodic checkpoints, reference parity (`train_anomaly_det.py:
            # 192-204` saves `{iteration}.pth.tar` every ckpt_iter) — also
            # what `--resume_path auto` resumes from.
            if ckpt_dir and tc.ckpt_every > 0 and it > 0 and it % tc.ckpt_every == 0:
                save_checkpoint(ckpt_dir, str(it), state)
            if tc.eval_every > 0 and it % tc.eval_every == 0 and test_images is not None:
                run_eval(it)

        if not preempted and iterations > start_iter:
            # Terminal persistence + eval — see train/gen_recon.py.
            last_it = iterations - 1
            if ckpt_dir and tc.ckpt_every > 0 and not (
                last_it > 0 and last_it % tc.ckpt_every == 0
            ):
                save_checkpoint(ckpt_dir, str(last_it), state)
            if (
                tc.eval_every > 0
                and last_it % tc.eval_every != 0
                and test_images is not None
            ):
                run_eval(last_it)

    close_data()
    return state, auc_best
