"""Image generation + reconstruction training driver (SVHN/CIFAR/CelebA).

Host-side loop around the fused jitted train step — the TPU re-architecture
of `train_gen_recon.py:29-348`. The host only feeds data, logs, checkpoints,
and triggers the periodic FID / recon-MSE evals; every numeric step is one
XLA program. Data-parallel over a mesh when provided (params replicated,
batch/chains sharded on `data`).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..metrics.fid import compute_stats, fid_from_samples, images_to_unit
from ..parallel import batch_sharding, make_mesh
from ..utils.config import Config
from ..utils.preemption import graceful_shutdown
from ..utils.logging import save_image_grid
from ..utils.profiling import StepTimer
from . import sampling
from .state import DAMCState, create_state
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


def make_fid_batch_fn(models, cfg, batch, prior, mesh=None):
    """Jitted fn(state, key) -> one batch of generated images in [0, 1].

    Takes `state` as an ARGUMENT so the compiled program is reused across
    eval iterations (a closure over state would re-trace every eval). With a
    mesh, generation shards over the `data` axis."""
    gen = (
        sampling.gen_samples_damc_prior if prior == "damc" else sampling.gen_samples_ebm_prior
    )

    @partial(
        jax.jit,
        out_shardings=batch_sharding(mesh) if mesh is not None else None,
    )
    def one_batch(state, k):
        out = gen(k, state, models, cfg, batch, mesh=mesh)
        x = out[0] if isinstance(out, tuple) else out
        return sampling.to_unit_range(x)

    return one_batch


def evaluate_fid(
    key, state, models, cfg, feature_fn, real_mu, real_sigma, n_samples, batch,
    prior, mesh=None, batch_fn=None, grid_path=None,
):
    """FID via the DAMC prior (`calculate_fid_with_diffusion_prior`) or the
    EBM-prior Langevin chain (`calculate_fid`), `MCMC.py:130-176`.

    With a mesh, generated batches stay on device (sharded over `data`) and
    the feature statistics accumulate with XLA cross-device reductions —
    no host round-trip of the 50k generated images."""
    one_batch = batch_fn or make_fid_batch_fn(models, cfg, batch, prior, mesh)
    # Round to the NEAREST batch count: under a mesh the batch is rounded
    # down to a data-axis-divisible size (e.g. 500 -> 496 on 8 devices), and
    # floor division would then score 49600 samples where the single-device
    # protocol scores 50000 — a systematic sample-count bias between
    # hardware configs. Nearest-count keeps the total within batch/2 of
    # n_samples on every mesh shape (101 x 496 = 50096 there).
    n_batches = max(int(round(n_samples / batch)), 1)

    def batches():
        for i in range(n_batches):
            b = one_batch(state, jax.random.fold_in(key, i))
            if i == 0 and grid_path:
                # The reference saves an 8x8 grid of the generated samples
                # alongside every FID computation (`MCMC.py:136-137`).
                from ..utils.logging import save_image_grid

                save_image_grid(np.asarray(b[:64]) * 2.0 - 1.0, grid_path)
            yield b

    if mesh is not None:
        from ..metrics.fid import compute_stats_sharded, frechet_distance

        mu, sigma = compute_stats_sharded(
            feature_fn, batches(), mesh, dim=int(np.shape(real_mu)[0])
        )
        return frechet_distance(mu, sigma, real_mu, real_sigma)
    # Device arrays pass straight into the (jitted) feature_fn — forcing
    # np.asarray here would round-trip every generated batch through host
    # memory for nothing.
    return fid_from_samples(feature_fn, batches(), real_mu, real_sigma)


def make_recon_fn(models, cfg, langevin_steps: int = 10, mesh=None):
    """Jitted fn(state, key, x) -> per-image recon-MSE vector (state as
    argument). Per-image output (not a batch sum) so padded tail rows can be
    dropped host-side — the reference's drop_last=False mset protocol.
    With a mesh, the posterior Q-sweep's fused kernel shard_maps over
    `data` (sampling.reconstruct)."""
    return jax.jit(
        lambda state, k, x: sampling.recon_mse_per_image(
            sampling.reconstruct(
                k, state, models, cfg, x, langevin_steps=langevin_steps,
                mesh=mesh,
            )[0],
            x,
        )
    )


def evaluate_mse(
    key, state, models, cfg, eval_images: np.ndarray, batch: int, recon_fn=None,
    mesh=None,
) -> float:
    """Test-set recon MSE: Q init + 10-step noiseless Langevin over the
    ENTIRE eval set, divided by the true image count — the reference's
    mloader protocol (drop_last=False, `mse_lss /= len(mset)`,
    `train_gen_recon.py:111,324-348`). Tail batches are padded by repeating
    the last image (keeping one compiled shape, like `train/anomaly.py`) and
    the padded rows are excluded from the sum — valid because every recon op
    is per-sample independent."""
    recon = recon_fn or make_recon_fn(models, cfg, mesh=mesh)
    n = len(eval_images)
    if n == 0:
        raise ValueError("evaluate_mse: empty eval set")
    batch = min(batch, n)
    if mesh is not None:
        from ..parallel import DATA_AXIS, shard_batch

        # recon is per-image independent — rounding UP to a data-axis-
        # shardable size only regroups the per-batch PRNG keys (the same
        # estimator, like evaluating at a different bs); the pad-the-tail /
        # drop-padded-rows protocol below handles the remainder. State must
        # already be replicated over the mesh (the CLIs do).
        n_data = mesh.shape[DATA_AXIS]
        batch = -(-batch // n_data) * n_data
    total = 0.0
    for i in range(0, n, batch):
        x = eval_images[i : i + batch]
        real = len(x)
        if real < batch:
            x = np.concatenate([x, np.repeat(x[-1:], batch - real, axis=0)], axis=0)
        xb = jax.numpy.asarray(x) if mesh is None else shard_batch(mesh, np.asarray(x))
        per_image = recon(state, jax.random.fold_in(key, i), xb)
        total += float(jax.numpy.sum(per_image[:real]))
    return total / n


def train_gen_recon(
    cfg: Config,
    train_images: np.ndarray,
    fid_images: Optional[np.ndarray] = None,
    mse_images: Optional[np.ndarray] = None,
    feature_fn: Optional[Callable] = None,
    iterations: Optional[int] = None,
    log_dir: Optional[str] = None,
    use_mesh: bool = False,
    seed: Optional[int] = None,
    fid_metric_name: str = "fid",
) -> DAMCState:
    """Full training run; returns the final state."""
    tc = cfg.train
    seed = tc.seed if seed is None else seed
    iterations = tc.iterations if iterations is None else iterations
    # Multi-host: every process runs the same global programs. Checkpoints
    # go through orbax, which coordinates multi-process saves itself (ALL
    # hosts call save; log_dir must be a shared path). jsonl metrics and
    # image grids are primary-host-only (init_driver_logging).
    logger, ckpt_dir, log_dir, multihost = init_driver_logging(log_dir, use_mesh)
    img_dir = os.path.join(log_dir, "imgs") if log_dir else None

    key = jax.random.PRNGKey(seed)
    # Disjoint streams per consumer: plot / FID-damc / FID-ebm / MSE must
    # not alias each other (folding a shared key by iteration index made
    # plot-at-it collide with MSE-at-it and FID-at-it/2).
    k_init, k_plot_base, k_fid_damc, k_fid_ebm, k_mse = jax.random.split(key, 5)
    state, models, opts = create_state(k_init, cfg)

    state, start_iter = restore_for_resume(state, tc.resume_path, ckpt_dir)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    step, state = make_step_fn(models, opts, cfg, mesh, state)

    # Real-image FID statistics, precomputed once (`train_gen_recon.py:114-126`).
    real_mu = real_sigma = None
    if feature_fn is not None and fid_images is not None:
        unit = images_to_unit(fid_images)
        real_mu, real_sigma = compute_stats(
            feature_fn,
            (unit[i : i + 256] for i in range(0, len(unit), 256)),
        )

    # Training feed: device-resident (HBM store, on-device shuffle/flip,
    # no per-iteration transfer) when eligible, else the host path —
    # native C++ batch engine for uint8 stores with background prefetch,
    # NumPy fallback otherwise. Multi-host always takes the host path:
    # each host epoch-shuffles its DISJOINT partition and put_batch
    # assembles the global array.
    next_batch, close_data, data_placement = make_batch_source(
        train_images, tc, mesh, seed
    )
    print(f"[damc] training-batch placement: {data_placement}")

    fid_best = mse_best = float("inf")
    timer = StepTimer()
    # StepTimer phases measure HOST time (jit dispatch is async, so
    # time_s/train_step is enqueue cost, not device time); the honest
    # throughput metric is wall-clock iterations/sec between prints.
    import time as _time

    last_print = None
    cd_monitor = CDGapMonitor(gap_ceiling=cd_gap_ceiling(tc.e_energy_reg))
    if start_iter > 0:
        cd_monitor.seed_from_history(
            cd_history_path(logger.path, tc.resume_path), start_iter
        )
    # Eval programs compiled ONCE (state passed as an argument). FID batches
    # use the reference's bs=500 protocol (`MCMC.py:130,152`), capped by the
    # sample budget for tiny smoke configs.
    fid_bs = min(tc.fid_batch_size, max(tc.n_fid_samples, 1))
    if mesh is not None:  # generated batches shard over the data axis
        n_data = mesh.shape["data"]
        fid_bs = max(fid_bs - fid_bs % n_data, n_data)
    fid_damc_fn = make_fid_batch_fn(models, cfg, fid_bs, "damc", mesh)
    fid_ebm_fn = make_fid_batch_fn(models, cfg, fid_bs, "ebm", mesh)
    # Multi-host recon-MSE runs redundantly per host on a host-local state
    # copy (mesh=None there); single-host meshes shard it over `data`.
    recon_mesh = None if multihost else mesh
    recon_fn = make_recon_fn(models, cfg, mesh=recon_mesh)
    # Plot-time programs, also compiled once with state as an argument
    # (closing over state would embed all params as literals AND retrace
    # every plot iteration).
    plot_recon_fn = jax.jit(
        lambda st, k, xb: sampling.reconstruct(
            k, st, models, cfg, xb, langevin_steps=cfg.mcmc.g_l_steps,
            mesh=recon_mesh,
        )
    )
    plot_q_fn = jax.jit(
        lambda st, k, xb: sampling.sample_q(
            st.params_q_ema, models.amortizer, k, x=xb, mesh=recon_mesh
        )
    )
    plot_prior_fn = jax.jit(
        lambda st, k, nb: sampling.gen_samples_damc_prior(
            k, st, models, cfg, nb, mesh=recon_mesh
        ),
        static_argnums=2,
    )
    def run_eval(it: int) -> None:
        """FID (both priors) + recon-MSE eval of the CURRENT state, with
        best-FID checkpoint gating — the reference's fid_iter block
        (`train_gen_recon.py:296-348`). Called at the eval interval and once
        more at the terminal iteration if the interval didn't land there."""
        nonlocal fid_best, mse_best
        eval_metrics: Dict[str, float] = {}
        name = fid_metric_name
        # Multi-host: sample grids need host-global image arrays;
        # the sharded FID statistics themselves reduce across hosts.
        grids = img_dir if not multihost else None
        if feature_fn is not None and real_mu is not None:
            eval_metrics[f"{name}_damc"] = evaluate_fid(
                jax.random.fold_in(k_fid_damc, it),
                state, models, cfg, feature_fn, real_mu, real_sigma,
                tc.n_fid_samples, fid_bs, prior="damc", mesh=mesh,
                batch_fn=fid_damc_fn,
                grid_path=f"{grids}/{it}_fid_damc.png" if grids else None,
            )
            eval_metrics[f"{name}_ebm"] = evaluate_fid(
                jax.random.fold_in(k_fid_ebm, it),
                state, models, cfg, feature_fn, real_mu, real_sigma,
                tc.n_fid_samples, fid_bs, prior="ebm", mesh=mesh,
                batch_fn=fid_ebm_fn,
                grid_path=f"{grids}/{it}_fid_ebm.png" if grids else None,
            )
        # MSE eval is independent of FID availability (the reference
        # evaluates it whenever the interval fires,
        # `train_gen_recon.py:324-348`). Multi-host: per-sample
        # independent recon runs redundantly per host on a
        # host-local state copy (same replicated values).
        if mse_images is not None:
            eval_metrics["recon_mse"] = evaluate_mse(
                jax.random.fold_in(k_mse, it),
                host_local_state(state) if multihost else state,
                models, cfg, mse_images, tc.batch_size,
                recon_fn=recon_fn, mesh=recon_mesh,
            )
            mse_best = min(mse_best, eval_metrics["recon_mse"])
            eval_metrics["recon_mse_best"] = mse_best
        if multihost and f"{name}_damc" in eval_metrics:
            # frechet_distance finishes with a host-side scipy
            # sqrtm: per-host values can differ in the last ulp,
            # and the best-ckpt branch below enters an all-host
            # orbax save barrier — gate it on host 0's score
            # everywhere (same invariant as train/anomaly.py).
            eval_metrics[f"{name}_damc"] = broadcast_metric(
                eval_metrics[f"{name}_damc"]
            )
        if eval_metrics.get(f"{name}_damc", float("inf")) < fid_best:
            fid_best = eval_metrics[f"{name}_damc"]
            if ckpt_dir:
                save_checkpoint(ckpt_dir, "best", state)
        if f"{name}_damc" in eval_metrics:
            eval_metrics[f"{name}_best"] = fid_best
        if eval_metrics:
            logger.log(it, eval_metrics, prefix="eval")

    # Preemption-safe loop: SIGTERM/SIGINT checkpoints and returns
    # cleanly; `--resume_path auto` continues from the newest checkpoint.
    preempted = False
    with graceful_shutdown() as shutdown:
        for it in range(start_iter, iterations):
            if shutdown_agreed(shutdown):
                preemption_checkpoint(shutdown, ckpt_dir, it, state)
                preempted = True
                break
            with timer.phase("data"):
                x = next_batch()
            with timer.phase("train_step"):
                state, metrics = step(state, x)

            if tc.print_every > 0 and it % tc.print_every == 0:
                jax.block_until_ready(metrics)
                host_metrics = {k: metric_float(v) for k, v in metrics.items()}
                # Failure detection (the reference trains blind; SURVEY.md §5):
                # a NaN in any loss means the run is dead — fail loudly with
                # context instead of burning TPU hours.
                bad = [k for k, v in host_metrics.items() if not np.isfinite(v)]
                if bad:
                    raise FloatingPointError(
                        f"non-finite training metrics {bad} at iteration {it}; "
                        f"last metrics: {host_metrics}"
                    )
                extra = cd_monitor.update(it, host_metrics)
                now = _time.perf_counter()
                if last_print is not None and it > last_print[0]:
                    extra["iters_per_s_wall"] = (it - last_print[0]) / (
                        now - last_print[1]
                    )
                last_print = (it, now)
                logger.log(it, {**host_metrics, **timer.report(), **extra})
            if img_dir and not multihost and tc.plot_every > 0 and it % tc.plot_every == 0:
                # (multi-host: grid plotting needs host-global arrays; the
                # primary's img_dir still receives the FID-eval grids via
                # the sharded generation path below when single-host.)
                # Grid dumps mirroring `train_gen_recon.py:267-280`: observations,
                # posterior recon (Q init + Langevin), Q-only recon, prior samples.
                k_plot = jax.random.fold_in(k_plot_base, it)
                n_show = min(64, tc.batch_size)
                save_image_grid(np.asarray(x[:n_show]), f"{img_dir}/{it}_obs.png")
                x_hat, _ = plot_recon_fn(state, k_plot, x[:n_show])
                save_image_grid(np.asarray(x_hat), f"{img_dir}/{it}_post.png")
                zq = plot_q_fn(state, jax.random.fold_in(k_plot, 1), x[:n_show])
                x_hat_q = models.generator.apply(state.params_g, zq)
                save_image_grid(np.asarray(x_hat_q), f"{img_dir}/{it}_post_Q.png")
                x_prior, _ = plot_prior_fn(state, jax.random.fold_in(k_plot, 2), n_show)
                save_image_grid(np.asarray(x_prior), f"{img_dir}/{it}_prior.png")
            if ckpt_dir and tc.ckpt_every > 0 and it > 0 and it % tc.ckpt_every == 0:
                save_checkpoint(ckpt_dir, str(it), state)

            if tc.eval_every > 0 and it % tc.eval_every == 0:
                run_eval(it)

        if not preempted and iterations > start_iter:
            # Terminal persistence + eval (the reference's inclusive loop
            # `range(start_iter, iterations + 1)` fires its intervals at the
            # terminal iteration; our exclusive loop keeps the
            # `step == iterations` contract, so cover the tail here instead
            # of silently discarding up to ckpt_every-1 iterations of
            # trained progress — the CLI never saves the returned state).
            last_it = iterations - 1
            if ckpt_dir and tc.ckpt_every > 0 and not (
                last_it > 0 and last_it % tc.ckpt_every == 0
            ):
                save_checkpoint(ckpt_dir, str(last_it), state)
            if tc.eval_every > 0 and last_it % tc.eval_every != 0:
                run_eval(last_it)

    close_data()
    return state
