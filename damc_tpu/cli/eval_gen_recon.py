"""CLI: evaluate a trained gen_recon checkpoint (FID + recon MSE).

Mirrors `/root/reference/workspace/eval_gen_recon.py`: loads the best
checkpoint, reports FID via the DAMC prior AND via EBM-prior Langevin
(e_l_steps=100 at eval, `eval_gen_recon.py:252`), plus test-set recon MSE
(Q init + 10-step noiseless Langevin).

Multi-host: `--multihost` evaluates over a global (data, model) mesh
spanning all processes, reusing the train driver's eval machinery
(`train/gen_recon.py`): FID generation shards over the global `data` axis
and the feature statistics reduce with XLA collectives; recon MSE runs
per-host redundant on a host-local state copy (per-sample independent, so
every host computes the identical number); metrics are broadcast from
host 0 so all processes print the same values.
"""

from __future__ import annotations

import argparse
import dataclasses

import jax

from .common import add_common_flags, config_from_args, load_dataset, make_feature_fn


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_flags(p)
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--ckpt_name", type=str, default="best")
    args = p.parse_args(argv)

    from .common import enable_compile_cache, maybe_init_multihost

    maybe_init_multihost(args)  # must precede any jax backend use
    enable_compile_cache()
    cfg = config_from_args(args)
    if args.e_l_steps is None:  # eval default: 100 prior Langevin steps
        cfg = dataclasses.replace(
            cfg, mcmc=dataclasses.replace(cfg.mcmc, e_l_steps=100)
        )
    # README eval recipes (`README.md:52-58`): e_l_step_size 1.6 for
    # CIFAR-10, 0.4 elsewhere (g_llhd_sigma comes from the preset).
    if args.e_l_step_size is None and cfg.model.dataset == "cifar10":
        cfg = dataclasses.replace(
            cfg, mcmc=dataclasses.replace(cfg.mcmc, e_l_step_size=1.6)
        )

    train_images, fid_images, mse_images = load_dataset(cfg)
    feature_fn, metric_name = make_feature_fn(cfg)

    from ..metrics.fid import compute_stats, images_to_unit
    from ..train.driver_utils import broadcast_metric, host_local_state
    from ..train.gen_recon import evaluate_fid, evaluate_mse
    from ..train.state import create_state
    from ..utils.checkpoint import restore_checkpoint

    multihost = jax.process_count() > 1
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    # Orbax restore is a read-only per-host operation; with --multihost the
    # checkpoint path must be readable on every host (shared FS, as for
    # training saves).
    state = restore_checkpoint(args.ckpt_dir, args.ckpt_name, state)
    print(f"[damc] restored step {int(state.step)} from {args.ckpt_dir}/{args.ckpt_name}")

    mesh = None
    if args.use_mesh and len(jax.devices()) > 1:
        from ..parallel import make_mesh, replicate

        mesh = make_mesh()
        state = replicate(mesh, state)

    unit = images_to_unit(fid_images)
    # Per-host identical (every host loads the same eval split).
    real_mu, real_sigma = compute_stats(
        feature_fn, (unit[i : i + 256] for i in range(0, len(unit), 256))
    )
    key = jax.random.PRNGKey(cfg.train.seed)
    # FID generation batch: 500 per the reference protocol (`MCMC.py:130,152`).
    fid_bs = min(cfg.train.fid_batch_size, max(cfg.train.n_fid_samples, 1))
    if mesh is not None:
        # Same mesh-divisible rounding as the training driver's in-loop eval
        # (train/gen_recon.py) so both paths score a checkpoint with the
        # SAME protocol (e.g. 8 devices: fid_bs 500 -> 496 on both).
        n_data = mesh.shape["data"]
        fid_bs = max(fid_bs - fid_bs % n_data, n_data)
    fid_damc = evaluate_fid(
        key, state, models, cfg, feature_fn, real_mu, real_sigma,
        cfg.train.n_fid_samples, fid_bs, prior="damc", mesh=mesh,
    )
    fid_ebm = evaluate_fid(
        jax.random.fold_in(key, 1), state, models, cfg, feature_fn, real_mu,
        real_sigma, cfg.train.n_fid_samples, fid_bs, prior="ebm", mesh=mesh,
    )
    mse = evaluate_mse(
        jax.random.fold_in(key, 2),
        # Multi-host: per-sample-independent recon runs redundantly per
        # host on a host-local state copy — the train driver's protocol
        # (train/gen_recon.py run_eval).
        host_local_state(state) if multihost else state,
        models, cfg, mse_images,
        cfg.train.fid_batch_size,  # mset loader bs=500, eval_gen_recon.py:110
        mesh=None if multihost else mesh,
    )
    if multihost:
        # frechet_distance ends in a host-side scipy sqrtm; per-host values
        # can differ in the last ulp — print host 0's everywhere.
        fid_damc = broadcast_metric(fid_damc)
        fid_ebm = broadcast_metric(fid_ebm)
        mse = broadcast_metric(mse)
    label = "FID" if metric_name == "fid" else metric_name
    print(f"[damc] {label} (DAMC prior): {fid_damc:.3f}")
    print(f"[damc] {label} (EBM prior):  {fid_ebm:.3f}")
    print(f"[damc] recon MSE:        {mse:.5f}")


if __name__ == "__main__":
    main()
