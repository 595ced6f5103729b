"""Trajectory-level ALGORITHM parity for the ANOMALY-DETECTION loop.

Companion to tools/trajectory_parity.py (gen_recon): this harness runs the
reference's anomaly training loop (`train_anomaly_det.py:107-185` semantics,
executed with the reference's OWN torch modules from /root/reference/workspace)
against this framework's fused train step in anomaly mode, from IDENTICAL
initial weights (bridged via utils.torch_compat export) on the SAME synthetic
MNIST split in the SAME batch order. The anomaly loop's deltas from gen_recon
are all exercised:

  * fixed all-ones conditional mask + dual-branch Q loss
    (`train_anomaly_det.py:133-140`)  -> no mask replay needed;
  * prior chains initialized from z0 only (B chains, not 2B)
    (`train_anomaly_det.py:121-131`);
  * Q optimizer AdamW with weight_decay=0 (`train_anomaly_det.py:85`);
  * final-state comparison by AUPRC under EACH side's own eval protocol
    (`train_anomaly_det.py:206-233`: Q init + 10-step noiseless posterior
    Langevin, score = ||x_hat-x||^2 + E(z) + 0.5||z||^2; sklearn PR-AUC on
    the reference side, damc_tpu.metrics.prauc on ours).

Noise draws necessarily differ (torch RNG vs threefry), so trajectories are
compared statistically exactly as in the gen_recon harness.

Usage:
    python tools/trajectory_parity_anomaly.py --iters 200 [--out traj.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trajectory_parity import (  # noqa: E402
    batch_schedule,
    compare_trajectories,
    run_damc,
    run_reference,
)


def tiny_anomaly_config(
    ngf=8, nif=8, ndf=32, nxemb=24, ntemb=8, n_interval=8,
    batch_size=64, g_l_steps=15, e_l_steps=20,
):
    """Reduced mnist_anomaly config both loops can run on CPU in minutes.

    nz stays at the reference's 8 (`train_anomaly_det.py:265`); all
    ALGORITHMIC knobs (fixed mask, dual-branch Q loss, single prior chains,
    Q weight_decay=0, lr/betas, 6x Q updates, EMA rho/interval, g_llhd_sigma)
    stay at reference anomaly defaults — only widths/steps shrink."""
    from damc_tpu.utils.config import preset

    cfg = preset("mnist_anomaly")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, ngf=ngf, nif=nif, ndf=ndf, nxemb=nxemb, ntemb=ntemb
        ),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=n_interval),
        mcmc=dataclasses.replace(
            cfg.mcmc, g_l_steps=g_l_steps, e_l_steps=e_l_steps
        ),
        train=dataclasses.replace(cfg.train, batch_size=batch_size),
    )


def anomaly_data(out_dir: str, heldout: int, n_per_split=(1200, 200, 200), seed=0):
    """Synthetic MNIST via the same generator the anomaly workload tests use;
    returns (train_images, test_images, test_labels) with the reference's
    RNG(42) 80/20 split semantics (data/dataset.py:231-335)."""
    from damc_tpu.data.datasets import load_mnist_anomaly, synthetic_mnist_npz

    synthetic_mnist_npz(
        os.path.join(out_dir, "mnist.npz"), n_per_split=n_per_split, seed=seed
    )
    train_x, _ = load_mnist_anomaly(out_dir, heldout=heldout, split="train")
    test_x, test_y = load_mnist_anomaly(out_dir, heldout=heldout, split="test")
    return train_x, test_x, test_y


def run_reference_anomaly(
    cfg, pth_path, images, sched, seed=0, torch_threads=None,
    progress_cb=None, progress_every=0,
):
    """The reference anomaly training loop (`train_anomaly_det.py:107-185`
    semantics) — the shared torch-loop driver with the anomaly deltas
    switched in (G net, fixed all-ones mask, B-not-2B prior chains,
    dual-branch Q loss): tools/trajectory_parity.py::run_reference,
    variant="anomaly". Returns (trajectory dict, torch nets)."""
    return run_reference(
        cfg, pth_path, images, sched, masks=None, seed=seed,
        torch_threads=torch_threads, progress_cb=progress_cb,
        progress_every=progress_every, variant="anomaly",
    )


def reference_eval_auprc(nets, cfg, test_images, test_labels, batch=200,
                         langevin_steps=10):
    """Reference AUPRC protocol (`train_anomaly_det.py:206-233`) on the torch
    nets: Q init + noiseless posterior Langevin, anomaly score, sklearn PR-AUC."""
    import torch
    from sklearn.metrics import auc, precision_recall_curve

    from src.MCMC import sample_langevin_post_z_with_prior

    G, Q, E = nets["G"], nets["Q"], nets["E"]
    scores = []
    for i in range(0, len(test_images), batch):
        x = torch.from_numpy(
            test_images[i : i + batch].transpose(0, 3, 1, 2)
        ).contiguous()
        with torch.no_grad():
            z0 = Q(x)
        zk = z0.detach().clone()
        zk.requires_grad = True
        zk = sample_langevin_post_z_with_prior(
            z=zk, x=x, netG=G, netE=E, g_l_steps=langevin_steps,
            g_llhd_sigma=cfg.mcmc.g_llhd_sigma, g_l_with_noise=False,
            g_l_step_size=cfg.mcmc.g_l_step_size, verbose=False,
        )
        with torch.no_grad():
            x_hat = G(zk)
            s = (
                torch.sum((x_hat - x) ** 2, dim=[1, 2, 3])
                + E(zk)
                + 0.5 * torch.sum(zk**2, dim=-1)
            )
        scores.append(s.numpy())
    precision, recall, _ = precision_recall_curve(
        test_labels, np.concatenate(scores)
    )
    return float(auc(recall, precision))


def run_harness(cfg, iters, seed=0, out_dir=None, torch_threads=None,
                n_per_split=(1200, 200, 200)):
    """End-to-end: data -> init damc state -> export -> both loops -> compare.

    Returns (summary, ref_traj, damc_traj, out_dir)."""
    import jax

    from damc_tpu.train.anomaly import evaluate_auprc
    from damc_tpu.train.state import create_state
    from damc_tpu.utils.torch_compat import export_reference_checkpoint

    out_dir = out_dir or tempfile.mkdtemp(prefix="traj_parity_anomaly_")
    train_x, test_x, test_y = anomaly_data(
        out_dir, heldout=cfg.train.heldout_digit, n_per_split=n_per_split,
        seed=seed,
    )
    sched = batch_schedule(len(train_x), cfg.train.batch_size, iters, seed=seed + 1)

    state, models, opts = create_state(jax.random.PRNGKey(seed), cfg)
    pth = os.path.join(out_dir, "init.pth.tar")
    export_reference_checkpoint(
        state, pth, dataset=cfg.model.dataset, nxemb=cfg.model.nxemb
    )

    damc_traj, damc_state = run_damc(cfg, state, models, opts, train_x, sched)
    ref_traj, nets = run_reference_anomaly(
        cfg, pth, train_x, sched, seed=seed, torch_threads=torch_threads
    )

    summary = compare_trajectories(ref_traj, damc_traj)

    # End-state comparison: AUPRC under EACH side's own eval protocol.
    eval_batch = min(200, len(test_x))
    summary["final_auprc"] = {
        "ref": reference_eval_auprc(nets, cfg, test_x, test_y, batch=eval_batch),
        "damc": float(
            evaluate_auprc(
                jax.random.PRNGKey(seed + 11), damc_state, models, cfg,
                test_x, test_y, batch=eval_batch,
            )
        ),
        "anomaly_rate": float(np.mean(test_y)),
    }
    fa = summary["final_auprc"]
    fa["abs_diff"] = abs(fa["ref"] - fa["damc"])
    return summary, ref_traj, damc_traj, out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--g_l_steps", type=int, default=15)
    ap.add_argument("--e_l_steps", type=int, default=20)
    ap.add_argument("--n_interval", type=int, default=8)
    ap.add_argument("--out", default=None, help="write trajectories+summary JSON here")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # both sides on CPU: like-for-like

    cfg = tiny_anomaly_config(
        batch_size=args.batch, g_l_steps=args.g_l_steps,
        e_l_steps=args.e_l_steps, n_interval=args.n_interval,
    )
    import time

    t0 = time.perf_counter()
    summary, ref_traj, damc_traj, out_dir = run_harness(
        cfg, args.iters, seed=args.seed
    )
    summary["wall_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(summary, indent=2, default=float))
    payload = {
        "summary": summary,
        "ref": {k: v.tolist() for k, v in ref_traj.items()},
        "damc": {k: v.tolist() for k, v in damc_traj.items()},
        "config": {"iters": args.iters, "seed": args.seed},
    }
    out = args.out or os.path.join(out_dir, "trajectories.json")
    with open(out, "w") as f:
        json.dump(payload, f, default=float)
    print(f"trajectories -> {out}")


if __name__ == "__main__":
    main()
