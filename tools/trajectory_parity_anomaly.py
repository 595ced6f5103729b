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
    METRIC_KEYS,
    REF,
    _stub_reference_deps,
    batch_schedule,
    compare_trajectories,
    run_damc,
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
    semantics), executed with the reference's OWN modules, initialized from
    the exported damc checkpoint. Returns (trajectory dict, torch nets)."""
    _stub_reference_deps()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    if torch_threads:
        torch.set_num_threads(torch_threads)
    from src.diffusion_net import _netE, _netG_mnist, _netQ_U
    from src.MCMC import sample_langevin_post_z_with_prior, sample_langevin_prior_z

    m, d, mc, o, tc = cfg.model, cfg.diffusion, cfg.mcmc, cfg.optim, cfg.train
    torch.manual_seed(seed)

    def make_q():
        return _netQ_U(
            nc=m.nc, nz=m.nz, nxemb=m.nxemb, ntemb=m.ntemb, nif=m.nif,
            diffusion_residual=d.residual, n_interval=d.n_interval,
            logsnr_min=d.logsnr_min, logsnr_max=d.logsnr_max,
            var_type=d.var_type, with_noise=d.with_noise, cond_w=d.cond_w,
            net_arch="A", dataset=m.dataset,
        )

    G = _netG_mnist(nz=m.nz, ngf=m.ngf, nc=m.nc)
    Q, Q_dummy = make_q(), make_q()
    E = _netE(nz=m.nz, ndf=m.ndf)

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=True)
    G.load_state_dict(ckpt["G_state_dict"])
    Q.load_state_dict(ckpt["Q_state_dict"])
    Q_dummy.load_state_dict(ckpt["Q_dummy_state_dict"])
    E.load_state_dict(ckpt["E_state_dict"])

    # `train_anomaly_det.py:84-86`: Adam for G/E, AdamW(weight_decay=0) for Q.
    G_opt = torch.optim.Adam(G.parameters(), lr=o.g_lr, betas=o.betas)
    Q_opt = torch.optim.AdamW(
        Q.parameters(), weight_decay=o.q_weight_decay, lr=o.q_lr, betas=o.betas
    )
    E_opt = torch.optim.Adam(E.parameters(), lr=o.e_lr, betas=o.betas)

    g_lr, q_lr, e_lr = o.g_lr, o.q_lr, o.e_lr
    rho = tc.ema_rho
    traj = {k: [] for k in METRIC_KEYS}

    for it in range(len(sched)):
        x = torch.from_numpy(images[sched[it]].transpose(0, 3, 1, 2)).contiguous()
        # Fixed all-ones mask (`train_anomaly_det.py:133`).
        z_mask = torch.ones(len(x)).unsqueeze(-1)

        Q.eval(); G.eval(); E.eval()
        with torch.no_grad():
            z0 = Q_dummy(x)
        zk_pos, zk_neg = z0.detach().clone(), z0.detach().clone()
        zk_pos.requires_grad = True
        zk_neg.requires_grad = True
        zk_pos = sample_langevin_post_z_with_prior(
            z=zk_pos, x=x, netG=G, netE=E, g_l_steps=mc.g_l_steps,
            g_llhd_sigma=mc.g_llhd_sigma, g_l_with_noise=mc.g_l_with_noise,
            g_l_step_size=mc.g_l_step_size, verbose=False,
        )
        # Prior chains from z0 ONLY — B chains, no randn concat
        # (`train_anomaly_det.py:129-131`).
        zk_neg = sample_langevin_prior_z(
            z=zk_neg, netE=E, e_l_steps=mc.e_l_steps,
            e_l_step_size=mc.e_l_step_size, e_l_with_noise=mc.e_l_with_noise,
            verbose=False,
        )

        for _ in range(tc.q_updates):
            Q_opt.zero_grad()
            Q.train()
            # Dual-branch loss: conditional AND unconditional every step
            # (`train_anomaly_det.py:134-140`).
            q_loss_p = Q.calculate_loss(x=x, z=zk_pos, mask=z_mask).mean()
            q_loss_n = Q.calculate_loss(x=x, z=zk_pos, mask=1 - z_mask).mean()
            q_loss = q_loss_p + q_loss_n
            q_loss.backward()
            torch.nn.utils.clip_grad_norm_(Q.parameters(), max_norm=o.q_max_norm)
            Q_opt.step()

        G_opt.zero_grad()
        G.train()
        x_hat = G(zk_pos)
        g_loss = torch.sum((x_hat - x) ** 2, dim=[1, 2, 3]).mean()
        g_loss.backward()
        torch.nn.utils.clip_grad_norm_(G.parameters(), max_norm=o.g_max_norm)
        G_opt.step()

        E_opt.zero_grad()
        E.train()
        e_pos, e_neg = E(zk_pos), E(zk_neg)
        e_loss = e_pos.mean() - e_neg.mean()
        e_loss.backward()
        torch.nn.utils.clip_grad_norm_(E.parameters(), max_norm=o.e_max_norm)
        E_opt.step()

        Q.eval(); G.eval(); E.eval()
        if (it + 1) % o.lr_decay_every == 0:
            g_lr = max(g_lr * o.lr_decay, o.lr_floor)
            q_lr = max(q_lr * o.lr_decay, o.lr_floor)
            e_lr = max(e_lr * o.lr_decay, o.lr_floor)
            for grp in G_opt.param_groups:
                grp["lr"] = g_lr
            for grp in Q_opt.param_groups:
                grp["lr"] = q_lr
            for grp in E_opt.param_groups:
                grp["lr"] = e_lr
        if (it + 1) % tc.ema_every == 0:
            with torch.no_grad():
                for p, tp in zip(Q.parameters(), Q_dummy.parameters()):
                    tp.data.copy_(rho * p.data + (1 - rho) * tp.data)

        traj["g_loss"].append(float(g_loss.detach()))
        traj["q_loss"].append(float(q_loss.detach()))
        traj["e_pos"].append(float(e_pos.detach().mean()))
        traj["e_neg"].append(float(e_neg.detach().mean()))
        if progress_cb and progress_every and (it + 1) % progress_every == 0:
            progress_cb(it + 1, traj)

    nets = {"G": G, "Q": Q, "Q_dummy": Q_dummy, "E": E}
    return {k: np.asarray(v) for k, v in traj.items()}, nets


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
