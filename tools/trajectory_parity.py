"""Trajectory-level ALGORITHM parity: damc_tpu vs the reference torch loop.

Unit parity (identical-weight forward/eval equality, tests/test_torch_parity.py
and tests/test_eval_parity.py) proves the pieces match; this harness proves the
*training algorithm* matches: both full alternating loops — the reference's
`train_gen_recon.py:179-261` executed with the REFERENCE's own modules imported
from /root/reference/workspace, and this framework's fused train step — are run
from IDENTICAL initial weights (bridged via utils.torch_compat export), on the
SAME synthetic dataset in the SAME batch order, with the SAME conditional-mask
sequence (replayed from the damc PRNG chain). The Langevin/diffusion noise
draws necessarily differ (torch RNG vs threefry), so trajectories are compared
statistically: windowed means of g_loss / q_loss / e_pos−e_neg must track
within tolerance, and both runs must improve reconstruction.

Usage:
    python tools/trajectory_parity.py --iters 300 [--out traj.json]

The slow-tier test (tests/test_trajectory_parity.py) runs a reduced version of
the same harness with calibrated tolerances.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference/workspace"

METRIC_KEYS = ("g_loss", "q_loss", "e_pos", "e_neg")


def tiny_config(
    nz=16, ngf=8, nif=8, ndf=32, nxemb=24, ntemb=8, n_interval=8,
    batch_size=64, g_l_steps=15, e_l_steps=20, dataset="cifar10",
):
    """A reduced cifar10-family config both loops can run on CPU in minutes.

    All ALGORITHMIC knobs (p_mask, var_type, residual, with_noise, lr, betas,
    weight decay, 6x Q updates, 2B prior chains, EMA rho/interval, step sizes)
    stay at reference defaults — only widths/steps shrink."""
    from damc_tpu.utils.config import preset

    cfg = preset(dataset)
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, nz=nz, ngf=ngf, nif=nif, ndf=ndf, nxemb=nxemb, ntemb=ntemb
        ),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=n_interval),
        mcmc=dataclasses.replace(
            cfg.mcmc, g_l_steps=g_l_steps, e_l_steps=e_l_steps
        ),
        train=dataclasses.replace(cfg.train, batch_size=batch_size),
    )


def synthetic_images(n: int, res: int = 32, seed: int = 0) -> np.ndarray:
    """Smooth gradient images + low noise in [-1, 1], NHWC float32 — the same
    family tools/validate_gen_recon_tpu.py trains on."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / (res - 1.0)
    base = np.stack([yy, xx, yy * xx], axis=-1)[None]
    imgs = base * rng.uniform(0.2, 1.0, (n, 1, 1, 3)).astype(np.float32)
    imgs = imgs + 0.1 * rng.rand(n, res, res, 3).astype(np.float32)
    return (np.clip(imgs, 0, 1) * 2.0 - 1.0).astype(np.float32)


def batch_schedule(n: int, batch: int, iters: int, seed: int = 1) -> np.ndarray:
    """(iters, batch) index array: epoch-shuffled without replacement,
    drop_last — the reference trainloader's order contract."""
    rng = np.random.RandomState(seed)
    per_epoch = n // batch
    order = []
    while len(order) < iters:
        perm = rng.permutation(n)
        order.extend(
            perm[i * batch : (i + 1) * batch] for i in range(per_epoch)
        )
    return np.stack(order[:iters])


def mask_sequence(rng0, iters: int, batch: int, p_mask: float) -> np.ndarray:
    """Replay the mask stream the damc train step will draw.

    `make_train_step` splits state.rng 7-ways per step and draws the mask
    from the second key (`train/step.py:46-58`); threefry is platform- and
    backend-deterministic, so replaying the chain host-side yields exactly
    the masks the jitted loop will use. Returns float 1.0 = conditional row."""
    import jax

    masks = np.empty((iters, batch), np.float32)
    rng = rng0
    for t in range(iters):
        keys = jax.random.split(rng, 7)
        rng, k_mask = keys[0], keys[1]
        masks[t] = np.asarray(
            (jax.random.uniform(k_mask, (batch,)) >= p_mask).astype(np.float32)
        )
    return masks


def run_damc(cfg, state, models, opts, images, sched, collect=METRIC_KEYS):
    """Drive the fused train step over the exact batch schedule; returns
    {metric: np.ndarray[iters]} plus the final state."""
    import jax

    from damc_tpu.train.step import make_train_step

    step = jax.jit(make_train_step(models, opts, cfg))
    traj = {k: [] for k in collect}
    for t in range(len(sched)):
        state, metrics = step(state, jax.numpy.asarray(images[sched[t]]))
        for k in collect:
            traj[k].append(float(metrics[k]))
    return {k: np.asarray(v) for k, v in traj.items()}, state


def _stub_reference_deps():
    """src.MCMC imports torchvision + pytorch_fid_wrapper at module level;
    neither is needed for the samplers. Same stub as tests/test_eval_parity."""
    for name in ("torchvision", "pytorch_fid_wrapper"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.utils = types.SimpleNamespace(save_image=lambda *a, **k: None)
            mod.fid = lambda *a, **k: float("nan")
            sys.modules[name] = mod


def run_reference(cfg, pth_path, images, sched, masks, seed=0, torch_threads=None,
                  progress_cb=None, progress_every=0, variant="gen_recon"):
    """The reference training loop, executed with the reference's OWN modules
    from /root/reference/workspace, initialized from the exported damc
    checkpoint. Returns the same trajectory dict as run_damc plus the torch
    nets for post-hoc eval.

    variant="gen_recon" is `train_gen_recon.py:179-261` semantics;
    variant="anomaly" is `train_anomaly_det.py:107-185` — one loop with the
    anomaly deltas switched in place (G net, fixed all-ones mask so `masks`
    may be None, B-not-2B prior chains, dual-branch Q loss), so a
    reference-fidelity fix lands in both harnesses at once. Per-variant
    torch-RNG draw order is unchanged by the shared body."""
    _stub_reference_deps()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    if torch_threads:
        torch.set_num_threads(torch_threads)
    anomaly = variant == "anomaly"
    if anomaly:
        from src.diffusion_net import _netG_mnist as _netG
    else:
        from src.diffusion_net import _netG_cifar10 as _netG
    from src.diffusion_net import _netE, _netQ_U
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

    G = _netG(nz=m.nz, ngf=m.ngf, nc=m.nc)
    Q, Q_dummy = make_q(), make_q()
    E = _netE(nz=m.nz, ndf=m.ndf)

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=True)
    G.load_state_dict(ckpt["G_state_dict"])
    Q.load_state_dict(ckpt["Q_state_dict"])
    Q_dummy.load_state_dict(ckpt["Q_dummy_state_dict"])
    E.load_state_dict(ckpt["E_state_dict"])

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
        if anomaly:  # fixed all-ones mask (`train_anomaly_det.py:133`)
            z_mask = torch.ones(len(x)).unsqueeze(-1)
        else:
            z_mask = torch.from_numpy(masks[it]).unsqueeze(-1)

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
        if anomaly:
            # Prior chains from z0 ONLY — B chains, no randn concat
            # (`train_anomaly_det.py:129-131`).
            prior_init = zk_neg
        else:
            prior_init = torch.cat(
                [zk_neg, torch.randn_like(zk_neg, requires_grad=True)], dim=0
            )
        zk_neg = sample_langevin_prior_z(
            z=prior_init,
            netE=E, e_l_steps=mc.e_l_steps, e_l_step_size=mc.e_l_step_size,
            e_l_with_noise=mc.e_l_with_noise, verbose=False,
        )

        for _ in range(tc.q_updates):
            Q_opt.zero_grad()
            Q.train()
            if anomaly:
                # Dual-branch loss: conditional AND unconditional every step
                # (`train_anomaly_det.py:134-140`).
                q_loss = (
                    Q.calculate_loss(x=x, z=zk_pos, mask=z_mask).mean()
                    + Q.calculate_loss(x=x, z=zk_pos, mask=1 - z_mask).mean()
                )
            else:
                q_loss = Q.calculate_loss(x=x, z=zk_pos, mask=z_mask).mean()
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


def reference_eval_mse(nets, cfg, images, batch=64, langevin_steps=10):
    """Reference recon-MSE protocol (`train_gen_recon.py:324-348`) on the
    torch nets — used to compare END STATES of the two training runs."""
    import torch

    from src.MCMC import sample_langevin_post_z_with_prior

    G, Q, E = nets["G"], nets["Q"], nets["E"]
    total, n = 0.0, len(images)
    for i in range(0, n, batch):
        x = torch.from_numpy(images[i : i + batch].transpose(0, 3, 1, 2)).contiguous()
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
            total += torch.mean((x_hat - x) ** 2, dim=[1, 2, 3]).sum().item()
    return total / n


def windowed_mean(a: np.ndarray, frac: float = 0.25) -> float:
    w = max(int(len(a) * frac), 1)
    return float(np.mean(a[-w:]))


def compare_trajectories(ref, damc, window_frac: float = 0.25):
    """Summary statistics for the parity judgment."""
    out = {}
    for k in ("g_loss", "q_loss"):
        r, d = windowed_mean(ref[k], window_frac), windowed_mean(damc[k], window_frac)
        out[k] = {
            "ref_tail_mean": r,
            "damc_tail_mean": d,
            "rel_diff": abs(r - d) / max(abs(r), 1e-12),
        }
    # CD gap: e_pos - e_neg trends toward 0 from either side and is noisy;
    # compare on absolute scale relative to the energy magnitude.
    gap_r = windowed_mean(ref["e_pos"] - ref["e_neg"], window_frac)
    gap_d = windowed_mean(damc["e_pos"] - damc["e_neg"], window_frac)
    scale = max(
        abs(windowed_mean(ref["e_pos"], window_frac)),
        abs(windowed_mean(ref["e_neg"], window_frac)),
        1e-3,
    )
    out["cd_gap"] = {"ref": gap_r, "damc": gap_d, "abs_diff_over_escale": abs(gap_r - gap_d) / scale}
    for k, src in (("ref", ref), ("damc", damc)):
        head = float(np.mean(src["g_loss"][: max(len(src["g_loss"]) // 10, 1)]))
        out.setdefault("g_improvement", {})[k] = head / max(windowed_mean(src["g_loss"], window_frac), 1e-12)
    return out


def run_harness(cfg, iters, n_images=512, seed=0, out_dir=None, torch_threads=None):
    """End-to-end: init damc state -> export -> run both loops -> compare.

    Returns (summary, ref_traj, damc_traj)."""
    import jax

    from damc_tpu.train.state import create_state
    from damc_tpu.utils.torch_compat import export_reference_checkpoint

    res = cfg.model.image_size
    images = synthetic_images(n_images, res=res, seed=seed)
    sched = batch_schedule(n_images, cfg.train.batch_size, iters, seed=seed + 1)

    state, models, opts = create_state(jax.random.PRNGKey(seed), cfg)
    masks = mask_sequence(state.rng, iters, cfg.train.batch_size, cfg.diffusion.p_mask)

    import tempfile

    out_dir = out_dir or tempfile.mkdtemp(prefix="traj_parity_")
    pth = os.path.join(out_dir, "init.pth.tar")
    export_reference_checkpoint(state, pth, dataset=cfg.model.dataset, nxemb=cfg.model.nxemb)

    damc_traj, damc_state = run_damc(cfg, state, models, opts, images, sched)
    ref_traj, nets = run_reference(
        cfg, pth, images, sched, masks, seed=seed, torch_threads=torch_threads
    )

    summary = compare_trajectories(ref_traj, damc_traj)

    # End-state eval: recon MSE on a held-out slice via EACH side's own
    # protocol (both implement `train_gen_recon.py:324-348`).
    heldout = synthetic_images(128, res=res, seed=seed + 7)
    from damc_tpu.train.gen_recon import evaluate_mse

    summary["final_eval_mse"] = {
        "ref": reference_eval_mse(nets, cfg, heldout, batch=cfg.train.batch_size),
        "damc": float(
            evaluate_mse(
                jax.random.PRNGKey(seed + 11), damc_state, models, cfg,
                heldout, cfg.train.batch_size,
            )
        ),
    }
    fe = summary["final_eval_mse"]
    fe["rel_diff"] = abs(fe["ref"] - fe["damc"]) / max(abs(fe["ref"]), 1e-12)
    return summary, ref_traj, damc_traj, out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--n_images", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--g_l_steps", type=int, default=15)
    ap.add_argument("--e_l_steps", type=int, default=20)
    ap.add_argument("--n_interval", type=int, default=8)
    ap.add_argument("--out", default=None, help="write trajectories+summary JSON here")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # both sides on CPU: like-for-like

    cfg = tiny_config(
        batch_size=args.batch, g_l_steps=args.g_l_steps,
        e_l_steps=args.e_l_steps, n_interval=args.n_interval,
    )
    import time

    t0 = time.perf_counter()
    summary, ref_traj, damc_traj, out_dir = run_harness(
        cfg, args.iters, n_images=args.n_images, seed=args.seed
    )
    summary["wall_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(summary, indent=2, default=float))
    payload = {
        "summary": summary,
        "ref": {k: v.tolist() for k, v in ref_traj.items()},
        "damc": {k: v.tolist() for k, v in damc_traj.items()},
        "config": {"iters": args.iters, "n_images": args.n_images, "seed": args.seed},
    }
    out = args.out or os.path.join(out_dir, "trajectories.json")
    with open(out, "w") as f:
        json.dump(payload, f, default=float)
    print(f"trajectories -> {out}")


if __name__ == "__main__":
    main()
