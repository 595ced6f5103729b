"""Trajectory-level ALGORITHM parity for the TOY 2-D posterior workload.

Completes the head-to-head set (gen_recon / anomaly / StyleGAN-inversion /
toy): the reference's toy training loop (`toy_example/toy_example.py:183-232`
semantics, executed with the reference's OWN `_netQ_U_toy` imported from
/root/reference/workspace/toy_example) runs against this framework's fused
train step in toy mode, from IDENTICAL initial weights (bridged via
utils.torch_compat export incl. the frozen likelihood net G) on the SAME
observation stream and conditional-mask sequence. The toy loop's deltas from
gen_recon are all exercised:

  * FROZEN random MLP likelihood G — never updated, shared exactly across
    sides (`toy_example.py:22-47,106`);
  * fixed pinwheel batch every iteration — only the observation noise is
    fresh (`toy_example.py:184`); here the x stream is precomputed once and
    fed to BOTH loops, so the data match is exact, not just statistical;
  * Gaussian-prior posterior Langevin (NO EBM term): energy =
    ||G(z)-x||^2/(2*0.25^2) + ||z||^2/2 (`toy_example.py:110-131`);
  * Q-only updates: no G step, no E step; AdamW weight_decay=1e-2
    (`toy_example.py:91`); rho=0.75 EMA every 10 iters (`:104,229-232`).

Per-step Langevin/diffusion noise necessarily differs (torch RNG vs
threefry), so trajectories are compared statistically (windowed tail means of
g_loss / q_loss), and END STATES are compared by the reference's own quality
protocol (`toy_example.py:251-302`): amortized posterior samples vs long-run
Langevin ground truth — recon losses g_loss(Q) / g_loss(L) per side, plus
MMD^2 between the two sides' learned posterior clouds on shared eval data.

The reference toy fork's `src` package collides with the main workspace's;
the torch modules are imported under a private package name (ref_toy_src) so
this harness composes with the gen_recon/anomaly harnesses in one process.

Usage:
    python tools/trajectory_parity_toy.py --iters 200 [--out traj.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import importlib.util
import json
import os
import sys
import tempfile
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trajectory_parity import windowed_mean  # noqa: E402

REF_TOY = "/root/reference/workspace/toy_example"


def tiny_toy_config(nxemb=32, ntemb=16, n_interval=8, batch_size=128, g_l_steps=15):
    """Reduced toy config both loops can run on CPU in minutes.

    nz stays at the reference's 2; all ALGORITHMIC knobs (no EBM, Q-only
    updates, wd=1e-2, rho=0.75/10-iter EMA, p_mask=0.1, sigma=0.25,
    step size 0.1, 6x Q updates, betas) stay at reference toy defaults
    (`toy_example.py:304-341`) — only embedding widths / step counts shrink."""
    from damc_tpu.utils.config import preset

    cfg = preset("toy")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, nxemb=nxemb, ntemb=ntemb),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=n_interval),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=g_l_steps),
        train=dataclasses.replace(cfg.train, batch_size=batch_size),
    )


def _import_toy_net():
    """Import the toy fork's diffusion_net under a PRIVATE package name.

    `/root/reference/workspace/toy_example/src` and the main workspace `src`
    are distinct packages with the same name; binding the fork to
    `ref_toy_src` keeps both importable in one process."""
    name = "ref_toy_src.diffusion_net"
    if name in sys.modules:
        return sys.modules[name]
    pkg_dir = os.path.join(REF_TOY, "src")
    if "ref_toy_src" not in sys.modules:
        pkg = types.ModuleType("ref_toy_src")
        pkg.__path__ = [pkg_dir]
        sys.modules["ref_toy_src"] = pkg
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(pkg_dir, "diffusion_net.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def make_observation_stream(cfg, params_g, models, iters, seed):
    """(z_fixed, xs): the fixed pinwheel batch (`toy_example.py:184` quirk)
    and the per-iteration observations x = G(z) + 0.25 * eps, precomputed so
    BOTH loops consume byte-identical data."""
    import jax

    from damc_tpu.data.pinwheel import sample_pinwheel

    bs = cfg.train.batch_size
    z = np.asarray(sample_pinwheel(bs, seed), np.float32)
    gz = np.asarray(models.generator.apply(params_g, z), np.float32)
    eps = np.asarray(
        jax.random.normal(jax.random.PRNGKey(seed + 5), (iters, bs, 2)), np.float32
    )
    xs = gz[None] + 0.25 * eps
    return z, xs


def run_damc_toy(cfg, state, models, opts, xs):
    """Drive the fused toy train step over the precomputed observation
    stream; returns {g_loss, q_loss} trajectories plus the final state."""
    import jax

    from damc_tpu.train.step import make_train_step

    step = jax.jit(make_train_step(models, opts, cfg))
    traj = {"g_loss": [], "q_loss": []}
    for t in range(len(xs)):
        state, metrics = step(state, jax.numpy.asarray(xs[t]))
        traj["g_loss"].append(float(metrics["g_loss"]))
        traj["q_loss"].append(float(metrics["q_loss"]))
    return {k: np.asarray(v) for k, v in traj.items()}, state


def build_torch_g(g_sd):
    """Reconstruct the reference toy likelihood net (`toy_example.py:22-47`)
    and load the exported weights — the class lives inside the reference
    SCRIPT (which imports matplotlib at module scope), so it is rebuilt here
    rather than imported."""
    import torch
    import torch.nn as nn

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.net = nn.Sequential(
                nn.Linear(2, 128), nn.ReLU(),
                nn.Linear(128, 128), nn.ReLU(),
                nn.Linear(128, 128), nn.ReLU(),
                nn.Linear(128, 2),
            )

        def forward(self, z):
            return self.net(z)

    g = G()
    g.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in g_sd.items()})
    g.eval()
    for p in g.parameters():
        p.requires_grad_(False)
    return g


def torch_posterior_langevin(netG, z, x, steps, step_size, with_noise, sigma=0.25):
    """The toy posterior sampler (`toy_example.py:110-131`): Gaussian prior,
    NO EBM term; grad of the SUMMED energy (per-chain gradients are
    independent, so the sum is exact)."""
    import torch

    for _ in range(steps):
        x_hat = netG(z)
        g_log_lkhd = 1.0 / (2.0 * sigma**2) * torch.sum((x_hat - x) ** 2)
        en = 0.5 * torch.sum(z**2)
        z_grad = torch.autograd.grad(g_log_lkhd + en, z)[0]
        z.data = z.data - 0.5 * step_size * step_size * z_grad
        if with_noise:
            z.data += step_size * torch.randn_like(z)
    return z.detach()


def run_reference_toy(cfg, pth_path, xs, masks, seed=0, torch_threads=None):
    """The reference toy training loop (`toy_example.py:183-232` semantics)
    with the reference's own `_netQ_U_toy`, from the exported checkpoint, on
    the precomputed observation stream. Returns trajectories + torch nets."""
    import torch

    if torch_threads:
        torch.set_num_threads(torch_threads)
    dn = _import_toy_net()

    m, d, mc, o, tc = cfg.model, cfg.diffusion, cfg.mcmc, cfg.optim, cfg.train
    torch.manual_seed(seed)

    def make_q():
        return dn._netQ_U_toy(
            nz=m.nz, nxemb=m.nxemb, ntemb=m.ntemb,
            diffusion_residual=d.residual, n_interval=d.n_interval,
            logsnr_min=d.logsnr_min, logsnr_max=d.logsnr_max,
            var_type=d.var_type, with_noise=d.with_noise, cond_w=d.cond_w,
        )

    Q, Q_dummy = make_q(), make_q()
    ckpt = torch.load(pth_path, map_location="cpu", weights_only=True)
    Q.load_state_dict(ckpt["Q_state_dict"])
    Q_dummy.load_state_dict(ckpt["Q_dummy_state_dict"])
    netG = build_torch_g(
        {k: v.numpy() for k, v in ckpt["G_state_dict"].items()}
    )

    # AdamW wd=1e-2, betas=(0.5, 0.999) (`toy_example.py:91`)
    Q_opt = torch.optim.AdamW(
        Q.parameters(), weight_decay=o.q_weight_decay, lr=o.q_lr, betas=o.betas
    )
    rho = tc.ema_rho
    q_lr = o.q_lr
    traj = {"g_loss": [], "q_loss": []}

    for it in range(len(xs)):
        x = torch.from_numpy(xs[it])
        z_mask = torch.from_numpy(masks[it]).unsqueeze(-1)

        Q.eval()
        with torch.no_grad():
            z0 = Q_dummy(x)
        zk_pos = z0.detach().clone()
        zk_pos.requires_grad = True
        zk_pos = torch_posterior_langevin(
            netG, zk_pos, x, mc.g_l_steps, mc.g_l_step_size,
            mc.g_l_with_noise, sigma=mc.g_llhd_sigma,
        )

        # Reconstruction monitor only — G is frozen (`toy_example.py:207`).
        g_loss = torch.sum((netG(zk_pos) - x) ** 2, dim=1).mean()

        Q.train()
        for _ in range(tc.q_updates):
            Q_opt.zero_grad()
            q_loss = Q.calculate_loss(x=x, z=zk_pos, mask=z_mask).mean()
            q_loss.backward()
            torch.nn.utils.clip_grad_norm_(Q.parameters(), max_norm=o.q_max_norm)
            Q_opt.step()
        Q.eval()

        # LR schedule: q_lr *= 0.99 every 1000 iters, floor 1e-5
        # (`toy_example.py:223-227`) — the damc side's optax schedule
        # (train/state.py::lr_schedule) applies the same decay, so runs
        # past 1000 iters stay optimizer-identical.
        if (it + 1) % 1000 == 0:
            q_lr = max(q_lr * 0.99, 1e-5)
            for group in Q_opt.param_groups:
                group["lr"] = q_lr

        if (it + 1) % tc.ema_every == 0:
            with torch.no_grad():
                for p, tp in zip(Q.parameters(), Q_dummy.parameters()):
                    tp.data.copy_(rho * p.data + (1 - rho) * tp.data)

        traj["g_loss"].append(float(g_loss.detach()))
        traj["q_loss"].append(float(q_loss.detach()))

    nets = {"G": netG, "Q": Q, "Q_dummy": Q_dummy}
    return {k: np.asarray(v) for k, v in traj.items()}, nets


def final_state_eval(
    cfg, damc_state, models, nets, seed=0, n_batches=4, batch=250, gt_steps=1000
):
    """The reference's toy quality protocol (`toy_example.py:251-302`) on the
    END STATES of both runs, over SHARED eval data: per side, amortized
    posterior samples and `gt_steps`-step ground-truth Langevin from noise;
    recon losses g_loss(Q) / g_loss(L); MMD^2 between the two sides'
    Q-sample clouds and each side's Q-vs-GT clouds."""
    import jax
    import jax.numpy as jnp
    import torch

    from damc_tpu.data.pinwheel import sample_pinwheel
    from damc_tpu.metrics.mmd import mmd2_rbf
    from damc_tpu.models.amortizer import sample_q
    from damc_tpu.ops.langevin import gaussian_posterior_energy, langevin_sample

    mc = cfg.mcmc
    gen_fn = lambda z: models.generator.apply(damc_state.params_g, z)

    zq_ref, zq_damc, zl_ref, zl_damc = [], [], [], []
    losses = {"q_ref": 0.0, "q_damc": 0.0, "l_ref": 0.0, "l_damc": 0.0}
    n_total = n_batches * batch

    for i in range(n_batches):
        z_data = np.asarray(sample_pinwheel(batch, seed + 7919 + i), np.float32)
        rng = np.random.RandomState(seed * 31 + 1000 + i)
        x = (
            np.asarray(gen_fn(jnp.asarray(z_data)), np.float32)
            + 0.25 * rng.randn(batch, 2).astype(np.float32)
        )
        xj, xt = jnp.asarray(x), torch.from_numpy(x)

        # damc side
        key = jax.random.fold_in(jax.random.PRNGKey(seed), 20_000 + i)
        k_q, k_init, k_gt = jax.random.split(key, 3)
        zq = sample_q(damc_state.params_q, models.amortizer, k_q, x=xj)
        energy = gaussian_posterior_energy(gen_fn, xj, mc.g_llhd_sigma)
        zl, _ = langevin_sample(
            k_gt, jax.random.normal(k_init, z_data.shape), energy,
            gt_steps, mc.g_l_step_size, with_noise=True,
        )
        losses["q_damc"] += float(jnp.sum((gen_fn(zq) - xj) ** 2))
        losses["l_damc"] += float(jnp.sum((gen_fn(zl) - xj) ** 2))
        zq_damc.append(np.asarray(zq))
        zl_damc.append(np.asarray(zl))

        # reference side
        G, Q = nets["G"], nets["Q"]
        with torch.no_grad():
            z0 = Q(xt)
        losses["q_ref"] += float(torch.sum((G(z0) - xt) ** 2))
        zq_ref.append(z0.numpy())
        zk = torch.randn(batch, 2)
        zk.requires_grad = True
        zk = torch_posterior_langevin(
            G, zk, xt, gt_steps, mc.g_l_step_size, with_noise=True,
            sigma=mc.g_llhd_sigma,
        )
        with torch.no_grad():
            losses["l_ref"] += float(torch.sum((G(zk) - xt) ** 2))
        zl_ref.append(zk.numpy())

    cat = lambda xs: jnp.asarray(np.concatenate(xs, axis=0))
    zq_r, zq_d, zl_r, zl_d = cat(zq_ref), cat(zq_damc), cat(zl_ref), cat(zl_damc)
    out = {
        "g_loss_q": {"ref": losses["q_ref"] / n_total, "damc": losses["q_damc"] / n_total},
        "g_loss_l": {"ref": losses["l_ref"] / n_total, "damc": losses["l_damc"] / n_total},
        "mmd2_q_ref_vs_q_damc": float(mmd2_rbf(zq_r, zq_d)),
        "mmd2_q_vs_gt_ref": float(mmd2_rbf(zq_r, zl_r)),
        "mmd2_q_vs_gt_damc": float(mmd2_rbf(zq_d, zl_d)),
    }
    for k in ("g_loss_q", "g_loss_l"):
        r, d2 = out[k]["ref"], out[k]["damc"]
        out[k]["rel_diff"] = abs(r - d2) / max(abs(r), 1e-12)
    return out


def compare_toy_trajectories(ref, damc, window_frac=0.25):
    out = {}
    for k in ("g_loss", "q_loss"):
        r, d = windowed_mean(ref[k], window_frac), windowed_mean(damc[k], window_frac)
        out[k] = {
            "ref_tail_mean": r,
            "damc_tail_mean": d,
            "rel_diff": abs(r - d) / max(abs(r), 1e-12),
        }
    for k, src in (("ref", ref), ("damc", damc)):
        head = float(np.mean(src["g_loss"][: max(len(src["g_loss"]) // 10, 1)]))
        out.setdefault("g_improvement", {})[k] = head / max(
            windowed_mean(src["g_loss"], window_frac), 1e-12
        )
    return out


def run_harness(
    cfg, iters, seed=0, out_dir=None, torch_threads=None,
    eval_batches=4, eval_batch=250, gt_steps=1000,
):
    """End-to-end: init damc toy state -> export -> both loops on the shared
    observation stream -> trajectory + end-state comparison."""
    import jax

    from damc_tpu.train.state import create_state
    from damc_tpu.utils.torch_compat import export_reference_checkpoint
    from trajectory_parity import mask_sequence

    state, models, opts = create_state(jax.random.PRNGKey(seed), cfg)
    z_fixed, xs = make_observation_stream(cfg, state.params_g, models, iters, seed)
    masks = mask_sequence(
        state.rng, iters, cfg.train.batch_size, cfg.diffusion.p_mask
    )

    out_dir = out_dir or tempfile.mkdtemp(prefix="traj_parity_toy_")
    pth = os.path.join(out_dir, "init.pth.tar")
    export_reference_checkpoint(state, pth, dataset="toy", nxemb=cfg.model.nxemb)

    damc_traj, damc_state = run_damc_toy(cfg, state, models, opts, xs)
    ref_traj, nets = run_reference_toy(
        cfg, pth, xs, masks, seed=seed, torch_threads=torch_threads
    )

    summary = compare_toy_trajectories(ref_traj, damc_traj)
    summary["final_eval"] = final_state_eval(
        cfg, damc_state, models, nets, seed=seed,
        n_batches=eval_batches, batch=eval_batch, gt_steps=gt_steps,
    )
    return summary, ref_traj, damc_traj, out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--g_l_steps", type=int, default=15)
    ap.add_argument("--n_interval", type=int, default=8)
    ap.add_argument("--gt_steps", type=int, default=1000)
    ap.add_argument("--out", default=None, help="write trajectories+summary JSON here")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # both sides on CPU: like-for-like

    cfg = tiny_toy_config(
        batch_size=args.batch, g_l_steps=args.g_l_steps, n_interval=args.n_interval
    )
    import time

    t0 = time.perf_counter()
    summary, ref_traj, damc_traj, out_dir = run_harness(
        cfg, args.iters, seed=args.seed, gt_steps=args.gt_steps
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
