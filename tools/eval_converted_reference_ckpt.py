"""End-to-end checkpoint-migration + eval-parity run at FULL reference sizes.

Demonstrates that this framework's eval pipeline reproduces the reference's
scores on identical weights, making the BASELINE FID/MSE gates testable the
moment real data + Inception weights appear:

1. fabricate a reference-format `.pth.tar` (random-init torch _netG_cifar10 /
   _netQ_U / _netE at full CIFAR-10 sizes, the `train_gen_recon.py:282-294`
   save dict);
2. convert it with `cli/convert_checkpoint` (Orbax DAMCState);
3. compute the test recon-MSE with the REFERENCE eval code on CPU torch
   (Q(x) init + 10-step noiseless posterior Langevin, per
   `train_gen_recon.py:324-348`) on N synthetic images;
4. compute the same score with this framework's `evaluate_mse` on the
   converted checkpoint and the SAME images;
5. assert the scores agree (identical weights; the only stochasticity is
   each side's z_T draw, which averages out over N samples).

Usage:  python tools/eval_converted_reference_ckpt.py  [--n 256] [--tpu]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "/root/reference/workspace")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tpu", action="store_true", help="run the JAX side on TPU")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import torch

    # The reference's MCMC.py imports torchvision + pytorch_fid_wrapper at
    # module level; neither is installed here and neither is used by the
    # Langevin sampler we need — stub them so the oracle imports.
    import types

    for name in ("torchvision", "pytorch_fid_wrapper"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.utils = types.SimpleNamespace(save_image=lambda *a, **k: None)
            mod.fid = lambda *a, **k: float("nan")
            sys.modules[name] = mod

    from src.diffusion_net import _netE, _netG_cifar10, _netQ_U
    from src.MCMC import sample_langevin_post_z_with_prior

    from damc_tpu.cli import convert_checkpoint
    from damc_tpu.train.gen_recon import evaluate_mse
    from damc_tpu.train.state import create_state
    from damc_tpu.utils.checkpoint import restore_checkpoint
    from damc_tpu.utils.config import preset

    cfg = preset("cifar10")
    m, mc = cfg.model, cfg.mcmc
    torch.manual_seed(0)
    print(f"building torch nets at full sizes (nz={m.nz}, ngf={m.ngf})...", flush=True)
    G = _netG_cifar10(nz=m.nz, ngf=m.ngf, nc=m.nc)
    Q = _netQ_U(
        nc=m.nc, nz=m.nz, nxemb=m.nxemb, ntemb=m.ntemb, nif=m.nif,
        diffusion_residual=True, n_interval=cfg.diffusion.n_interval,
        logsnr_min=cfg.diffusion.logsnr_min, logsnr_max=cfg.diffusion.logsnr_max,
        var_type=cfg.diffusion.var_type, with_noise=True, dataset="cifar10",
    )
    E = _netE(nz=m.nz)
    for net in (G, Q, E):
        net.eval()

    tmp = tempfile.mkdtemp(prefix="damc_ckpt_")
    pth = os.path.join(tmp, "reference.pth.tar")
    torch.save(
        {
            "G_state_dict": G.state_dict(),
            "Q_state_dict": Q.state_dict(),
            "Q_dummy_state_dict": Q.state_dict(),
            "E_state_dict": E.state_dict(),
            "G_optimizer": None,
            "Q_optimizer": None,
            "E_optimizer": None,
            "iter": 12345,
        },
        pth,
    )
    print(f"wrote reference-format checkpoint: {pth}", flush=True)

    out_dir = os.path.join(tmp, "converted")
    convert_checkpoint.main(
        ["--dataset", "cifar10", "--torch_ckpt", pth, "--out_dir", out_dir]
    )

    # Shared eval inputs.
    rng = np.random.RandomState(7)
    x_np = rng.uniform(-1, 1, (args.n, 32, 32, 3)).astype(np.float32)

    # --- reference eval (torch CPU): train_gen_recon.py:324-348 ----------
    print("running the REFERENCE eval path (torch)...", flush=True)
    mse_ref = 0.0
    with torch.random.fork_rng():
        torch.manual_seed(1)
        for i in range(0, args.n, args.batch):
            x = torch.from_numpy(x_np[i : i + args.batch].transpose(0, 3, 1, 2))
            with torch.no_grad():
                z0 = Q(x)
            zk = z0.detach().clone()
            zk.requires_grad = True
            zk = sample_langevin_post_z_with_prior(
                z=zk, x=x, netG=G, netE=E, g_l_steps=10,
                g_llhd_sigma=mc.g_llhd_sigma, g_l_with_noise=False,
                g_l_step_size=mc.g_l_step_size, verbose=False,
            )
            with torch.no_grad():
                x_hat = G(zk)
                mse_ref += torch.mean((x_hat - x) ** 2, dim=[1, 2, 3]).sum().item()
    mse_ref /= args.n

    # --- this framework's eval on the CONVERTED checkpoint ----------------
    print("running damc_tpu evaluate_mse on the converted checkpoint...", flush=True)
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    state = restore_checkpoint(out_dir, "12345", state)
    assert int(state.step) == 12345
    mse_jax = evaluate_mse(
        jax.random.PRNGKey(1), state, models, cfg, x_np, args.batch
    )

    rel = abs(mse_jax - mse_ref) / mse_ref
    print(
        f"recon MSE — reference(torch): {mse_ref:.6f} | damc_tpu(converted): "
        f"{mse_jax:.6f} | rel diff {rel*100:.2f}%", flush=True,
    )
    assert rel < 0.05, "eval pipelines disagree on identical weights"
    print("EVAL-PARITY OK", flush=True)


if __name__ == "__main__":
    main()
