"""Trajectory-level parity for the StyleGAN-inversion workload (T5 / C9):
the reference's REAL functions vs this framework's `invert_batch` pipeline.

The training-loop harnesses (tools/trajectory_parity{,_anomaly}.py) must
compare statistically because the Langevin/diffusion noise streams differ.
Inversion is better: once the two stochastic draws are bridged, the whole
pipeline is DETERMINISTIC, so the comparison is direct numeric parity —
the strongest form of loop-level evidence.

Legs (identical converted weights, identical images, both frameworks):

  A. C9 Adam refinement (`/root/reference/workspace/src/MCMC.py:76-117`):
     a SHARED z0 is refined for `--steps` Adam steps under the loss
     1.5*pixel-MSE + 5e-5*VGG-feature-MSE by (i) the reference's actual
     `sample_invert_z` (its own torch modules; `Tensor.cuda` is no-op'd so
     the always-executed rescue preamble runs on CPU) and (ii)
     `ops/langevin.py::adam_latent_descent` + `train/stylegan_inv.py::
     inversion_loss_fn`. No noise enters the loop at all -> final latents
     must agree elementwise.

  B. Full T5 eval pipeline (`eval_stylegan_inv.py:128-152`): a SHARED
     z_T init runs the 100-step (here `--n_interval`) reverse-diffusion
     sweep NOISELESSLY (`Q_with_noise=False` bridges determinism; the
     reference default True only adds ancestral noise) through (i) the
     reference's stylegan `_netQ_U.forward`
     (`diffusion_net_stylegan.py:348-395`, frozen StyleGANEncoder
     conditioning) and (ii) the converted `DAMCAmortizer(dataset=
     'stylegan')` denoiser via `reverse_diffusion_sample`; each side then
     Adam-refines ITS OWN sweep output and reports the reference's recon
     MSE metric. This is also the first numeric parity check of the
     stylegan-variant Q conversion (N17) at the sweep level.

Recorded result (artifacts/trajectory_parity_inversion.json): leg A final
latents agree to 1.2% rel-L2 after 100 Adam steps with recon-MSE rel-diff
4.1e-5; leg B xemb matches to 8.6e-7 and the final recon MSE to 4.7e-4.
Leg B's sweep output itself shows rel-L2 0.41 at n_interval=10 — that is
NOT a math mismatch: tools/diag_sweep_divergence.py shows the reference's
own sweep amplifies a 1e-6 relative z_T perturbation to 0.419 at 10 steps
(0.27 at 5, 0.02 at 3), i.e. a RANDOM-INIT denoiser iterated through
pred_x_from_eps's large coefficients is chaotic; the cross-framework gap
sits at or below the reference's own Lyapunov floor at every sweep length,
and single-step eps parity is 1.85e-5 rel.

Config shims (documented, not algorithm changes): the reference hardcodes
encoder resolution 256 inside `_netQ_U.__init__`; at the harness's res-32
oracle scale the module-level `StyleGANEncoder` symbol is rebound to pass
`resolution` through. Everything else is the reference's own code.

Usage:
    python tools/trajectory_parity_inversion.py [--steps 100]
        [--n_interval 10] [--batch 4] [--out artifacts/...json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
REF = "/root/reference/workspace"
sys.path.insert(0, REPO)


def synthetic_images(n: int, res: int = 32, seed: int = 3) -> np.ndarray:
    """Smooth gradients + low noise in [-1, 1], NHWC float32 (same family as
    the other parity harnesses)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / (res - 1.0)
    base = np.stack([yy, xx, yy * xx], axis=-1)[None]
    imgs = base * rng.uniform(0.2, 1.0, (n, 1, 1, 3)).astype(np.float32)
    imgs = imgs + 0.1 * rng.rand(n, res, res, 3).astype(np.float32)
    return (np.clip(imgs, 0, 1) * 2.0 - 1.0).astype(np.float32)


def build_reference_nets(res: int, seed: int):
    """Random-init reference StyleGAN stack (the torch-oracle pattern of
    tests/test_stylegan_inversion.py)."""
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.stylegan.perceptual_model import VGG16
    from src.stylegan.stylegan_encoder_network import StyleGANEncoderNet
    from src.stylegan.stylegan_generator_network import StyleGANGeneratorNet

    torch.manual_seed(seed)
    gen = StyleGANGeneratorNet(resolution=res, repeat_w=False, final_tanh=True)
    enc = StyleGANEncoderNet(resolution=res, use_wscale=False, use_bn=True)
    vgg = VGG16()
    for m in (gen, enc, vgg):
        m.eval()
    return gen, enc, vgg


class _GenWrapper:
    """The reference `StyleGANGenerator` wrapper's forward, minus the
    weight-file loading its __init__ hardwires (`stylegan_generator.py:
    73-79,111-114`): reshape flat W+ to (b, num_layers, 512) and run
    synthesis only. `sample_invert_z` needs `.net.mapping`/`.net.truncation`
    for the NaN rescue, so the full net rides along."""

    def __init__(self, net):
        self.net = net

    def __call__(self, z):
        b = z.size(0)
        return self.net.synthesis(z.view(b, self.net.num_layers, 512))

    # set_requires_grad iterates .parameters() (`MCMC.py:12-25`).
    def parameters(self):
        return self.net.parameters()


def run_reference_invert(gen, vgg, x_np, z0_np, steps, lr, nz):
    """The REAL `sample_invert_z` on CPU. `Tensor.cuda` is temporarily a
    no-op: the rescue preamble unconditionally draws `t.cuda()`
    (`MCMC.py:88`) even when no row is NaN."""
    import torch

    from src.MCMC import sample_invert_z
    from src.diffusion_net_stylegan import _netE

    netG = _GenWrapper(gen)
    x_t = torch.from_numpy(np.ascontiguousarray(x_np.transpose(0, 3, 1, 2)))
    z = torch.from_numpy(z0_np.copy())
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        z_ref = sample_invert_z(
            z=z, x=x_t, netG=netG, netF=vgg, netE=_netE(nz=nz),
            g_l_steps=steps, g_l_step_size=lr,
        )
    finally:
        torch.Tensor.cuda = orig_cuda
    with torch.no_grad():
        x_hat = netG(z_ref)
        mse = torch.mean((x_hat - x_t) ** 2, dim=[1, 2, 3]).sum().item()
    return z_ref.detach().numpy(), mse / len(x_np)


def build_reference_q(enc, n_interval, res, q_seed, nz):
    """Seeded reference stylegan `_netQ_U` in eval mode, sharing one
    construction between this harness and tools/diag_sweep_divergence.py
    (any ctor/shim change must hit both comparisons identically).

    The ctor builds `StyleGANEncoder(weight_path)` at hardcoded
    resolution 256 (`diffusion_net_stylegan.py:327`); rebinding the symbol
    passes the harness resolution through — the encoder class itself is
    untouched."""
    import torch

    import src.diffusion_net_stylegan as dns

    with tempfile.TemporaryDirectory() as td:
        e_pth = os.path.join(td, "enc.pth")
        torch.save(enc.state_dict(), e_pth)
        orig_encoder = dns.StyleGANEncoder
        dns.StyleGANEncoder = lambda weight_path: orig_encoder(
            weight_path=weight_path, resolution=res
        )
        try:
            torch.manual_seed(q_seed)
            Q = dns._netQ_U(
                nc=3, nz=nz, nxemb=nz, ntemb=128, diffusion_residual=True,
                n_interval=n_interval, logsnr_min=-5.1, logsnr_max=9.8,
                var_type="large", with_noise=False, cond_w=0, net_arch="A",
                weight_path=e_pth,
            )
        finally:
            dns.StyleGANEncoder = orig_encoder
    Q.eval()
    return Q


def run_reference_sweep(enc, x_np, zt_np, n_interval, res, q_seed):
    """The REAL stylegan `_netQ_U.forward`, noiseless, from a captured z_T
    (seed-bridged). Returns (z0, xemb, Q_state_dict)."""
    import torch

    nz = zt_np.shape[1]
    Q = build_reference_q(enc, n_interval, res, q_seed, nz)
    x_t = torch.from_numpy(np.ascontiguousarray(x_np.transpose(0, 3, 1, 2)))

    # Bridge the sweep init: forward's first draw is z_T = randn(b, nz)
    # (`diffusion_net_stylegan.py:361`; the encoder consumes no RNG in eval
    # mode). Re-seeding right before the call makes that draw equal zt_np.
    seed_probe = 707
    torch.manual_seed(seed_probe)
    probe = torch.randn(len(x_np), nz)
    np.testing.assert_allclose(probe.numpy(), zt_np, rtol=0, atol=0)
    torch.manual_seed(seed_probe)
    with torch.no_grad():
        z0, xemb = Q(x=x_t)
    return z0.numpy(), xemb.numpy(), Q.state_dict()


def run_damc_sweep(q_sd, enc_params, x_np, zt_np, n_interval, res):
    """Converted-weight noiseless sweep through reverse_diffusion_sample."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from damc_tpu.models import stylegan as sg
    from damc_tpu.ops.reverse_diffusion import reverse_diffusion_sample
    from damc_tpu.train.stylegan_inv import make_stylegan_amortizer
    from damc_tpu.utils.config import preset
    from damc_tpu.utils.torch_compat import convert_amortizer

    cfg = preset("cifar10")
    cfg = dataclasses.replace(
        cfg,
        diffusion=dataclasses.replace(
            cfg.diffusion, n_interval=n_interval, with_noise=False
        ),
    )
    q_model = make_stylegan_amortizer(cfg, resolution=res)
    q_params = convert_amortizer(
        {k: v.numpy() for k, v in q_sd.items()}, dataset="stylegan"
    )
    xemb = sg.encoder_apply(enc_params, jnp.asarray(x_np), res)

    def denoise_fn(z, logsnr):
        return q_model.apply(q_params, z, logsnr, xemb, method="denoise")

    z0 = reverse_diffusion_sample(
        jax.random.PRNGKey(0), denoise_fn, jnp.asarray(zt_np),
        n_interval=n_interval, logsnr_min=-5.1, logsnr_max=9.8,
        var_type="large", with_noise=False,
    )
    return np.asarray(z0), np.asarray(xemb)


def run_damc_invert(sg_params, x_np, z0_np, steps, lr, res):
    import jax.numpy as jnp

    from damc_tpu.models import stylegan as sg
    from damc_tpu.ops.langevin import adam_latent_descent
    from damc_tpu.train.stylegan_inv import inversion_loss_fn

    gen = {"synthesis": sg_params["generator"]["synthesis"]}
    loss_fn = inversion_loss_fn(gen, sg_params["vgg"], jnp.asarray(x_np), res)
    z, losses = adam_latent_descent(jnp.asarray(z0_np), loss_fn, steps, lr)
    x_hat = sg.generator_apply(gen, z, res)
    mse = float(
        jnp.mean((x_hat - jnp.asarray(x_np)).reshape(len(x_np), -1) ** 2, -1).sum()
    ) / len(x_np)
    return np.asarray(z), mse, np.asarray(losses)


def rel_l2(a, b):
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


def run_harness(res=32, batch=4, steps=100, lr=0.01, n_interval=10, seed=0,
                torch_threads=1):
    import torch

    torch.set_num_threads(torch_threads)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from trajectory_parity import _stub_reference_deps

    _stub_reference_deps()  # src.MCMC imports torchvision at module level
    import jax

    jax.config.update("jax_platforms", "cpu")

    from damc_tpu.models.stylegan import (
        convert_encoder_state_dict,
        convert_generator_state_dict,
        convert_vgg16_state_dict,
    )

    gen, enc, vgg = build_reference_nets(res, seed)
    sg_params = {
        "generator": convert_generator_state_dict(gen.state_dict(), res),
        "encoder": convert_encoder_state_dict(enc.state_dict(), res),
        "vgg": convert_vgg16_state_dict(vgg.state_dict()),
    }
    # num_synthesis_layers: 2*log2(res) - 2 (stylegan_generator_network.py)
    nz = (2 * int(np.log2(res)) - 2) * 512

    x = synthetic_images(batch, res)
    rng = np.random.RandomState(11)
    z0_shared = rng.randn(batch, nz).astype(np.float32)

    # ---- Leg A: deterministic C9 Adam-refine parity from a shared z0.
    z_ref, mse_ref = run_reference_invert(gen, vgg, x, z0_shared, steps, lr, nz)
    z_damc, mse_damc, losses = run_damc_invert(sg_params, x, z0_shared, steps, lr, res)
    leg_a = {
        "steps": steps,
        "z_rel_l2": rel_l2(z_damc, z_ref),
        "recon_mse": {"ref": mse_ref, "damc": mse_damc,
                      "rel_diff": abs(mse_damc - mse_ref) / max(mse_ref, 1e-12)},
        "loss_decreased": bool(losses[-1] < losses[0]),
    }

    # ---- Leg B: full pipeline — shared z_T, noiseless sweep, own refines.
    import torch as _t

    _t.manual_seed(707)
    zt = _t.randn(batch, nz).numpy()
    z0_ref_sweep, xemb_ref, q_sd = run_reference_sweep(
        enc, x, zt, n_interval, res, q_seed=seed + 1
    )
    z0_damc_sweep, xemb_damc = run_damc_sweep(
        q_sd, sg_params["encoder"], x, zt, n_interval, res
    )
    zB_ref, mseB_ref = run_reference_invert(gen, vgg, x, z0_ref_sweep, steps, lr, nz)
    zB_damc, mseB_damc, _ = run_damc_invert(sg_params, x, z0_damc_sweep, steps, lr, res)
    leg_b = {
        "n_interval": n_interval,
        "xemb_rel_l2": rel_l2(xemb_damc, xemb_ref),
        "sweep_z0_rel_l2": rel_l2(z0_damc_sweep, z0_ref_sweep),
        "recon_mse": {"ref": mseB_ref, "damc": mseB_damc,
                      "rel_diff": abs(mseB_damc - mseB_ref) / max(mseB_ref, 1e-12)},
    }
    return {"resolution": res, "batch": batch, "lr": lr,
            "leg_a_adam_refine": leg_a, "leg_b_full_pipeline": leg_b}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=100,
                    help="Adam refine steps (reference default 100)")
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--n_interval", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    out = run_harness(
        res=args.resolution, batch=args.batch, steps=args.steps, lr=args.lr,
        n_interval=args.n_interval, seed=args.seed,
    )
    print(json.dumps(out, indent=2))
    if args.out:
        if os.path.dirname(args.out):
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(f"-> {args.out}")


if __name__ == "__main__":
    main()
