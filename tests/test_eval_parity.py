"""Eval-pipeline score parity on identical (converted) weights.

The strongest migration guarantee below full data: fabricate a reference
`.pth.tar`, convert it, then compute the test recon-MSE with the REFERENCE
eval code (torch: Q(x) + 10-step noiseless posterior Langevin,
`train_gen_recon.py:324-348`) and with this framework's `evaluate_mse` on
the same images — the scores must agree. This is what makes the BASELINE
"FID/MSE within 5%" gates testable without real data: the eval pipelines
are interchangeable on identical weights.

Full-size version: tools/eval_converted_reference_ckpt.py (run on TPU,
numbers in README).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax

REF = "/root/reference/workspace"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference oracle not available"
)
if os.path.isdir(REF):
    sys.path.insert(0, REF)


@pytest.fixture
def reference_import_stubs(monkeypatch):
    """MCMC.py imports torchvision + pytorch_fid_wrapper at module level;
    neither is installed nor needed by the Langevin sampler under test.
    Scoped via monkeypatch so the stubs never leak into other tests'
    import space (and the stubbed src.MCMC module is evicted afterwards)."""
    for name in ("torchvision", "pytorch_fid_wrapper"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.utils = types.SimpleNamespace(save_image=lambda *a, **k: None)
            mod.fid = lambda *a, **k: float("nan")
            monkeypatch.setitem(sys.modules, name, mod)


@pytest.mark.slow
def test_recon_mse_parity_on_converted_checkpoint(tmp_path, reference_import_stubs):
    import dataclasses

    import torch

    from src.diffusion_net import _netE, _netG_cifar10, _netQ_U
    from src.MCMC import sample_langevin_post_z_with_prior

    from damc_tpu.train.gen_recon import evaluate_mse
    from damc_tpu.train.state import create_state
    from damc_tpu.utils.checkpoint import restore_checkpoint
    from damc_tpu.utils.config import preset

    cfg = preset("cifar10")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, nz=16, ngf=8, nif=8, nxemb=24, ntemb=8),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=8),
    )
    m = cfg.model

    torch.manual_seed(0)
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

    pth = str(tmp_path / "ref.pth.tar")
    torch.save(
        {
            "G_state_dict": G.state_dict(),
            "Q_state_dict": Q.state_dict(),
            "Q_dummy_state_dict": Q.state_dict(),
            "E_state_dict": E.state_dict(),
            "iter": 77,
        },
        pth,
    )

    # The CLI builds the full-preset state; give it the small config by
    # converting through the library function instead.
    from damc_tpu.utils.torch_compat import convert_reference_checkpoint

    converted = convert_reference_checkpoint(pth, "cifar10")
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    state = state.replace(
        step=jax.numpy.int32(converted["iter"]),
        params_g=converted["params_g"],
        params_e=converted["params_e"],
        params_q=converted["params_q"],
        params_q_ema=converted["params_q_ema"],
    )

    n, batch = 192, 64
    x_np = np.random.RandomState(7).uniform(-1, 1, (n, 32, 32, 3)).astype(np.float32)

    mse_ref = 0.0
    with torch.random.fork_rng():
        torch.manual_seed(1)
        for i in range(0, n, batch):
            x = torch.from_numpy(x_np[i : i + batch].transpose(0, 3, 1, 2))
            with torch.no_grad():
                z0 = Q(x)
            zk = z0.detach().clone()
            zk.requires_grad = True
            zk = sample_langevin_post_z_with_prior(
                z=zk, x=x, netG=G, netE=E, g_l_steps=10,
                g_llhd_sigma=cfg.mcmc.g_llhd_sigma, g_l_with_noise=False,
                g_l_step_size=cfg.mcmc.g_l_step_size, verbose=False,
            )
            with torch.no_grad():
                x_hat = G(zk)
                mse_ref += torch.mean((x_hat - x) ** 2, dim=[1, 2, 3]).sum().item()
    mse_ref /= n

    mse_jax = evaluate_mse(jax.random.PRNGKey(1), state, models, cfg, x_np, batch)
    rel = abs(mse_jax - mse_ref) / mse_ref
    assert rel < 0.05, (mse_ref, mse_jax)
