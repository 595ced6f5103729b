"""Diagnose leg-B of tools/trajectory_parity_inversion.py: is the
0.41 rel-L2 between the reference and damc_tpu noiseless sweeps a bug or
chaotic amplification of float noise through a RANDOM-INIT denoiser?

Method: build the stack once, then for growing sweep lengths measure
  (a) ref-vs-damc rel-L2 of the sweep output (cross-framework), and
  (b) ref-vs-ref rel-L2 where the torch input z_T is perturbed by 1e-6
      relative noise (within-framework Lyapunov probe).
If (b) grows at the same geometric rate as (a), the cross-framework gap
is input-noise amplification, not a math mismatch.

Writes artifacts/diag_sweep_divergence.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import torch

    torch.set_num_threads(1)
    from trajectory_parity import _stub_reference_deps

    _stub_reference_deps()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from trajectory_parity_inversion import (
        build_reference_nets,
        run_damc_sweep,
        run_reference_sweep,
        synthetic_images,
        rel_l2,
    )
    from damc_tpu.models.stylegan import (
        convert_encoder_state_dict,
        convert_generator_state_dict,
    )

    res, batch = 32, 4
    gen, enc, _vgg = build_reference_nets(res, seed=0)
    enc_params = convert_encoder_state_dict(enc.state_dict(), res)
    del gen
    nz = (2 * int(np.log2(res)) - 2) * 512
    x = synthetic_images(batch, res)

    rows = []
    for n_interval in (2, 3, 5, 10):
        torch.manual_seed(707)
        zt = torch.randn(batch, nz).numpy()
        z0_ref, _, q_sd = run_reference_sweep(enc, x, zt, n_interval, res, q_seed=1)
        z0_damc, _ = run_damc_sweep(q_sd, enc_params, x, zt, n_interval, res)

        # Lyapunov probe: same reference code, z_T nudged by 1e-6 rel noise.
        rngp = np.random.RandomState(5)
        zt_pert = zt * (1.0 + 1e-6 * rngp.randn(*zt.shape).astype(np.float32))
        z0_ref_pert = _sweep_with_zt(enc, x, zt_pert, n_interval, res, q_seed=1)
        rows.append(
            {
                "n_interval": n_interval,
                "cross_rel_l2": rel_l2(z0_damc, z0_ref),
                "lyapunov_rel_l2_from_1e-6": rel_l2(z0_ref_pert, z0_ref),
            }
        )
        print(rows[-1], flush=True)

    out = {
        "note": "ref-vs-damc sweep gap vs the reference's own 1e-6 "
                "input-perturbation amplification (Lyapunov floor)",
        "rows": rows,
    }
    path = os.path.join(REPO, "artifacts", "diag_sweep_divergence.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("->", path)


def _sweep_with_zt(enc, x_np, zt_np, n_interval, res, q_seed):
    """Reference stylegan sweep from an ARBITRARY z_T: replicates
    `_netQ_U.forward`'s loop (diffusion_net_stylegan.py:361-394) calling the
    module's own submodules, so no seed-bridge assert is needed. The module
    itself comes from the SAME builder the parity harness uses."""
    import torch

    from trajectory_parity_inversion import build_reference_q
    from src.diffusion_helper_func import (
        diffusion_reverse,
        logsnr_schedule_fn,
        pred_x_from_eps,
    )

    Q = build_reference_q(enc, n_interval, res, q_seed, nz=zt_np.shape[1])
    x_t = torch.from_numpy(np.ascontiguousarray(x_np.transpose(0, 3, 1, 2)))
    b = len(x_np)
    with torch.no_grad():
        xemb = Q.encoder(x_t)
        zt = torch.from_numpy(zt_np.copy())
        for i in reversed(range(0, n_interval)):
            i_t = torch.ones(b) * float(i)
            logsnr_t = logsnr_schedule_fn(
                i_t / (n_interval - 1.0), logsnr_min=-5.1, logsnr_max=9.8
            )
            logsnr_s = logsnr_schedule_fn(
                torch.clamp(i_t - 1.0, min=0.0) / (n_interval - 1.0),
                logsnr_min=-5.1, logsnr_max=9.8,
            )
            eps_pred = Q.p(z=zt, logsnr=logsnr_t, xemb=xemb)
            logsnr_t = logsnr_t.reshape((b, 1))
            logsnr_s = logsnr_s.reshape((b, 1))
            pred_z = pred_x_from_eps(z=zt, eps=eps_pred, logsnr=logsnr_t)
            if i == 0:
                zt = pred_z
            else:
                dist = diffusion_reverse(
                    x=pred_z, z_t=zt, logsnr_s=logsnr_s, logsnr_t=logsnr_t,
                    pred_var_type="large",
                )
                zt = dist["mean"]
    return zt.numpy()


if __name__ == "__main__":
    main()
