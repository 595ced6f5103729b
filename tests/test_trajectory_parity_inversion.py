"""Deterministic loop-level parity for the StyleGAN-inversion workload (T5).

Companion to tests/test_trajectory_parity{,_anomaly}.py — but stronger:
once the two stochastic draws (z0 for the Adam refine, z_T for the sweep)
are bridged, the whole inversion pipeline is noise-free, so the reference's
real `sample_invert_z` (`/root/reference/workspace/src/MCMC.py:76-117`) and
this framework's `adam_latent_descent` + `inversion_loss_fn` are compared
by direct numeric agreement, not statistics.

Tolerances calibrated from the recorded 100-step harness run
(artifacts/trajectory_parity_inversion.json: leg-A z rel-L2 0.0116, MSE
rel-diff 4.1e-5; leg-B recon-MSE rel-diff 4.7e-4) with wide margins; the
test runs fewer steps, where accumulated fp drift is strictly smaller.
Raw sweep outputs are NOT compared — a random-init denoiser iterated
through pred_x_from_eps is chaotic (the reference's own sweep amplifies a
1e-6 z_T perturbation to 0.42 rel-L2 in 10 steps; see
tools/diag_sweep_divergence.py and artifacts/diag_sweep_divergence.json).
"""

import os
import sys

import pytest

REF = "/root/reference/workspace"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference oracle not available"
)


@pytest.mark.slow
def test_inversion_pipeline_matches_the_reference_numerically():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from trajectory_parity_inversion import run_harness

    out = run_harness(res=32, batch=2, steps=30, lr=0.01, n_interval=5,
                      seed=0, torch_threads=1)

    leg_a = out["leg_a_adam_refine"]
    # Shared z0, no noise anywhere: final latents agree elementwise.
    assert leg_a["z_rel_l2"] < 0.05, leg_a
    assert leg_a["recon_mse"]["rel_diff"] < 1e-2, leg_a
    assert leg_a["loss_decreased"], leg_a

    leg_b = out["leg_b_full_pipeline"]
    # Frozen-encoder conditioning must match exactly (pure conversion).
    assert leg_b["xemb_rel_l2"] < 1e-4, leg_b
    # Each side refines its own sweep output; the T5 metric (recon MSE,
    # `eval_stylegan_inv.py:128-152`) must land in the same basin.
    assert leg_b["recon_mse"]["rel_diff"] < 5e-2, leg_b
