"""Trajectory-level ALGORITHM parity vs the actual reference training loop.

Both full alternating loops — the reference's `train_gen_recon.py:179-261`
executed with the reference's own torch modules, and this framework's fused
train step — run from IDENTICAL initial weights on the SAME synthetic data,
batch order, and conditional-mask sequence (see tools/trajectory_parity.py).
Noise draws differ (torch RNG vs threefry), so the comparison is statistical:
tail-window means of the losses must track, both runs must improve, and the
final recon-MSE (each side's own eval protocol) must agree.

Tolerances are calibrated from recorded harness runs (artifacts/
trajectory_parity_200.json; a 12-iter smoke showed g_loss rel-diff 3e-4,
q_loss 3%, final MSE 5%) with wide flake margins.
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
def test_training_trajectories_track_the_reference():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from trajectory_parity import run_harness, tiny_config

    cfg = tiny_config(
        batch_size=32, g_l_steps=10, e_l_steps=12, n_interval=6,
        nz=16, ngf=8, nif=8, ndf=32, nxemb=24, ntemb=8,
    )
    summary, ref_traj, damc_traj, _ = run_harness(
        cfg, iters=16, n_images=128, seed=0, torch_threads=1
    )

    # Same initial weights + same data => the early-training loss levels
    # must agree closely even though the noise streams differ.
    assert summary["g_loss"]["rel_diff"] < 0.05, summary["g_loss"]
    assert summary["q_loss"]["rel_diff"] < 0.30, summary["q_loss"]
    # CD gap (e_pos - e_neg) on the same scale as the energies themselves.
    assert summary["cd_gap"]["abs_diff_over_escale"] < 0.5, summary["cd_gap"]
    # Both loops actually learn (recon improves head -> tail)...
    assert summary["g_improvement"]["ref"] > 1.0, summary["g_improvement"]
    assert summary["g_improvement"]["damc"] > 1.0, summary["g_improvement"]
    # ...and end in states the two eval protocols score the same.
    assert summary["final_eval_mse"]["rel_diff"] < 0.30, summary["final_eval_mse"]
