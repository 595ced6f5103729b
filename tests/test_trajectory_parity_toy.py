"""Trajectory-level ALGORITHM parity for the toy workload vs the reference.

Completes the head-to-head set (gen_recon / anomaly / inversion / toy): the
reference's `toy_example.py:183-232` loop with its own `_netQ_U_toy` vs this
framework's fused toy train step, identical initial weights (incl. the frozen
likelihood net), byte-identical observation stream and mask sequence (see
tools/trajectory_parity_toy.py). Noise draws differ (torch RNG vs threefry),
so trajectory comparison is statistical; end states are compared by the
reference's own quality protocol (Q samples vs long-run Langevin GT).

Tolerances calibrated on TWO seeds at this exact config (seeds 0/1, recorded
in the commit adding this file): q_loss tail rel-diff observed {0.011, 0.108},
g_loss {0.468, 0.247}, GT-Langevin recon loss (training-independent → the
direct "both sides run the same sampler" check) {0.037, 0.144}; margins are
>=2x the worst observation. The END-STATE amortized-posterior quality needs
a trained Q to be a stable statistic — at this CI scale (48 iters, nxemb=24)
Q has barely started learning, so the test only guards gross divergence
(3x ratio); the full-scale evidence is the 200-iter recorded run
(artifacts/trajectory_parity_toy_200.json: g_loss_q rel-diff 29%, q_loss
tail 3.4%, MMD^2 between the two sides' learned posterior clouds 0.106).
"""

import os
import sys

import pytest

REF_TOY = "/root/reference/workspace/toy_example"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TOY), reason="reference toy oracle not available"
)


@pytest.mark.slow
def test_toy_training_trajectory_tracks_the_reference():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from trajectory_parity_toy import run_harness, tiny_toy_config

    cfg = tiny_toy_config(
        batch_size=64, g_l_steps=8, n_interval=6, nxemb=24, ntemb=8
    )
    summary, ref_traj, damc_traj, _ = run_harness(
        cfg, iters=48, seed=0, torch_threads=1,
        eval_batches=3, eval_batch=200, gt_steps=600,
    )

    # Both loops see byte-identical data; the only stochastic divergence is
    # per-step sampler noise. The q_loss tail (what Q optimizes) must track;
    # g_loss (the frozen-G recon monitor through each side's 8-step Langevin)
    # is the noisier signal at this tiny scale.
    assert summary["q_loss"]["rel_diff"] < 0.35, summary["q_loss"]
    assert summary["g_loss"]["rel_diff"] < 0.95, summary["g_loss"]

    fe = summary["final_eval"]
    # Ground-truth long-run Langevin recon quality is training-independent:
    # it checks that both sides implement the SAME Gaussian-prior posterior
    # sampler on the SAME frozen G. This is the tight gate.
    assert fe["g_loss_l"]["rel_diff"] < 0.35, fe
    # Amortized-posterior quality needs a trained Q to be stable; at 48
    # iters only gross divergence is meaningful (full-scale evidence lives
    # in artifacts/trajectory_parity_toy_200.json).
    ratio = fe["g_loss_q"]["damc"] / max(fe["g_loss_q"]["ref"], 1e-12)
    assert 1.0 / 3.0 < ratio < 3.0, fe
    # The two sides' posterior clouds must not grossly diverge.
    assert fe["mmd2_q_ref_vs_q_damc"] < 0.5, fe
