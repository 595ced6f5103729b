"""End-to-end parity gate: DAMC posterior must match long-run Langevin.

Automated version of the reference's executable integration test
(`toy_example/toy_example.py`, README.md:93-95): after training, the
amortized posterior's recon loss must approach the 1000-step ground-truth
chain's, and the two posterior sample clouds must be close in MMD^2.
Scaled down (n_interval 20, 200 iters, 500-step GT) to stay CPU-runnable;
thresholds calibrated with margin (trained run: mmd2~0.02, loss ratio ~1.1;
untrained: mmd2~0.5, ratio ~35).
"""

import dataclasses

import pytest

from damc_tpu.train.toy import eval_toy_parity, train_toy
from damc_tpu.utils import preset


@pytest.mark.slow
def test_toy_posterior_parity():
    cfg = preset("toy")
    cfg = dataclasses.replace(
        cfg,
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=20),
        train=dataclasses.replace(cfg.train, batch_size=256),
    )
    state, models, cfg = train_toy(cfg, iterations=200, seed=1)
    res = eval_toy_parity(state, models, cfg, n_batches=2, batch=250, gt_steps=500)

    # GT chain produced something sane: recon loss per-250-sample batch of
    # the converged chain sits well under 1.0 in recorded runs (~0.3); a
    # diverged-but-finite chain would void the relative parity check below.
    assert 0 < res["g_loss_l"] < 5.0, res
    # Amortizer recon within 60% of the ground-truth chain's recon.
    assert res["g_loss_q"] < 1.6 * res["g_loss_l"], res
    # Distribution-level agreement.
    assert res["mmd2"] < 0.08, res


@pytest.mark.slow
def test_toy_training_improves_over_untrained():
    cfg = preset("toy")
    cfg = dataclasses.replace(
        cfg,
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=10),
        train=dataclasses.replace(cfg.train, batch_size=128),
    )
    state0, models, cfg = train_toy(cfg, iterations=0, seed=3)
    res0 = eval_toy_parity(state0, models, cfg, n_batches=1, batch=250, gt_steps=300)
    state, models, cfg = train_toy(cfg, iterations=250, seed=3)
    res = eval_toy_parity(state, models, cfg, n_batches=1, batch=250, gt_steps=300)
    assert res["mmd2"] < 0.6 * res0["mmd2"], (res["mmd2"], res0["mmd2"])
    assert res["g_loss_q"] < 0.5 * res0["g_loss_q"], (res["g_loss_q"], res0["g_loss_q"])
