"""End-to-end anomaly-detection workload smoke test (synthetic MNIST)."""

import dataclasses

import numpy as np
import pytest

from damc_tpu.data.datasets import load_mnist_anomaly, synthetic_mnist_npz
from damc_tpu.utils import preset


@pytest.mark.slow
def test_anomaly_training_and_auprc(tmp_path):
    from damc_tpu.train.anomaly import train_anomaly

    synthetic_mnist_npz(str(tmp_path / "mnist.npz"), n_per_split=(800, 100, 100))
    train_x, _ = load_mnist_anomaly(str(tmp_path), heldout=1, split="train")
    test_x, test_y = load_mnist_anomaly(str(tmp_path), heldout=1, split="test")

    cfg = preset("mnist_anomaly")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, ngf=8, nif=8, nxemb=32, ntemb=16),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=4),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=3, e_l_steps=3),
        train=dataclasses.replace(
            cfg.train, batch_size=32, q_updates=2, eval_every=10, print_every=10
        ),
    )
    state, auc_best = train_anomaly(
        cfg,
        train_x,
        test_images=test_x[:120],
        test_labels=test_y[:120],
        iterations=11,
        log_dir=str(tmp_path / "logs"),
        seed=0,
    )
    assert int(state.step) == 11
    base_rate = test_y[:120].mean()
    assert 0.0 <= auc_best <= 1.0
    assert auc_best > 0.0
    # metrics.jsonl written
    assert (tmp_path / "logs" / "metrics.jsonl").exists()
    # best checkpoint saved
    assert (tmp_path / "logs" / "ckpt" / "best").exists()


def test_anomaly_nan_fail_fast(tmp_path):
    """A NaN'd anomaly run must raise at the next print instead of training
    blind to the iteration budget: the CD monitor never alarms on NaN gaps
    (comparisons with NaN are False) and `score > auc_best` is False for
    NaN, so without the fail-fast the stale best ckpt would just persist
    (same invariant as train/gen_recon.py)."""
    from damc_tpu.train.anomaly import train_anomaly

    cfg = preset("mnist_anomaly")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, nz=4, ngf=4, nif=4, nxemb=8, ntemb=8),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
        train=dataclasses.replace(
            cfg.train, batch_size=8, q_updates=1, eval_every=0, print_every=1
        ),
    )
    bad = np.full((16, 28, 28, 1), np.nan, np.float32)
    with pytest.raises(FloatingPointError, match="non-finite"):
        train_anomaly(cfg, bad, iterations=3, seed=0)
