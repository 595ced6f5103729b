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
