"""Anomaly CLI roundtrip: train_anomaly_det -> best ckpt -> eval_anomaly_det."""

import os

import pytest

from damc_tpu.data.datasets import synthetic_mnist_npz


@pytest.mark.slow
def test_anomaly_cli_roundtrip(tmp_path, capsys):
    from damc_tpu.cli import eval_anomaly_det, train_anomaly_det

    synthetic_mnist_npz(str(tmp_path / "mnist.npz"), n_per_split=(400, 80, 80))
    log = str(tmp_path / "logs")
    common = [
        "--data_path", str(tmp_path), "--log_path", log, "--label", "1",
        "--nz", "8", "--ngf", "8", "--nif", "8", "--nxemb", "16", "--ntemb", "16",
        "--n_interval", "2", "--g_l_steps", "2", "--e_l_steps", "2",
        "--batch_size", "16",
    ]
    train_anomaly_det.main(common + ["--iterations", "3"])

    run = os.listdir(os.path.join(log, "mnist"))[0]
    ckpt = os.path.join(log, "mnist", run, "ckpt")
    assert os.path.exists(os.path.join(ckpt, "best"))

    eval_anomaly_det.main(common + ["--ckpt_dir", ckpt])
    out = capsys.readouterr().out
    assert "AUPRC" in out
