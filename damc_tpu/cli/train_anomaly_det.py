"""CLI: MNIST anomaly-detection training (AUPRC workload).

Usage (mirrors `/root/reference/workspace/train_anomaly_det.py`):
    python -m damc_tpu.cli.train_anomaly_det --label 1 --data_path <dir-with-mnist.npz>
"""

from __future__ import annotations

import argparse

from ..data.datasets import load_mnist_anomaly
from .common import add_common_flags, config_from_args, make_log_dir


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_flags(p)
    args = p.parse_args(argv)

    from .common import enable_compile_cache, maybe_init_multihost

    maybe_init_multihost(args)  # must precede any jax backend use
    enable_compile_cache()
    cfg = config_from_args(args, preset_name="mnist_anomaly")
    log_dir = make_log_dir(cfg)
    print(f"[damc] logging to {log_dir}")

    train_x, _ = load_mnist_anomaly(
        cfg.train.data_path, cfg.train.heldout_digit, "train"
    )
    test_x, test_y = load_mnist_anomaly(
        cfg.train.data_path, cfg.train.heldout_digit, "test"
    )

    from ..train.anomaly import train_anomaly

    state, auc_best = train_anomaly(
        cfg, train_x, test_images=test_x, test_labels=test_y, log_dir=log_dir,
        use_mesh=args.use_mesh,
    )
    print(f"[damc] best AUPRC: {auc_best:.4f}")


if __name__ == "__main__":
    main()
