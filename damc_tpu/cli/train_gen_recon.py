"""CLI: image generation + reconstruction training.

Usage (mirrors `/root/reference/workspace/train_gen_recon.py`):
    python -m damc_tpu.cli.train_gen_recon --dataset cifar10 --data_path <dir>
"""

from __future__ import annotations

import argparse

from .common import (
    add_common_flags,
    config_from_args,
    load_dataset,
    make_feature_fn,
    make_log_dir,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_flags(p)
    args = p.parse_args(argv)

    from .common import enable_compile_cache, maybe_init_multihost

    maybe_init_multihost(args)  # must precede any jax backend use
    enable_compile_cache()
    cfg = config_from_args(args)
    log_dir = make_log_dir(cfg)
    print(f"[damc] logging to {log_dir}")
    train_images, fid_images, mse_images = load_dataset(cfg)
    feature_fn, metric_name = make_feature_fn(cfg)

    from ..train.gen_recon import train_gen_recon

    train_gen_recon(
        cfg,
        train_images,
        fid_images=fid_images,
        mse_images=mse_images,
        feature_fn=feature_fn,
        log_dir=log_dir,
        use_mesh=args.use_mesh,
        fid_metric_name=metric_name,
    )


if __name__ == "__main__":
    main()
