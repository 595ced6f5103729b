"""Full-size gen_recon driver validation on TPU (synthetic data).

Exercises the complete training driver at reference hyperparameters — fused
train step, bs=500 FID generation (both priors), recon MSE, plot grids,
best-checkpoint gating — for a few hundred iterations on synthetic images.
Learning signal: the frechet_rand metric and recon MSE must drop.

Usage:  python tools/validate_gen_recon_tpu.py [--iters 301]
        [--dataset cifar10|svhn|celeba64]   (full reference sizes per preset)
"""

import argparse
import json
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=301)
    ap.add_argument("--dataset", default="cifar10",
                    choices=["cifar10", "svhn", "celeba64", "celebaHQ"])
    ap.add_argument("--n_fid_samples", type=int, default=2000)
    ap.add_argument("--eval_every", type=int, default=100)
    args = ap.parse_args()

    import jax

    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.metrics.fid import make_random_feature_fn
    from damc_tpu.train.gen_recon import train_gen_recon
    from damc_tpu.utils import preset

    enable_compile_cache()
    assert jax.devices()[0].platform != "cpu", "needs a real TPU"

    cfg = preset(args.dataset)
    res = cfg.model.image_size

    # Synthetic "dataset": smooth random gradients + noise, uint8.
    rng = np.random.RandomState(0)
    n = 4096
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / (res - 1.0)
    base = np.stack([yy, xx, yy * xx], axis=-1)[None]
    imgs = base * rng.uniform(0.2, 1.0, (n, 1, 1, 3)).astype(np.float32)
    imgs = imgs + 0.1 * rng.rand(n, res, res, 3).astype(np.float32)
    imgs = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, n_fid_samples=args.n_fid_samples,
            eval_every=args.eval_every, plot_every=args.eval_every,
            print_every=100,
        ),
    )
    feat = make_random_feature_fn(jax.random.PRNGKey(0), (res, res, 3))
    log_dir = tempfile.mkdtemp(prefix="damc_genrecon_")
    print(f"log_dir {log_dir}; fid_batch_size {cfg.train.fid_batch_size}", flush=True)

    t0 = time.perf_counter()
    train_gen_recon(
        cfg, imgs, fid_images=imgs[:2048], mse_images=None,
        feature_fn=feat, iterations=args.iters, log_dir=log_dir, seed=0,
        fid_metric_name="frechet_rand",
    )
    print(f"trained {args.iters} iters in {time.perf_counter()-t0:.1f}s", flush=True)

    evals = [
        json.loads(l) for l in open(f"{log_dir}/metrics.jsonl")
        if '"eval"' in l
    ]
    first, last = evals[0], evals[-1]
    print("first eval:", {k: round(v, 4) for k, v in first.items() if isinstance(v, float)}, flush=True)
    print("last eval: ", {k: round(v, 4) for k, v in last.items() if isinstance(v, float)}, flush=True)
    assert last["frechet_rand_damc"] < first["frechet_rand_damc"], "no learning signal"
    import os

    assert os.path.exists(f"{log_dir}/ckpt/best"), "best ckpt missing"
    assert os.path.exists(f"{log_dir}/imgs/{args.eval_every}_prior.png"), "plot grids missing"
    print("GEN-RECON DRIVER OK (bs=500 FID protocol, plots, best-ckpt)", flush=True)


if __name__ == "__main__":
    main()
