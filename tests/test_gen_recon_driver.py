"""gen_recon driver integration test: full loop incl. FID/MSE evals + artifacts."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from damc_tpu.metrics.fid import make_random_feature_fn
from damc_tpu.train.gen_recon import train_gen_recon
from damc_tpu.utils import preset


@pytest.mark.slow
def test_gen_recon_driver_end_to_end(tmp_path):
    cfg = preset("svhn")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=16),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=3),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
        train=dataclasses.replace(
            cfg.train,
            batch_size=16,
            q_updates=1,
            n_fid_samples=32,
            eval_every=4,
            print_every=2,
            plot_every=4,
            ckpt_every=4,
        ),
    )
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (64, 32, 32, 3), np.uint8)  # uint8 -> native loader
    feat = make_random_feature_fn(jax.random.PRNGKey(0), (32, 32, 3), dim=24)

    state = train_gen_recon(
        cfg,
        imgs,
        fid_images=imgs[:48],
        mse_images=imgs[:32].astype(np.float32) / 255.0 * 2 - 1,
        feature_fn=feat,
        iterations=5,
        log_dir=str(tmp_path),
    )
    assert int(state.step) == 5
    assert (tmp_path / "metrics.jsonl").exists()
    # eval metrics present in the stream
    import json

    records = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    evals = [r for r in records if r["phase"] == "eval"]
    assert evals and {"fid_damc", "fid_ebm", "recon_mse", "fid_best"} <= set(evals[0])
    assert all(np.isfinite(v) for r in evals for k, v in r.items() if k.startswith("fid"))
    # artifacts: all four grids + ckpt + best
    for suffix in ("obs", "post", "post_Q", "prior"):
        assert (tmp_path / "imgs" / f"4_{suffix}.png").exists()
    assert (tmp_path / "ckpt" / "4").exists()
    assert (tmp_path / "ckpt" / "best").exists()


@pytest.mark.slow
def test_gen_recon_resume(tmp_path):
    cfg = preset("svhn")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=16),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
        train=dataclasses.replace(
            cfg.train,
            batch_size=8,
            q_updates=1,
            eval_every=10_000,
            print_every=10_000,
            plot_every=10_000,
            ckpt_every=2,
        ),
    )
    imgs = np.random.RandomState(0).randint(0, 256, (32, 32, 32, 3), np.uint8)
    train_gen_recon(cfg, imgs, iterations=3, log_dir=str(tmp_path))
    assert (tmp_path / "ckpt" / "2").exists()

    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume_path=str(tmp_path / "ckpt" / "2"))
    )
    state = train_gen_recon(cfg2, imgs, iterations=4, log_dir=str(tmp_path))
    assert int(state.step) == 4  # resumed at 2, ran 2 more
