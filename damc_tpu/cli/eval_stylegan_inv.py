"""CLI: StyleGAN inversion evaluation (FFHQ / LSUN-tower).

Mirrors `/root/reference/workspace/eval_stylegan_inv.py`: loads the pretrained
StyleGAN generator/encoder + VGG16 perceptual net (torch .pth checkpoints,
converted on the fly), the trained DAMC amortizer checkpoint, then sweeps the
test set with Q-init + 100-step Adam refinement and reports recon MSE + FID
of the reconstructions.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import load_image_folder, load_lsun
from ..metrics.fid import compute_stats
from ..models.stylegan import load_stylegan
from ..utils.config import preset
from .common import make_feature_fn, to_pm1


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--dataset", type=str, default="ffhq", choices=["ffhq", "lsun_tower"])
    p.add_argument(
        "--data_path", type=str, required=True,
        help="folder of test images, or (lsun_tower) the LSUN root "
        "containing tower_val_lmdb",
    )
    p.add_argument(
        "--lsun_classes", type=str, default="tower_val",
        help="comma-separated LSUN classes (reference eval uses tower_val, "
        "eval_stylegan_inv.py:76-77)",
    )
    p.add_argument("--pretrained_G_path", type=str, required=True)
    p.add_argument("--pretrained_E_path", type=str, required=True)
    p.add_argument("--pretrained_F_path", type=str, required=True, help="vgg16.pth")
    p.add_argument("--q_ckpt_dir", type=str, default=None, help="orbax dir of trained Q")
    p.add_argument("--q_ckpt_name", type=str, default="best")
    p.add_argument(
        "--resolution", type=int, default=256,
        help="StyleGAN resolution (published models are 256; smaller values "
        "serve scaled-down checkpoints and tests)",
    )
    # 8 is the measured TPU throughput knee for the f32 inversion program:
    # 3.55 img/s at 29.8% MFU vs 2.04 img/s at B=4; B=16 plateaus
    # (tools/mfu_inversion.py, artifacts/mfu_inversion.json). With
    # --compute_dtype bfloat16 the knee moves to 16 (5.28 img/s,
    # artifacts/mfu_inversion_bf16_scale.json).
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument(
        "--compute_dtype", type=str, default="float32",
        choices=["float32", "bfloat16"],
        help="Adam-refine forward/backward dtype; bf16 is quality-gated "
        "(tests/test_stylegan_inversion.py) and faster where the refine "
        "loop is bandwidth-bound (artifacts/mfu_inversion.json)",
    )
    p.add_argument("--g_l_steps", type=int, default=100)
    p.add_argument("--g_l_step_size", type=float, default=0.01)
    p.add_argument("--n_fid_samples", type=int, default=50000)
    p.add_argument("--limit", type=int, default=None, help="cap on test images")
    p.add_argument(
        "--use_mesh", action="store_true",
        help="data-parallel inversion over all devices (batch_size must "
        "divide by the device count)",
    )
    args = p.parse_args(argv)

    from .common import enable_compile_cache

    enable_compile_cache()  # the Q-sweep+Adam program takes minutes to compile
    res = args.resolution
    stylegan_params = load_stylegan(
        generator_path=args.pretrained_G_path,
        encoder_path=args.pretrained_E_path,
        vgg_path=args.pretrained_F_path,
        resolution=res,
    )

    from ..train.stylegan_inv import evaluate_inversion, make_stylegan_amortizer
    from ..utils.checkpoint import restore_checkpoint

    import dataclasses

    cfg = preset("celebaHQ")  # 256-res defaults for the diffusion settings
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, image_size=res)
    )
    q_model = make_stylegan_amortizer(cfg, resolution=res)
    xemb_dummy = np.zeros((1, q_model.nz), np.float32)
    q_params = q_model.init(jax.random.PRNGKey(0), xemb_dummy)
    if args.q_ckpt_dir:
        q_params = restore_checkpoint(args.q_ckpt_dir, args.q_ckpt_name, q_params)
    else:
        print("[damc] WARNING: no --q_ckpt_dir given; using random Q init")

    import os.path as osp

    if args.dataset == "lsun_tower" and osp.isdir(
        osp.join(args.data_path, args.lsun_classes.split(",")[0] + "_lmdb")
    ):
        images = to_pm1(
            load_lsun(args.data_path, args.lsun_classes.split(","), res, limit=args.limit)
        )
    else:
        images = to_pm1(load_image_folder(args.data_path, res, limit=args.limit))
    feature_fn, metric_name = make_feature_fn(cfg)
    from ..metrics.fid import images_to_unit

    # Real-stats pass capped at n_fid_samples (reference
    # `eval_stylegan_inv.py:100-105`).
    unit = images_to_unit(images[: args.n_fid_samples])
    real_mu, real_sigma = compute_stats(
        feature_fn, (unit[i : i + 64] for i in range(0, len(unit), 64))
    )

    mesh = None
    if args.use_mesh:
        from ..parallel import make_mesh

        mesh = make_mesh()

    out = evaluate_inversion(
        jax.random.PRNGKey(args.seed),
        q_params,
        q_model,
        stylegan_params,
        images,
        batch=args.batch_size,
        steps=args.g_l_steps,
        lr=args.g_l_step_size,
        resolution=res,
        compute_dtype=None if args.compute_dtype == "float32" else jnp.bfloat16,
        mesh=mesh,
        feature_fn=feature_fn,
        real_mu=real_mu,
        real_sigma=real_sigma,
        fid_metric_name=metric_name,
    )
    label = "FID" if metric_name == "fid" else metric_name
    print(
        f"[damc] recon MSE {out['recon_mse']:.5f} "
        f"{label} {out.get(metric_name, float('nan')):.3f}"
    )


if __name__ == "__main__":
    main()
