"""CLI: 2-D toy posterior experiment (DAMC vs long-run Langevin parity).

Mirrors `/root/reference/workspace/toy_example/toy_example.py`: trains the
amortizer on the pinwheel posterior, periodically compares against the
1000-step ground-truth chain (recon losses + KDE plots), and additionally
reports the MMD^2 parity statistic.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from ..utils.config import preset
from ..utils.logging import MetricsLogger, save_kde_plot
from .common import make_log_dir


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--iterations", type=int, default=3000)
    p.add_argument(
        "--viz_iter", type=int, default=100,
        help="period of the in-training KDE-plot + parity eval "
        "(reference `toy_example.py:251-302`); 0 disables",
    )
    p.add_argument(
        "--viz_batches", type=int, default=10,
        help="500-sample batches per viz eval (reference uses 10)",
    )
    p.add_argument("--gt_steps", type=int, default=1000)
    p.add_argument("--log_path", type=str, default="logs")
    p.add_argument("--n_interval", type=int, default=None)
    args = p.parse_args(argv)

    from .common import enable_compile_cache

    enable_compile_cache()
    cfg = preset("toy")
    if args.n_interval is not None:
        cfg = dataclasses.replace(
            cfg, diffusion=dataclasses.replace(cfg.diffusion, n_interval=args.n_interval)
        )
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, seed=args.seed, log_path=args.log_path)
    )
    log_dir = make_log_dir(cfg)
    viz_dir = os.path.join(log_dir, "viz")
    logger = MetricsLogger(log_dir)
    print(f"[damc] logging to {log_dir}")

    from ..train.state import build_models
    from ..train.toy import eval_toy_parity, make_toy_parity_fn, train_toy

    # Module definitions are stateless; this bundle applies the params the
    # training loop produces, so the viz callback can eval mid-training.
    models = build_models(cfg)
    parity_fn = make_toy_parity_fn(models, cfg, gt_steps=args.gt_steps)

    def viz(it, state):
        # Fresh draws per viz, like the reference's `sample_z(bs, seed + it)`
        # (`toy_example.py:262`).
        res = eval_toy_parity(
            state, models, cfg, seed=args.seed + it,
            n_batches=args.viz_batches, gt_steps=args.gt_steps,
            eval_fn=parity_fn,
        )
        logger.log(
            it,
            {k: res[k] for k in ("g_loss_q", "g_loss_l", "mmd2")},
            prefix="eval",
        )
        # Same artifacts/cadence as the reference (`toy_example.py:294-302`).
        save_kde_plot(res["zq"], f"{viz_dir}/{it}_lang_post_Q.png")
        save_kde_plot(res["zl"], f"{viz_dir}/{it}_lang_post_gt.png")
        print(
            f"[damc] it {it} viz: g_loss Q {res['g_loss_q']:.6f} | "
            f"g_loss L {res['g_loss_l']:.6f} | mmd2 {res['mmd2']:.6f}"
        )

    def callback(it, state, metrics):
        if it % 100 == 0:
            logger.log(it, metrics)
        if args.viz_iter and it % args.viz_iter == 0:
            viz(it, state)

    state, _, cfg = train_toy(
        cfg, iterations=args.iterations, seed=args.seed, callback=callback
    )
    res = eval_toy_parity(
        state, models, cfg, seed=args.seed, gt_steps=args.gt_steps,
        n_batches=args.viz_batches, eval_fn=parity_fn,
    )
    logger.log(
        args.iterations,
        {k: v for k, v in res.items() if k in ("g_loss_q", "g_loss_l", "mmd2")},
        prefix="eval",
    )
    save_kde_plot(res["zq"], f"{viz_dir}/final_lang_post_Q.png")
    save_kde_plot(res["zl"], f"{viz_dir}/final_lang_post_gt.png")
    print(
        f"[damc] g_loss Q {res['g_loss_q']:.6f} | g_loss L {res['g_loss_l']:.6f} "
        f"| mmd2 {res['mmd2']:.6f}"
    )


if __name__ == "__main__":
    main()
