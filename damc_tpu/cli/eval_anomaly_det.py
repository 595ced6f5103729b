"""CLI: evaluate a trained anomaly-detection checkpoint (AUPRC).

Mirrors `/root/reference/workspace/eval_anomaly_det.py`: best checkpoint,
5-step noiseless posterior Langevin (`eval_anomaly_det.py:108-112`), per-label
g_llhd_sigma presets (0.1 for digit 1; 1.0 for 4/5/7/9 — README.md:64-72).
"""

from __future__ import annotations

import argparse
import dataclasses

import jax

from ..data.datasets import load_mnist_anomaly
from .common import add_common_flags, config_from_args

PER_LABEL_SIGMA = {1: 0.1, 4: 1.0, 5: 1.0, 7: 1.0, 9: 1.0}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_flags(p)
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--ckpt_name", type=str, default="best")
    args = p.parse_args(argv)

    from .common import enable_compile_cache, maybe_init_multihost

    maybe_init_multihost(args)  # must precede any jax backend use
    enable_compile_cache()
    cfg = config_from_args(args, preset_name="mnist_anomaly")
    if args.g_llhd_sigma is None:
        sigma = PER_LABEL_SIGMA.get(cfg.train.heldout_digit, 1.0)
        cfg = dataclasses.replace(
            cfg, mcmc=dataclasses.replace(cfg.mcmc, g_llhd_sigma=sigma)
        )

    test_x, test_y = load_mnist_anomaly(
        cfg.train.data_path, cfg.train.heldout_digit, "test"
    )

    from ..train.anomaly import evaluate_auprc
    from ..train.driver_utils import broadcast_metric, host_local_state
    from ..train.state import create_state
    from ..utils.checkpoint import restore_checkpoint

    multihost = jax.process_count() > 1
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    state = restore_checkpoint(args.ckpt_dir, args.ckpt_name, state)
    # Multi-host: the AUPRC sweep pulls per-image scores to the host, so it
    # runs per-host redundant on the restored host-local state (the anomaly
    # train driver's eval protocol, train/anomaly.py) — every host computes
    # the identical number; host 0's is printed everywhere. No global-mesh
    # replication: it would be a pure wasted cross-host transfer, the mesh
    # is never used on this path (r4 advisor finding).
    mesh = None
    if not multihost and args.use_mesh and len(jax.devices()) > 1:
        from ..parallel import make_mesh, replicate

        mesh = make_mesh()
        state = replicate(mesh, state)
    score = evaluate_auprc(
        jax.random.PRNGKey(cfg.train.seed),
        host_local_state(state) if multihost else state,
        models, cfg, test_x, test_y, langevin_steps=5,
        mesh=mesh,
    )
    if multihost:
        score = broadcast_metric(score)
    print(f"[damc] heldout digit {cfg.train.heldout_digit} AUPRC: {score:.4f}")


if __name__ == "__main__":
    main()
