"""CLI: export a damc_tpu Orbax checkpoint as a reference-format `.pth.tar`.

The reverse of `convert_checkpoint`: a model trained (or fine-tuned) in
this framework becomes a torch checkpoint the reference scripts load
directly ({G,Q,Q_dummy,E}_state_dict + iter, the `train_gen_recon.py:163-170`
resume format; strict `load_state_dict` verified in
tests/test_torch_export.py). Migration works in BOTH directions.

    python -m damc_tpu.cli.export_checkpoint --dataset cifar10 \
        --ckpt runs/exp/ckpt/best --out best_export.pth.tar
"""

from __future__ import annotations

import argparse
import os.path as osp

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="cifar10")
    p.add_argument("--ckpt", type=str, required=True, help="Orbax checkpoint dir")
    p.add_argument("--out", type=str, required=True, help="output .pth.tar path")
    args = p.parse_args(argv)

    from ..train.state import create_state
    from ..utils.checkpoint import restore_checkpoint
    from ..utils.config import preset
    from ..utils.torch_compat import export_reference_checkpoint

    cfg = preset(args.dataset)
    state, _, _ = create_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    directory, name = osp.split(args.ckpt.rstrip("/"))
    state = restore_checkpoint(directory, name, state)

    export_reference_checkpoint(
        state, args.out, dataset=args.dataset, nxemb=cfg.model.nxemb
    )
    print(f"[damc] exported iteration {int(state.step)} to {args.out} "
          f"(reference {{G,Q,Q_dummy,E}}_state_dict format)")


if __name__ == "__main__":
    main()
