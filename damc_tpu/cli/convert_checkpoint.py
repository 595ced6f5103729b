"""CLI: migrate a reference PyTorch checkpoint into a damc_tpu Orbax state.

Converts a reference `.pth.tar` (the `train_gen_recon.py:282-294` save
format) into this framework's full `DAMCState` and writes an Orbax
checkpoint that the training drivers can `--resume_path` from. Optimizer
states start fresh (torch Adam moments don't transfer); params, EMA params,
and the iteration counter carry over exactly.

    python -m damc_tpu.cli.convert_checkpoint --dataset cifar10 \
        --torch_ckpt best.pth.tar --out_dir converted_ckpt
"""

from __future__ import annotations

import argparse
import os

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="cifar10")
    p.add_argument("--torch_ckpt", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--name", type=str, default=None, help="ckpt name (default: iter)")
    args = p.parse_args(argv)

    from ..train.state import create_state
    from ..utils.checkpoint import save_checkpoint
    from ..utils.config import preset
    from ..utils.torch_compat import convert_reference_checkpoint

    cfg = preset(args.dataset)
    converted = convert_reference_checkpoint(args.torch_ckpt, args.dataset)

    state, _, _ = create_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    replacements = {"step": jax.numpy.int32(converted["iter"])}
    for field in ("params_g", "params_e", "params_q", "params_q_ema"):
        if field in converted:
            replacements[field] = converted[field]
    state = state.replace(**replacements)

    name = args.name or str(converted["iter"])
    path = save_checkpoint(args.out_dir, name, state)
    print(f"[damc] wrote converted checkpoint (iter {converted['iter']}) to {path}")
    print(f"[damc] resume with: --resume_path {os.path.join(args.out_dir, name)}")


if __name__ == "__main__":
    main()
