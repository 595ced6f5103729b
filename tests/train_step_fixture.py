"""Shared fixture for the distributed train-step parity workers.

Both the 2-process (multi-host) worker and the single-process 2-device
oracle in tests/test_distributed.py run EXACTLY this code — same tiny
config, same seed, same fused train step via the production
`make_step_fn` wiring — differing only in how the mesh spans processes
and how the global batch is assembled.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax


def tiny_cfg(batch_size: int = 8):
    from damc_tpu.utils.config import preset

    cfg = preset("svhn")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=8
        ),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
        train=dataclasses.replace(
            cfg.train, batch_size=batch_size, q_updates=2
        ),
    )


def run_steps(cfg, mesh, make_batch: Callable, n_steps: int = 3) -> Dict[str, float]:
    """create_state(seed 0) -> make_step_fn(mesh) -> n identical steps.

    `make_batch(mesh)` returns the data-sharded global batch. Returns the
    final step's metrics as host floats (read via addressable shards, which
    works for replicated outputs on multi-host meshes where plain float()
    would raise on non-fully-addressable arrays).
    """
    from damc_tpu.train.driver_utils import make_step_fn, metric_float
    from damc_tpu.train.state import create_state

    state, models, opts = create_state(jax.random.PRNGKey(0), cfg)
    step, state = make_step_fn(models, opts, cfg, mesh, state)
    x = make_batch(mesh)
    metrics = {}
    for _ in range(n_steps):
        state, metrics = step(state, x)
    return {k: metric_float(v) for k, v in metrics.items()}
