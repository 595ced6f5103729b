"""Generation / reconstruction / scoring pipelines built on the core kernels.

TPU-native equivalents of `MCMC.py:119-176` (EBM-prior and DAMC-prior sample
generation) and the eval loops of `train_gen_recon.py:296-348`,
`train_anomaly_det.py:206-248`, `eval_*.py` — all jitted, batched, and free of
per-step host sync.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.amortizer import sample_q
from ..ops.langevin import (
    langevin_sample,
    posterior_energy,
    prior_langevin_auto,
)
from ..utils.config import Config
from .state import DAMCState, ModelBundle


def gen_samples_ebm_prior(
    key: jax.Array,
    state: DAMCState,
    models: ModelBundle,
    cfg: Config,
    batch: int,
    mesh=None,
) -> jax.Array:
    """x = G(z), z ~ short-run Langevin on the EBM prior from N(0, I).

    (Reference `gen_samples`, `MCMC.py:119-128`.) Returns images in [-1, 1].
    With a mesh, the fused Pallas chain dispatches through shard_map over
    the `data` axis (the conv decode partitions via GSPMD as before).
    """
    mc = cfg.mcmc
    k_init, k_chain = jax.random.split(key)
    z0 = jax.random.normal(k_init, (batch, cfg.model.nz))
    z, _ = prior_langevin_auto(
        k_chain,
        z0,
        models.ebm,
        state.params_e,
        mc.e_l_steps,
        mc.e_l_step_size,
        mc.e_l_with_noise,
        use_pallas=cfg.train.use_pallas,
        dots_dtype=cfg.train.pallas_dots_dtype,
        mesh=mesh,
    )
    return models.generator.apply(state.params_g, z)


def gen_samples_damc_prior(
    key: jax.Array,
    state: DAMCState,
    models: ModelBundle,
    cfg: Config,
    batch: int,
    mesh=None,
) -> Tuple[jax.Array, jax.Array]:
    """x = G(z), z ~ Q(.) — one amortized reverse-diffusion pass.

    (Reference `gen_samples_with_diffusion_prior`, `MCMC.py:146-150`.)
    With a mesh, the fused Pallas sweep dispatches through shard_map.
    """
    z = sample_q(
        state.params_q, models.amortizer, key, x=None, b=batch, mesh=mesh
    )
    return models.generator.apply(state.params_g, z), z


def reconstruct(
    key: jax.Array,
    state: DAMCState,
    models: ModelBundle,
    cfg: Config,
    x: jax.Array,
    langevin_steps: int = 10,
    mesh=None,
) -> Tuple[jax.Array, jax.Array]:
    """Posterior inference for reconstruction: Q(x) init + short NOISELESS
    Langevin refinement, then decode (`train_gen_recon.py:324-348`,
    10 steps at train-eval; 5 for anomaly eval).

    Returns (x_hat, z). With a mesh, the fused Q-sweep shard_maps over
    `data` (the Langevin refinement is a scan — GSPMD partitions it).
    """
    mc = cfg.mcmc
    k_q, k_l = jax.random.split(key)
    z0 = sample_q(state.params_q, models.amortizer, k_q, x=x, mesh=mesh)
    gen_fn = lambda z: models.generator.apply(jax.lax.stop_gradient(state.params_g), z)
    if models.ebm is not None:
        ebm_fn = lambda z: models.ebm.apply(jax.lax.stop_gradient(state.params_e), z)
        energy = posterior_energy(gen_fn, ebm_fn, x, mc.g_llhd_sigma)
    else:
        from ..ops.langevin import gaussian_posterior_energy

        energy = gaussian_posterior_energy(gen_fn, x, mc.g_llhd_sigma)
    z, _ = langevin_sample(
        k_l, z0, energy, langevin_steps, mc.g_l_step_size, with_noise=False
    )
    x_hat = models.generator.apply(state.params_g, z)
    return x_hat, z


def recon_mse_per_image(x_hat: jax.Array, x: jax.Array) -> jax.Array:
    """Per-image mean-square error vector (`train_gen_recon.py:342`,
    `torch.mean((x_hat - x) ** 2, dim=[1,2,3])`). Per-image values let the
    eval loop pad tail batches to a fixed compiled shape and then drop the
    padded rows before summing — the reference's drop_last=False protocol."""
    b = x.shape[0]
    return jnp.mean((x_hat - x).reshape(b, -1) ** 2, axis=-1)


def anomaly_scores(
    key: jax.Array,
    state: DAMCState,
    models: ModelBundle,
    cfg: Config,
    x: jax.Array,
    langevin_steps: int = 10,
    mesh=None,
) -> jax.Array:
    """Anomaly score: ||x_hat - x||^2 + E(z) + 0.5 ||z||^2 after Q init +
    noiseless posterior Langevin (`train_anomaly_det.py:206-248`,
    `eval_anomaly_det.py:100-125`). Higher = more anomalous; fed to the PR
    curve directly with anomaly-label 1, matching the reference."""
    x_hat, z = reconstruct(key, state, models, cfg, x, langevin_steps, mesh=mesh)
    b = x.shape[0]
    recon = jnp.sum((x_hat - x).reshape(b, -1) ** 2, axis=-1)
    en = models.ebm.apply(state.params_e, z)
    return recon + en + 0.5 * jnp.sum(z * z, axis=-1)


def to_unit_range(x: jax.Array) -> jax.Array:
    """[-1, 1] -> [0, 1] with clamping, the FID input convention
    (`MCMC.py:138`)."""
    return (1.0 + jnp.clip(x, -1.0, 1.0)) / 2.0
