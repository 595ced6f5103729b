"""Toy 2-D posterior workload: the DAMC-vs-long-run-Langevin parity gate.

Library form of `/root/reference/workspace/toy_example/toy_example.py`:
a frozen random MLP likelihood G, pinwheel latents, x = G(z) + 0.25 eps, and a
Q amortizer trained to match 50-step posterior Langevin chains; evaluated by
comparing Q samples against 1000-step ground-truth Langevin from noise
(`toy_example.py:251-302`). The reference eyeballs KDE plots; we also compute
an MMD^2 two-sample statistic so parity is an automated gate (SURVEY.md §4).

Quirk preserved: the reference draws the SAME pinwheel batch every training
iteration (`sample_z(bs, args.seed)` with a fixed seed, `toy_example.py:184`)
— only the observation noise is fresh.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pinwheel import sample_pinwheel
from ..metrics.mmd import mmd2_rbf
from ..models.amortizer import sample_q
from ..ops.langevin import gaussian_posterior_energy, langevin_sample
from ..utils.config import Config, preset
from .state import DAMCState, ModelBundle, create_state
from .step import make_train_step


def make_observations(
    key: jax.Array, models: ModelBundle, params_g, z: jax.Array, noise_std: float = 0.25
) -> jax.Array:
    """x = G(z) + noise_std * eps (`toy_example.py:185`)."""
    gz = models.generator.apply(params_g, z)
    # Noise takes G's OUTPUT shape (== z's only because the toy G maps
    # 2-D latents to 2-D observations).
    return gz + noise_std * jax.random.normal(key, gz.shape)


def train_toy(
    cfg: Optional[Config] = None,
    iterations: int = 300,
    seed: int = 1,
    callback: Optional[Callable[[int, DAMCState, Dict], None]] = None,
) -> Tuple[DAMCState, ModelBundle, Config]:
    """Run the toy training loop; returns the final state."""
    cfg = cfg or preset("toy")
    key = jax.random.PRNGKey(seed)
    k_init, k_loop = jax.random.split(key)
    state, models, opts = create_state(k_init, cfg)
    step = jax.jit(make_train_step(models, opts, cfg), donate_argnums=0)

    bs = cfg.train.batch_size
    z_np = sample_pinwheel(bs, seed)  # fixed batch, reference quirk
    z = jnp.asarray(z_np)

    for it in range(iterations):
        k_noise = jax.random.fold_in(k_loop, it)
        x = make_observations(k_noise, models, state.params_g, z)
        state, metrics = step(state, x)
        if callback is not None:
            callback(it, state, metrics)
    return state, models, cfg


def make_toy_parity_fn(models: ModelBundle, cfg: Config, gt_steps: int = 1000):
    """Compiled fn(state, key, z_data) -> (zq, zl, loss_q, loss_l).

    `state` is an argument (not a closure) so one compiled program serves
    every periodic viz eval of a training run."""
    mc = cfg.mcmc

    @jax.jit
    def eval_batch(state, key, z_data):
        k_x, k_q, k_gt_init, k_gt = jax.random.split(key, 4)
        x = make_observations(k_x, models, state.params_g, z_data)
        zq = sample_q(state.params_q, models.amortizer, k_q, x=x)

        gen_fn = lambda z: models.generator.apply(
            jax.lax.stop_gradient(state.params_g), z
        )
        energy = gaussian_posterior_energy(gen_fn, x, mc.g_llhd_sigma)
        zl, _ = langevin_sample(
            k_gt,
            jax.random.normal(k_gt_init, z_data.shape),
            energy,
            gt_steps,
            mc.g_l_step_size,
            with_noise=True,
        )
        loss_q = jnp.sum((gen_fn(zq) - x) ** 2)
        loss_l = jnp.sum((gen_fn(zl) - x) ** 2)
        return zq, zl, loss_q, loss_l

    return eval_batch


def eval_toy_parity(
    state: DAMCState,
    models: ModelBundle,
    cfg: Config,
    seed: int = 1,
    n_batches: int = 10,
    batch: int = 500,
    gt_steps: int = 1000,
    eval_fn=None,
) -> Dict[str, float]:
    """Compare the amortized posterior against long-run Langevin ground truth.

    Mirrors `toy_example.py:251-302`: n_batches x batch fresh pinwheel/x
    draws; Q(x) vs `gt_steps`-step Langevin from N(0, I); returns the recon
    losses (g_loss Q / g_loss L, the reference's printed quality signal) plus
    MMD^2 between the two posterior sample clouds, and the raw samples.
    Pass `eval_fn` from `make_toy_parity_fn` to reuse one compiled program
    across periodic calls.
    """
    eval_batch = eval_fn or make_toy_parity_fn(models, cfg, gt_steps)

    zq_all, zl_all = [], []
    loss_q_sum = loss_l_sum = 0.0
    for i in range(n_batches):
        z_data = jnp.asarray(sample_pinwheel(batch, seed + 7919 + i))
        key = jax.random.fold_in(jax.random.PRNGKey(seed), 10_000 + i)
        zq, zl, lq, ll = eval_batch(state, key, z_data)
        zq_all.append(np.asarray(zq))
        zl_all.append(np.asarray(zl))
        loss_q_sum += float(lq)
        loss_l_sum += float(ll)

    zq_cat = np.concatenate(zq_all, axis=0)
    zl_cat = np.concatenate(zl_all, axis=0)
    n_total = n_batches * batch
    mmd2 = float(mmd2_rbf(jnp.asarray(zq_cat), jnp.asarray(zl_cat)))
    return {
        "g_loss_q": loss_q_sum / n_total,
        "g_loss_l": loss_l_sum / n_total,
        "mmd2": mmd2,
        "zq": zq_cat,
        "zl": zl_cat,
    }
