"""The fused DAMC training step — ONE jitted function per iteration.

Re-architects the reference's outer hot loop (`train_gen_recon.py:179-261`,
`train_anomaly_det.py:107-185`, `toy_example/toy_example.py:183-232`) as a
single XLA program: EMA-amortizer sampling, posterior/prior Langevin scans,
6x inner Q updates (`lax.fori_loop`), G and E updates, LR schedule (inside
optax), and the periodic EMA mix — with zero host synchronization per step
(the reference syncs every Langevin step via `.item()`).

Workload variants are config, not code forks:
  * gen_recon: 2B prior chains, single-branch Q loss, G+E updates
  * anomaly:   B prior chains, dual-branch Q loss (mask and 1-mask)
  * toy:       no EBM / no prior chains / Q-only updates, Gaussian-prior
               posterior energy
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.amortizer import sample_q
from ..ops.langevin import (
    gaussian_posterior_energy,
    langevin_sample,
    posterior_energy,
    prior_langevin_auto,
)
from ..utils.config import Config
from .state import DAMCState, ModelBundle, Optimizers

Metrics = Dict[str, jax.Array]


def make_train_step(
    models: ModelBundle,
    opts: Optimizers,
    cfg: Config,
    mesh=None,
    pallas_interpret: bool = False,
) -> Callable[[DAMCState, jax.Array], Tuple[DAMCState, Metrics]]:
    """Build the jittable train step for this workload config.

    `mesh`: the device mesh the step will be jitted over (if any). The scan/
    conv paths partition via GSPMD from the caller's in_shardings alone, but
    the fused Pallas kernels are opaque to GSPMD — with a multi-device
    `data` axis they dispatch through `jax.shard_map` (chains partitioned,
    weights replicated; see ops/pallas/*_sharded). Pass the SAME mesh used
    for the jit shardings.

    `pallas_interpret`: run the fused kernels in interpreter mode (False |
    'mosaic' | 'plain', see `ops/pallas/fused_langevin._interpret_mode`) and
    force their dispatch on non-TPU backends — lets CPU-mesh tests execute
    the exact multi-chip program (tests/test_pallas_sharding.py).
    """
    tc, mc, dc = cfg.train, cfg.mcmc, cfg.diffusion
    sg = jax.lax.stop_gradient
    data_sharded = mesh is not None and mesh.shape.get("data", 1) > 1
    # sample_q kwargs for the deployed dispatch: under a mesh the fused
    # sweep must go through shard_map; interpret mode forces fused=True so
    # CPU tests trace the same program.
    q_kw = dict(mesh=mesh if data_sharded else None)
    if pallas_interpret:
        q_kw.update(fused=True, fused_interpret=pallas_interpret)

    def train_step(state: DAMCState, x: jax.Array) -> Tuple[DAMCState, Metrics]:
        rng, k_mask, k_q0, k_post, k_neg_init, k_prior, k_qloss = jax.random.split(
            state.rng, 7
        )
        b = x.shape[0]

        # Conditional/unconditional training mask (p_mask rows use the prior
        # embedding), `train_gen_recon.py:187-190`. Anomaly training instead
        # uses a fixed all-ones mask and trains the uncond branch explicitly
        # (`train_anomaly_det.py:134-140`).
        if tc.random_mask:
            z_mask = (
                jax.random.uniform(k_mask, (b,)) >= dc.p_mask
            ).astype(x.dtype)[:, None]
        else:
            z_mask = jnp.ones((b, 1), x.dtype)

        # ---- 1. Amortized init: z0 ~ Q_ema(. | x) ------------------------
        z0 = sample_q(sg(state.params_q_ema), models.amortizer, k_q0, x=x, **q_kw)

        # ---- 2. Posterior Langevin refinement ----------------------------
        gen_fn = lambda z: models.generator.apply(sg(state.params_g), z)
        if tc.remat_generator:
            # Trade FLOPs for activation memory in the per-step G fwd+bwd
            # (useful at 256^2 with large batches).
            gen_fn = jax.checkpoint(gen_fn)
        if models.ebm is not None:
            ebm_fn = lambda z: models.ebm.apply(sg(state.params_e), z)
            post_energy = posterior_energy(gen_fn, ebm_fn, x, mc.g_llhd_sigma)
        else:
            post_energy = gaussian_posterior_energy(gen_fn, x, mc.g_llhd_sigma)
        zk_pos, post_diag = langevin_sample(
            k_post, z0, post_energy, mc.g_l_steps, mc.g_l_step_size, mc.g_l_with_noise
        )

        # ---- 3. Prior Langevin (negative chains for CD) -------------------
        zk_neg = None
        prior_final_energy = None
        if tc.prior_chains != "none" and models.ebm is not None:
            if tc.prior_chains == "double":
                # cat([z0, randn]) — 2B chains (`train_gen_recon.py:206-209`)
                z_neg_init = jnp.concatenate(
                    [z0, jax.random.normal(k_neg_init, z0.shape, z0.dtype)], axis=0
                )
            else:  # 'single' (anomaly, `train_anomaly_det.py:129-131`)
                z_neg_init = z0
            zk_neg, prior_final_energy = prior_langevin_auto(
                k_prior,
                z_neg_init,
                models.ebm,
                state.params_e,
                mc.e_l_steps,
                mc.e_l_step_size,
                mc.e_l_with_noise,
                use_pallas=tc.use_pallas,
                dots_dtype=tc.pallas_dots_dtype,
                mesh=mesh if data_sharded else None,
                pallas_interpret=pallas_interpret,
            )

        # ---- 4. q_updates x amortizer update (denoising score matching) ---
        def q_loss_fn(params_q, key):
            k1, k2 = jax.random.split(key)
            loss = models.amortizer.apply(
                params_q, k1, zk_pos, x, z_mask, method="loss"
            ).mean()
            if tc.q_loss_both_branches:
                loss = loss + models.amortizer.apply(
                    params_q, k2, zk_pos, x, 1.0 - z_mask, method="loss"
                ).mean()
            return loss

        def q_update(i, carry):
            params_q, opt_q, _ = carry
            key = jax.random.fold_in(k_qloss, i)
            loss, grads = jax.value_and_grad(q_loss_fn)(params_q, key)
            updates, opt_q = opts.q.update(grads, opt_q, params_q)
            params_q = optax.apply_updates(params_q, updates)
            return (params_q, opt_q, loss)

        params_q, opt_q, q_loss = jax.lax.fori_loop(
            0,
            tc.q_updates,
            q_update,
            (state.params_q, state.opt_q, jnp.zeros((), jnp.float32)),
        )

        # ---- 5. Generator update: ||G(z+) - x||^2 -------------------------
        params_g, opt_g = state.params_g, state.opt_g
        if tc.update_g:

            def g_loss_fn(pg):
                x_hat = models.generator.apply(pg, zk_pos)
                return jnp.sum(
                    (x_hat - x).reshape(b, -1) ** 2, axis=-1
                ).mean()

            g_loss, g_grads = jax.value_and_grad(g_loss_fn)(params_g)
            g_updates, opt_g = opts.g.update(g_grads, opt_g, params_g)
            params_g = optax.apply_updates(params_g, g_updates)
        else:
            # Reconstruction monitor only (`toy_example.py:207`).
            g_loss = jnp.sum(
                (models.generator.apply(params_g, zk_pos) - x).reshape(b, -1) ** 2,
                axis=-1,
            ).mean()

        # ---- 6. EBM update: contrastive divergence ------------------------
        params_e, opt_e = state.params_e, state.opt_e
        e_pos = e_neg = jnp.zeros(())
        if tc.update_e and models.ebm is not None and zk_neg is not None:

            def e_loss_fn(pe):
                e_p = models.ebm.apply(pe, zk_pos)
                e_n = models.ebm.apply(pe, zk_neg)
                pos, neg = e_p.mean(), e_n.mean()
                loss = pos - neg
                if tc.e_energy_reg > 0.0:  # static: off = exact reference CD
                    loss = loss + tc.e_energy_reg * (
                        jnp.mean(e_p**2) + jnp.mean(e_n**2)
                    )
                return loss, (pos, neg)

            (_, (e_pos, e_neg)), e_grads = jax.value_and_grad(
                e_loss_fn, has_aux=True
            )(params_e)
            e_updates, opt_e = opts.e.update(e_grads, opt_e, params_e)
            params_e = optax.apply_updates(params_e, e_updates)

        # ---- 7. Periodic EMA mix Q -> Q_ema -------------------------------
        # rho * q + (1 - rho) * ema every ema_every steps
        # (`train_gen_recon.py:258-261`; rho=0.75 for toy).
        do_ema = ((state.step + 1) % tc.ema_every == 0).astype(jnp.float32)
        rho_eff = tc.ema_rho * do_ema  # 0 when not an EMA step
        params_q_ema = jax.tree.map(
            lambda q, e: rho_eff * q + (1.0 - rho_eff) * e,
            params_q,
            state.params_q_ema,
        )

        metrics: Metrics = {
            "g_loss": g_loss,
            "q_loss": q_loss,
            "post_energy_final": post_diag.energy_sum[-1] / b,
            "zk_pos_abs_max": jnp.max(jnp.abs(zk_pos)),
        }
        if zk_neg is not None and prior_final_energy is not None:
            metrics["e_pos"] = e_pos
            metrics["e_neg"] = e_neg
            metrics["prior_energy_final"] = jnp.mean(prior_final_energy)

        new_state = state.replace(
            step=state.step + 1,
            rng=rng,
            params_g=params_g,
            params_e=params_e,
            params_q=params_q,
            params_q_ema=params_q_ema,
            opt_g=opt_g,
            opt_e=opt_e,
            opt_q=opt_q,
        )
        return new_state, metrics

    return train_step
