"""Per-phase breakdown of the flagship train step on TPU.

Jits each sub-phase of the CIFAR-10 gen_recon iteration separately (Q_ema
sample, posterior Langevin, prior Langevin, the 6x Q updates, G update,
E update) and times them against the fused single-program step — documents
where the ~180 ms goes and how much the fusion saves over per-phase
dispatch.

Run: python tools/bench_train_phases.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def force_sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timed(fn, args, iters=20):
    out = fn(*args)
    force_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import optax

    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.models.amortizer import sample_q
    from damc_tpu.ops.langevin import (
        langevin_sample,
        posterior_energy,
        prior_langevin_auto,
    )
    from damc_tpu.train import create_state, make_train_step
    from damc_tpu.utils import preset

    enable_compile_cache()
    cfg = preset("cifar10")
    mc = cfg.mcmc
    B = cfg.train.batch_size
    state, models, opts = create_state(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 32, 32, 3), minval=-1, maxval=1)
    sg = jax.lax.stop_gradient

    @jax.jit
    def q_sample(params_q_ema, xx, key):
        return sample_q(sg(params_q_ema), models.amortizer, key, x=xx)

    z0 = q_sample(state.params_q_ema, x, jax.random.PRNGKey(2))

    @jax.jit
    def posterior(params_g, params_e, z, xx, key):
        gen_fn = lambda zz: models.generator.apply(sg(params_g), zz)
        ebm_fn = lambda zz: models.ebm.apply(sg(params_e), zz)
        return langevin_sample(
            key, z, posterior_energy(gen_fn, ebm_fn, xx, mc.g_llhd_sigma),
            mc.g_l_steps, mc.g_l_step_size, mc.g_l_with_noise,
        )[0]

    zk_pos = posterior(state.params_g, state.params_e, z0, x, jax.random.PRNGKey(3))

    @jax.jit
    def prior(params_e, z, key):
        z2 = jnp.concatenate([z, jax.random.normal(key, z.shape)], axis=0)
        return prior_langevin_auto(
            key, z2, models.ebm, params_e, mc.e_l_steps, mc.e_l_step_size,
            mc.e_l_with_noise, use_pallas=cfg.train.use_pallas,
        )[0]

    @jax.jit
    def q_updates(params_q, opt_q, z, xx, key):
        mask = jnp.ones((z.shape[0], 1), jnp.float32)

        def one(i, carry):
            pq, oq = carry
            k = jax.random.fold_in(key, i)
            loss_fn = lambda p: models.amortizer.apply(
                p, k, z, xx, mask, method="loss"
            ).mean()
            grads = jax.grad(loss_fn)(pq)
            updates, oq = opts.q.update(grads, oq, pq)
            return (optax.apply_updates(pq, updates), oq)

        return jax.lax.fori_loop(0, cfg.train.q_updates, one, (params_q, opt_q))

    @jax.jit
    def g_update(params_g, opt_g, z, xx):
        loss_fn = lambda pg: jnp.sum(
            (models.generator.apply(pg, z) - xx).reshape(z.shape[0], -1) ** 2, axis=-1
        ).mean()
        grads = jax.grad(loss_fn)(params_g)
        updates, opt_g = opts.g.update(grads, opt_g, params_g)
        return optax.apply_updates(params_g, updates)

    @jax.jit
    def e_update(params_e, opt_e, zp, zn):
        loss_fn = lambda pe: models.ebm.apply(pe, zp).mean() - models.ebm.apply(pe, zn).mean()
        grads = jax.grad(loss_fn)(params_e)
        updates, opt_e = opts.e.update(grads, opt_e, params_e)
        return optax.apply_updates(params_e, updates)

    zk_neg = prior(state.params_e, z0, jax.random.PRNGKey(4))

    rows = [
        ("Q_ema sample (100-step sweep)", timed(q_sample, (state.params_q_ema, x, jax.random.PRNGKey(5)))),
        ("posterior Langevin (30 steps)", timed(posterior, (state.params_g, state.params_e, z0, x, jax.random.PRNGKey(6)))),
        ("prior Langevin (2Bx60 steps)", timed(prior, (state.params_e, z0, jax.random.PRNGKey(7)))),
        ("6x Q updates", timed(q_updates, (state.params_q, state.opt_q, zk_pos, x, jax.random.PRNGKey(8)))),
        ("G update", timed(g_update, (state.params_g, state.opt_g, zk_pos, x))),
        ("E update", timed(e_update, (state.params_e, state.opt_e, zk_pos, zk_neg))),
    ]

    step = jax.jit(make_train_step(models, opts, cfg))
    fused = timed(step, (state, x))

    total = sum(t for _, t in rows)
    print(f"{'phase':36s} {'ms':>8s} {'%':>6s}")
    for name, t in rows:
        print(f"{name:36s} {t * 1000:8.2f} {100 * t / total:6.1f}")
    print(f"{'sum of phases (separate dispatch)':36s} {total * 1000:8.2f}")
    print(f"{'fused single-program step':36s} {fused * 1000:8.2f}")
    print(f"fusion saves {100 * (1 - fused / total):.1f}% vs per-phase dispatch")


if __name__ == "__main__":
    main()
