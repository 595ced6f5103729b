"""Integration tests for the fused jitted train step (all workload variants)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from damc_tpu.train import create_state, lr_schedule, make_train_step
from damc_tpu.utils import preset


def tiny(cfg, **train_kw):
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=min(cfg.model.nz, 16)
        ),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=3),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
        train=dataclasses.replace(cfg.train, batch_size=4, q_updates=2, **train_kw),
    )
    return cfg


def params_changed(a, b):
    return any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_toy_step_updates_q_only():
    cfg = tiny(preset("toy"))
    state, models, opts = create_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(models, opts, cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    g_before = jax.tree.map(jnp.copy, state.params_g)
    new_state, metrics = step(state, x)
    assert params_changed(state.params_q, new_state.params_q)
    assert not params_changed(g_before, new_state.params_g)  # G frozen in toy
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["q_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))


def test_gen_recon_step_updates_all_nets():
    cfg = tiny(preset("svhn"))
    state, models, opts = create_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(models, opts, cfg))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3), minval=-1, maxval=1)
    new_state, metrics = step(state, x)
    assert params_changed(state.params_g, new_state.params_g)
    assert params_changed(state.params_e, new_state.params_e)
    assert params_changed(state.params_q, new_state.params_q)
    for k in ("g_loss", "q_loss", "e_pos", "e_neg", "prior_energy_final"):
        assert np.isfinite(float(metrics[k])), k


def test_e_energy_reg_default_off_is_exact_reference_cd():
    """e_energy_reg=0 (the default) must be bit-identical to the plain CD
    step, and a positive alpha must change ONLY the E update (G/Q see the
    same samples and losses). The regularizer is the opt-in long-horizon
    stabilizer for the CD runaway in artifacts/CD_DIVERGENCE.md."""
    cfg0 = tiny(preset("svhn"))
    cfg_reg = tiny(preset("svhn"), e_energy_reg=1e-3)
    assert cfg0.train.e_energy_reg == 0.0

    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3), minval=-1, maxval=1)
    state, models, opts = create_state(jax.random.PRNGKey(0), cfg0)
    s0, m0 = jax.jit(make_train_step(models, opts, cfg0))(state, x)
    state2, models2, opts2 = create_state(jax.random.PRNGKey(0), cfg_reg)
    s1, m1 = jax.jit(make_train_step(models2, opts2, cfg_reg))(state2, x)

    # Same PRNG + data: sampling and the G/Q sides are unaffected...
    for k in ("g_loss", "q_loss", "e_pos", "e_neg"):
        assert np.isclose(float(m0[k]), float(m1[k]), rtol=1e-6), k
    for a, b in zip(jax.tree.leaves(s0.params_g), jax.tree.leaves(s1.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # ...but the E gradient differs (the reg term's 2*alpha*E grad).
    assert params_changed(s0.params_e, s1.params_e)


def test_e_energy_reg_bounds_energies_at_fixed_point():
    """The regularized CD loss E+ - E- + alpha*(E+^2 + E-^2) has gradient
    1 + 2*alpha*E+ (resp. -1 + 2*alpha*E-) in energy space, so repeated
    updates on FIXED pos/neg samples drive the mean energies to the
    analytic fixed points -/+ 1/(2*alpha) instead of running away — the
    bounded-saturation mechanism observed on the 25k-iter TPU run
    (artifacts/CD_DIVERGENCE.md experiment 3). Plain CD (alpha=0) on the
    same samples grows the gap without bound."""
    import optax

    from damc_tpu.models.ebm import LatentEBM

    alpha = 0.01  # fixed points at -/+ 50
    nz, b = 8, 32
    ebm = LatentEBM(ndf=64)
    k = jax.random.PRNGKey(0)
    z_pos = jax.random.normal(jax.random.fold_in(k, 1), (b, nz))
    z_neg = jax.random.normal(jax.random.fold_in(k, 2), (b, nz)) + 4.0
    params = ebm.init(jax.random.fold_in(k, 3), z_pos)
    opt = optax.adam(1e-2)

    def run(alpha_val, n_steps=3000):
        def loss_fn(p):
            e_p, e_n = ebm.apply(p, z_pos), ebm.apply(p, z_neg)
            loss = e_p.mean() - e_n.mean()
            loss = loss + alpha_val * (jnp.mean(e_p**2) + jnp.mean(e_n**2))
            return loss, (e_p.mean(), e_n.mean())

        def body(carry, _):
            p, o = carry
            (_, (ep, en)), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            upd, o = opt.update(g, o, p)
            return (optax.apply_updates(p, upd), o), (ep, en)

        (_, _), (eps, ens) = jax.lax.scan(
            body, (params, opt.init(params)), None, length=n_steps
        )
        return float(eps[-1]), float(ens[-1])

    ep_reg, en_reg = run(alpha)
    assert abs(ep_reg - (-1.0 / (2 * alpha))) < 5.0, ep_reg  # -> -50
    assert abs(en_reg - (+1.0 / (2 * alpha))) < 5.0, en_reg  # -> +50

    ep_cd, en_cd = run(0.0)
    assert (en_cd - ep_cd) > 10.0 * (en_reg - ep_reg)  # unbounded vs ~100


def test_anomaly_step_dual_branch():
    cfg = tiny(preset("mnist_anomaly"))
    assert cfg.train.q_loss_both_branches and cfg.train.prior_chains == "single"
    state, models, opts = create_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(models, opts, cfg))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 28, 28, 1), minval=-1, maxval=1)
    new_state, metrics = step(state, x)
    assert np.isfinite(float(metrics["q_loss"]))


def test_ema_updates_only_on_schedule():
    cfg = tiny(preset("toy"))
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_every=2, ema_rho=0.5)
    )
    state, models, opts = create_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(models, opts, cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2))

    ema0 = jax.tree.map(jnp.copy, state.params_q_ema)
    state1, _ = step(state, x)  # step 0 -> (0+1) % 2 == 0? no wait: (0+1)%2=1 != 0
    assert not params_changed(ema0, state1.params_q_ema)
    state2, _ = step(state1, x)  # (1+1)%2 == 0 -> EMA fires
    assert params_changed(ema0, state2.params_q_ema)


def test_step_is_deterministic_given_state():
    cfg = tiny(preset("toy"))
    state, models, opts = create_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(models, opts, cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    s1, m1 = step(state, x)
    s2, m2 = step(state, x)
    np.testing.assert_array_equal(
        np.asarray(m1["q_loss"]), np.asarray(m2["q_loss"])
    )
    for a, b in zip(jax.tree.leaves(s1.params_q), jax.tree.leaves(s2.params_q)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lr_schedule_matches_reference_decay():
    cfg = preset("cifar10")
    sched = lr_schedule(2e-4, cfg)
    np.testing.assert_allclose(float(sched(0)), 2e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(999)), 2e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(1000)), 2e-4 * 0.99, rtol=1e-5)
    np.testing.assert_allclose(float(sched(5500)), 2e-4 * 0.99**5, rtol=1e-5)
    np.testing.assert_allclose(float(sched(10_000_000)), 1e-5, rtol=1e-5)  # floor


def test_q_lr_schedule_decays_per_iteration_not_per_inner_update():
    """Q steps its optimizer q_updates (6) times per training iteration;
    the reference decays q_lr once per 1000 ITERATIONS
    (`train_gen_recon.py:247-256`), so Q's schedule must divide the inner
    count out — otherwise it decays 6x too fast."""
    cfg = preset("cifar10")
    u = cfg.train.q_updates
    assert u == 6
    sched_q = lr_schedule(2e-4, cfg, updates_per_iter=u)
    sched_ref = lr_schedule(2e-4, cfg)
    for iteration in (0, 999, 1000, 5500, 123456):
        for j in range(u):  # any inner-update offset maps to the same iter
            np.testing.assert_allclose(
                float(sched_q(u * iteration + j)),
                float(sched_ref(iteration)),
                rtol=1e-6,
                err_msg=f"iter {iteration} inner {j}",
            )
