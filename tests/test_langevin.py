"""Tests for the scan-based Langevin kernels (golden values vs NumPy)."""

import jax
import jax.numpy as jnp
import numpy as np

from damc_tpu.ops import (
    adam_latent_descent,
    gaussian_posterior_energy,
    langevin_sample,
    posterior_energy,
    prior_energy,
)


def test_noiseless_descent_matches_numpy():
    """With noise off, Langevin is plain gradient descent on the energy.

    Golden check against a NumPy implementation for U(z) = 0.5 ||z||^2
    (grad = z): z_k = (1 - 0.5 eps^2)^k z_0.
    """
    z0 = np.random.RandomState(0).randn(8, 4).astype(np.float32)
    steps, eps = 13, 0.3
    energy = lambda z: 0.5 * jnp.sum(z * z, axis=-1)
    z_final, diags = langevin_sample(
        jax.random.PRNGKey(0), jnp.asarray(z0), energy, steps, eps, with_noise=False
    )
    expected = z0 * (1.0 - 0.5 * eps * eps) ** steps
    np.testing.assert_allclose(np.asarray(z_final), expected, rtol=1e-4)
    assert diags.energy_sum.shape == (steps,)
    # Energy must be monotonically decreasing for a contraction.
    assert np.all(np.diff(np.asarray(diags.energy_sum)) < 0)


def test_stationary_distribution_gaussian():
    """Long chain on U(z) = 0.5 z^2 must approach N(0, I) up to step-size bias.

    ULA with step eps on a standard Gaussian has stationary variance
    1 / (1 - eps^2/4) (exact for the linear SDE discretization).
    """
    eps = 0.25
    steps = 600
    n_chains = 2048
    z0 = jnp.zeros((n_chains, 2))
    energy = lambda z: 0.5 * jnp.sum(z * z, axis=-1)
    z_final, _ = langevin_sample(
        jax.random.PRNGKey(1), z0, energy, steps, eps, with_noise=True
    )
    var = np.var(np.asarray(z_final))
    expected_var = 1.0 / (1.0 - eps * eps / 4.0)
    np.testing.assert_allclose(var, expected_var, rtol=0.08)


def test_prior_energy_formula():
    ebm = lambda z: jnp.full((z.shape[0],), 3.0)
    z = jnp.ones((2, 4))
    en = prior_energy(ebm)(z)
    np.testing.assert_allclose(np.asarray(en), 3.0 + 0.5 * 4.0, rtol=1e-6)


def test_posterior_energy_formula():
    gen = lambda z: jnp.zeros((z.shape[0], 2, 2, 1))
    ebm = lambda z: jnp.zeros((z.shape[0],))
    x = jnp.ones((3, 2, 2, 1))
    z = jnp.zeros((3, 5))
    sigma = 0.1
    en = posterior_energy(gen, ebm, x, sigma)(z)
    # ||0 - 1||^2 over 4 pixels / (2 * 0.01) = 200
    np.testing.assert_allclose(np.asarray(en), 200.0, rtol=1e-5)


def test_gaussian_posterior_energy_no_ebm_term():
    gen = lambda z: z  # identity likelihood
    x = jnp.full((2, 3), 2.0)
    z = jnp.zeros((2, 3))
    en = gaussian_posterior_energy(gen, x, 0.25)(z)
    # 3 * 4 / (2 * 0.0625) = 96 ; plus 0.5*||z||^2 = 0
    np.testing.assert_allclose(np.asarray(en), 96.0, rtol=1e-5)


def test_grads_do_not_leak_into_params():
    """The KERNEL itself must not backprop through the chain: the energy
    closure here deliberately does NOT stop-gradient `w`, so a zero grad
    can only come from langevin_sample's own output detachment
    (`ops/langevin.py` stop_gradient on z_final)."""
    w = jnp.array(2.0)

    def run(w):
        energy = lambda z: 0.5 * jnp.sum((w * z) ** 2, axis=-1)
        z_final, _ = langevin_sample(
            jax.random.PRNGKey(0), jnp.ones((2, 2)), energy, 5, 0.1, with_noise=False
        )
        return jnp.sum(z_final)

    g = jax.grad(run)(w)
    assert float(g) == 0.0
    # Control: without the kernel's detachment the same chain DOES carry a
    # gradient (guards against the test going vacuous again).
    def run_manual(w):
        z = jnp.ones((2, 2))
        energy = lambda zz: 0.5 * jnp.sum((w * zz) ** 2, axis=-1)
        for _ in range(5):
            z = z - 0.5 * 0.1 * 0.1 * jax.grad(lambda zz: energy(zz).sum())(z)
        return jnp.sum(z)

    assert float(jax.grad(run_manual)(w)) != 0.0


def test_adam_latent_descent_minimizes():
    target = jnp.array([[3.0, -2.0]])
    loss_fn = lambda z: jnp.sum((z - target) ** 2, axis=-1)
    z0 = jnp.zeros((1, 2))
    z_final, losses = adam_latent_descent(z0, loss_fn, steps=500, lr=0.05)
    np.testing.assert_allclose(np.asarray(z_final), np.asarray(target), atol=1e-2)
    assert losses.shape == (500,)
    assert float(losses[-1]) < float(losses[0])


def test_langevin_jits_and_is_reproducible():
    energy = lambda z: 0.5 * jnp.sum(z * z, axis=-1)
    run = jax.jit(
        lambda key, z: langevin_sample(key, z, energy, 10, 0.1, with_noise=True)[0]
    )
    z0 = jnp.ones((4, 3))
    a = run(jax.random.PRNGKey(7), z0)
    b = run(jax.random.PRNGKey(7), z0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = run(jax.random.PRNGKey(8), z0)
    assert not np.allclose(np.asarray(a), np.asarray(c))
