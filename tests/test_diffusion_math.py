"""Unit tests for the continuous-logSNR diffusion math.

Checks closed-form identities and endpoint behavior (SURVEY.md §4: exceed the
reference's zero-test bar with golden-value math tests).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from damc_tpu.ops import (
    diffusion_forward,
    diffusion_reverse,
    log1mexp,
    logsnr_schedule,
    pred_x_from_eps,
)


class TestLog1mExp:
    def test_matches_naive_in_safe_region(self):
        x = np.linspace(0.5, 30.0, 100).astype(np.float32)
        expected = np.log(1.0 - np.exp(-x.astype(np.float64)))
        np.testing.assert_allclose(
            np.asarray(log1mexp(x)), expected, rtol=2e-4, atol=1e-4
        )

    def test_small_x_stable(self):
        # Naive log(1 - exp(-x)) loses precision for tiny x; the two-branch
        # form must agree with the float64 ground truth.
        x = np.array([1e-6, 1e-4, 1e-2], dtype=np.float32)
        expected = np.log(-np.expm1(-x.astype(np.float64)))
        np.testing.assert_allclose(
            np.asarray(log1mexp(x)), expected.astype(np.float32), rtol=1e-4
        )

    def test_gradient_exact(self):
        # d/dx log(1 - e^-x) = 1 / expm1(x); check both branches.
        for x0 in (0.3, 5.0):
            g = jax.grad(lambda x: log1mexp(x))(jnp.float32(x0))
            np.testing.assert_allclose(float(g), 1.0 / np.expm1(x0), rtol=1e-5)

    def test_no_nan_gradient_across_branch(self):
        xs = jnp.linspace(0.01, 3.0, 50)
        grads = jax.vmap(jax.grad(log1mexp))(xs)
        assert np.all(np.isfinite(np.asarray(grads)))


class TestLogsnrSchedule:
    def test_endpoints(self):
        # logsnr(0) == logsnr_max, logsnr(1) == logsnr_min for the defaults
        # used by all call sites (train_gen_recon.py:374-375).
        lo, hi = -5.1, 9.8
        np.testing.assert_allclose(
            float(logsnr_schedule(jnp.array(0.0), lo, hi)), hi, rtol=1e-4
        )
        np.testing.assert_allclose(
            float(logsnr_schedule(jnp.array(1.0), lo, hi)), lo, rtol=1e-4
        )

    def test_monotone_decreasing(self):
        t = jnp.linspace(0.0, 1.0, 101)
        vals = np.asarray(logsnr_schedule(t, -5.1, 9.8))
        assert np.all(np.diff(vals) < 0)

    def test_closed_form(self):
        # Direct check of -2 log(tan(a t + b)).
        lo, hi = -20.0, 20.0
        b = np.arctan(np.exp(-0.5 * hi))
        a = np.arctan(np.exp(-0.5 * lo)) - b
        t = np.linspace(0.0, 1.0, 11).astype(np.float32)
        expected = -2.0 * np.log(np.tan(a * t + b))
        np.testing.assert_allclose(
            np.asarray(logsnr_schedule(t, lo, hi)), expected, rtol=1e-4, atol=2e-3
        )


class TestForwardReverse:
    def test_forward_moments_variance_preserving(self):
        logsnr = jnp.linspace(-5.0, 9.0, 7)
        x = jnp.ones((7,))
        dist = diffusion_forward(x, logsnr)
        # alpha^2 + sigma^2 == 1 (VP process).
        np.testing.assert_allclose(
            np.asarray(dist.mean**2 + dist.var), 1.0, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(dist.std**2), np.asarray(dist.var), rtol=1e-3, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(jnp.exp(dist.logvar)), np.asarray(dist.var), rtol=1e-4, atol=1e-6
        )

    def test_pred_x_from_eps_inverts_forward(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (16, 8))
        eps = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
        logsnr = jnp.full((16, 1), 2.5)
        dist = diffusion_forward(x, logsnr)
        z = dist.mean + dist.std * eps
        x_rec = pred_x_from_eps(z, eps, logsnr)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)

    @pytest.mark.parametrize("var_type", ["large", "small"])
    def test_reverse_identity_when_s_equals_t_limit(self, var_type):
        # As s -> t, r -> 1: mean -> z_t, var -> 0.
        z_t = jnp.ones((4, 3)) * 0.7
        x = jnp.zeros((4, 3))
        lam_t = jnp.full((4, 1), 1.0)
        lam_s = lam_t + 1e-4
        dist = diffusion_reverse(x, z_t, lam_s, lam_t, var_type)
        np.testing.assert_allclose(np.asarray(dist.mean), 0.7, atol=1e-3)
        assert float(jnp.max(dist.var)) < 1e-3

    def test_reverse_consistency_with_forward(self):
        # Marginal consistency: if z_t = alpha_t x (no noise) then the
        # posterior mean must be alpha_s x.
        x = jnp.full((5, 2), 1.3)
        lam_t = jnp.full((5, 1), -1.0)
        lam_s = jnp.full((5, 1), 2.0)
        alpha_t = jnp.sqrt(jax.nn.sigmoid(lam_t))
        alpha_s = jnp.sqrt(jax.nn.sigmoid(lam_s))
        z_t = alpha_t * x
        dist = diffusion_reverse(x, z_t, lam_s, lam_t, "large")
        np.testing.assert_allclose(
            np.asarray(dist.mean), np.asarray(alpha_s * x), rtol=1e-5
        )

    def test_reverse_large_var_closed_form(self):
        lam_t = jnp.full((3, 1), -2.0)
        lam_s = jnp.full((3, 1), 1.0)
        dist = diffusion_reverse(
            jnp.zeros((3, 2)), jnp.ones((3, 2)), lam_s, lam_t, "large"
        )
        r = np.exp(-2.0 - 1.0)
        # var_large = (1 - r) * sigmoid(-logsnr_t) with logsnr_t = -2
        expected_var = (1 - r) * (1.0 / (1.0 + np.exp(-2.0)))
        np.testing.assert_allclose(np.asarray(dist.var), expected_var, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(jnp.exp(dist.logvar)), expected_var, rtol=1e-4
        )

    def test_reverse_small_var_closed_form(self):
        lam_t, lam_s = -2.0, 1.0
        a_t = 1.0 / (1.0 + np.exp(2.0))
        a_s = 1.0 / (1.0 + np.exp(-1.0))
        beta = 1.0 - a_t / a_s
        expected = (1.0 - a_s) / (1.0 - a_t) * beta
        dist = diffusion_reverse(
            jnp.zeros((2, 2)),
            jnp.ones((2, 2)),
            jnp.full((2, 1), lam_s),
            jnp.full((2, 1), lam_t),
            "small",
        )
        np.testing.assert_allclose(np.asarray(dist.var), expected, rtol=1e-5)

    def test_schedule_math_stays_float32_under_bf16_payload(self):
        z = jnp.ones((4, 2), jnp.bfloat16)
        dist = diffusion_forward(z, jnp.full((4, 1), 9.8))
        assert dist.mean.dtype == jnp.bfloat16
        assert dist.std.dtype == jnp.float32  # schedule math kept in fp32
