"""Reverse-diffusion sweep: the lax.scan must equal an explicit Python loop
(the reference's loop semantics, `diffusion_net.py:597-622`), step for step."""

import jax
import jax.numpy as jnp
import numpy as np

from damc_tpu.ops import (
    diffusion_reverse,
    logsnr_schedule,
    pred_x_from_eps,
    reverse_diffusion_sample,
)


def python_loop_reference(key, denoise_fn, z_init, n, lo, hi, var_type, with_noise):
    """Direct transliteration of the reference control flow using our ops."""
    b = z_init.shape[0]
    step_keys = jax.random.split(key, n)
    zt = z_init
    for idx, i in enumerate(range(n - 1, -1, -1)):
        logsnr_t = logsnr_schedule(jnp.full((b,), i / (n - 1.0)), lo, hi)
        logsnr_s = logsnr_schedule(
            jnp.full((b,), max(i - 1.0, 0.0) / (n - 1.0)), lo, hi
        )
        eps_pred = denoise_fn(zt, logsnr_t)
        pred_z = pred_x_from_eps(zt, eps_pred, logsnr_t[:, None])
        if i == 0:
            zt = pred_z
        else:
            dist = diffusion_reverse(
                pred_z, zt, logsnr_s[:, None], logsnr_t[:, None], var_type
            )
            if with_noise:
                noise = jax.random.normal(step_keys[idx], zt.shape, zt.dtype)
                zt = dist.mean + dist.std.astype(zt.dtype) * noise
            else:
                zt = dist.mean
    return zt


def fake_denoiser(zt, logsnr):
    # Deterministic, shape-preserving stand-in with real logsnr dependence.
    return 0.3 * zt + 0.01 * logsnr[:, None]


def test_scan_equals_python_loop_noiseless():
    z0 = jax.random.normal(jax.random.PRNGKey(0), (4, 6))
    for n in (2, 5, 17):
        ref = python_loop_reference(
            jax.random.PRNGKey(1), fake_denoiser, z0, n, -5.1, 9.8, "large", False
        )
        out = reverse_diffusion_sample(
            jax.random.PRNGKey(1), fake_denoiser, z0, n, -5.1, 9.8, "large", False
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_scan_equals_python_loop_with_noise():
    """Same keys => identical stochastic trajectories.

    NOTE: the scan draws its per-step key from split(key, n)[step] — the loop
    reference above mirrors exactly that key schedule."""
    z0 = jax.random.normal(jax.random.PRNGKey(2), (3, 4))
    n = 7
    ref = python_loop_reference(
        jax.random.PRNGKey(3), fake_denoiser, z0, n, -5.1, 9.8, "large", True
    )
    out = reverse_diffusion_sample(
        jax.random.PRNGKey(3), fake_denoiser, z0, n, -5.1, 9.8, "large", True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_guidance_combination():
    """cond_w > 0: eps = (1+w) eps_cond - w eps_unc (reference
    `diffusion_net.py:603-606`). With eps_unc == eps_cond the guided and
    unguided sweeps must coincide."""
    z0 = jax.random.normal(jax.random.PRNGKey(4), (2, 4))
    guided = reverse_diffusion_sample(
        jax.random.PRNGKey(5), fake_denoiser, z0, 5, -5.1, 9.8, "large", False,
        guided_denoise_fn=lambda k, z, l: fake_denoiser(z, l), cond_w=0.7,
    )
    plain = reverse_diffusion_sample(
        jax.random.PRNGKey(5), fake_denoiser, z0, 5, -5.1, 9.8, "large", False,
    )
    np.testing.assert_allclose(np.asarray(guided), np.asarray(plain), rtol=1e-5)

    # And with a DIFFERENT unconditional branch the output must differ.
    guided2 = reverse_diffusion_sample(
        jax.random.PRNGKey(5), fake_denoiser, z0, 5, -5.1, 9.8, "large", False,
        guided_denoise_fn=lambda k, z, l: jnp.zeros_like(z), cond_w=0.7,
    )
    assert not np.allclose(np.asarray(guided2), np.asarray(plain))


def test_small_var_type_also_runs():
    z0 = jax.random.normal(jax.random.PRNGKey(6), (2, 4))
    out = reverse_diffusion_sample(
        jax.random.PRNGKey(7), fake_denoiser, z0, 6, -5.1, 9.8, "small", True
    )
    assert np.all(np.isfinite(np.asarray(out)))
