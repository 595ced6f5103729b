"""Amortized ancestral reverse-diffusion sweep as one ``lax.scan``.

This is the DAMC sampler Q(x) — the reference's 100-iteration Python loop of
denoiser forwards (`/root/reference/workspace/src/diffusion_net.py:585-622`)
re-shaped for XLA: the per-step logSNR pairs are precomputed as static (n,)
arrays and the whole sweep is a single scan whose body is one fused denoiser
forward + moment update. Conditioning (image embedding vs prior embedding) is
baked into the ``denoise_fn`` closure by the caller, so the same kernel serves
posterior sampling, prior sampling, and classifier-free-guided sampling.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .diffusion import (
    sweep_logsnr_grid,
    diffusion_reverse,
    pred_x_from_eps,
)

# denoise_fn(z_t (B, nz), logsnr (B,)) -> eps_pred (B, nz)
DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def reverse_diffusion_sample(
    key: jax.Array,
    denoise_fn: DenoiseFn,
    z_init: jax.Array,
    n_interval: int,
    logsnr_min: float,
    logsnr_max: float,
    var_type: str = "large",
    with_noise: bool = True,
    guided_denoise_fn: Optional[Callable[[jax.Array, jax.Array, jax.Array], jax.Array]] = None,
    cond_w: float = 0.0,
    step_xs=None,
) -> jax.Array:
    """Ancestral sampling from z_T ~ N(0, I) down to z_0.

    Steps i = n_interval-1 .. 0 with t_i = i / (n_interval - 1):
      eps_hat = denoise_fn(z_t, logsnr(t_i))
      x_hat   = pred_x_from_eps(z_t, eps_hat, logsnr_t)
      z_{i-1} ~ q(z_s | z_t, x_hat)   (mean-only if not with_noise)
    and the final step (i == 0) returns x_hat directly
    (reference: `diffusion_net.py:597-622`).

    Args:
      key: PRNG key for the ancestral noise (and guidance embeddings).
      denoise_fn: conditional eps-predictor closure (params + xemb baked in).
      z_init: (B, nz) starting noise z_T.
      n_interval: number of reverse steps (reference default 100,
        `train_gen_recon.py:372`).
      guided_denoise_fn: optional fn(step_key, z, logsnr) -> eps for the
        UNconditional branch of classifier-free guidance; combined as
        (1 + cond_w) * eps_cond - cond_w * eps_unc when cond_w > 0
        (reference: `diffusion_net.py:603-606`).
      step_xs: optional pytree with leading axis n_interval (ordered like the
        sweep: index 0 = step i=n-1); when given, its per-step slice is passed
        to denoise_fn as a third argument — used for precomputed context
        tables (the hoisted denoiser path, `models/denoiser.py`).

    Returns:
      z_0 samples, (B, nz), with gradients stopped (the reference consumes
      Q-samples detached).
    """
    b = z_init.shape[0]
    n = n_interval
    # Static per-step schedule tables, scanned over in reverse order
    # (single source of truth: ops/diffusion.py::sweep_logsnr_grid).
    logsnr_t_arr, logsnr_s_arr = sweep_logsnr_grid(n, logsnr_min, logsnr_max)
    is_last = jnp.arange(n - 1, -1, -1, dtype=jnp.float32) == 0.0

    use_guidance = guided_denoise_fn is not None and cond_w > 0

    def body(zt, xs):
        logsnr_t, logsnr_s, last, step_key, step_x = xs
        logsnr_t_vec = jnp.full((b,), logsnr_t)
        if step_x is None:
            eps_pred = denoise_fn(zt, logsnr_t_vec)
        else:
            eps_pred = denoise_fn(zt, logsnr_t_vec, step_x)
        if use_guidance:
            cfg_key, step_key = jax.random.split(step_key)
            eps_unc = guided_denoise_fn(cfg_key, zt, logsnr_t_vec)
            eps_pred = (1.0 + cond_w) * eps_pred - cond_w * eps_unc

        pred_z = pred_x_from_eps(zt, eps_pred, logsnr_t)
        dist = diffusion_reverse(
            x=pred_z, z_t=zt, logsnr_s=logsnr_s, logsnr_t=logsnr_t, var_type=var_type
        )
        if with_noise:
            noise = jax.random.normal(step_key, zt.shape, zt.dtype)
            z_next = dist.mean + dist.std.astype(zt.dtype) * noise
        else:
            z_next = dist.mean
        # Final step returns the x0 prediction; `where` keeps the scan static.
        zt = jnp.where(last, pred_z, z_next)
        return zt, None

    step_keys = jax.random.split(key, n)
    z0, _ = jax.lax.scan(
        body, z_init, (logsnr_t_arr, logsnr_s_arr, is_last, step_keys, step_xs)
    )
    return jax.lax.stop_gradient(z0)
