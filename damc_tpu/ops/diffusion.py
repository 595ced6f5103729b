"""Continuous-logSNR diffusion math (pure JAX functions).

TPU-native re-implementation of the variance-preserving diffusion primitives
the DAMC amortizer is built on. Behavioral spec comes from the reference
(`/root/reference/workspace/src/diffusion_helper_func.py:36-87`); the code here
is written from the underlying math (VDM-style continuous-logSNR
parameterization), not translated.

Conventions
-----------
* ``logsnr`` is the log signal-to-noise ratio lambda = log(alpha^2 / sigma^2)
  of the variance-preserving forward process z_t = alpha_t * x + sigma_t * eps
  with alpha_t^2 = sigmoid(lambda_t), sigma_t^2 = sigmoid(-lambda_t).
* ``t`` runs in [0, 1]; t=0 is clean (logsnr_max), t=1 is noise (logsnr_min).
* All schedule math is done in float32 regardless of payload dtype — bf16 is
  unsafe near the tan() endpoints (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_LOG2 = 0.6931471805599453


@jax.custom_jvp
def log1mexp(x: jax.Array) -> jax.Array:
    """Numerically stable ``log(1 - exp(-x))`` for ``x > 0``.

    Uses the two-branch scheme of Maechler (2012): ``log(-expm1(-x))`` for
    small x, ``log1p(-exp(-x))`` for large x. A custom JVP supplies the exact
    derivative ``1/expm1(x)`` so the unused branch can never poison gradients.
    (Reference parity: custom autograd Function at
    `diffusion_helper_func.py:9-34`.)
    """
    x = jnp.asarray(x)
    big = x > _LOG2
    # Clamp each branch's argument into its numerically-safe region; `where`
    # picks the valid branch.
    safe_big = jnp.where(big, x, 1.0)
    safe_small = jnp.where(big, 1.0, x)
    return jnp.where(
        big,
        jnp.log1p(-jnp.exp(-safe_big)),
        jnp.log(-jnp.expm1(-safe_small)),
    )


@log1mexp.defjvp
def _log1mexp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = log1mexp(x)
    return y, dx / jnp.expm1(x)


def logsnr_schedule(
    t: jax.Array,
    logsnr_min: float = -20.0,
    logsnr_max: float = 20.0,
) -> jax.Array:
    """Cosine-style continuous logSNR schedule ``-2 log(tan(a t + b))``.

    Endpoint-matched so that logsnr(0) == logsnr_max and logsnr(1) ==
    logsnr_min (reference: `diffusion_helper_func.py:41-50`; call sites use
    logsnr_min=-5.1, logsnr_max=9.8, `train_gen_recon.py:374-375`).
    """
    t = jnp.asarray(t, jnp.float32)
    b = jnp.arctan(jnp.exp(-0.5 * jnp.float32(logsnr_max)))
    a = jnp.arctan(jnp.exp(-0.5 * jnp.float32(logsnr_min))) - b
    return -2.0 * jnp.log(jnp.tan(a * t + b))


class Gaussian(NamedTuple):
    """Diagonal Gaussian moments, mirroring the reference's dict returns."""

    mean: jax.Array
    std: jax.Array
    var: jax.Array
    logvar: jax.Array


def diffusion_forward(x: jax.Array, logsnr: jax.Array) -> Gaussian:
    """Marginal q(z_t | x) of the VP forward process.

    mean = x * sqrt(sigmoid(logsnr)), var = sigmoid(-logsnr)
    (reference: `diffusion_helper_func.py:72-78`).
    """
    logsnr = jnp.asarray(logsnr, jnp.float32)
    var = jax.nn.sigmoid(-logsnr)
    return Gaussian(
        mean=x * jnp.sqrt(jax.nn.sigmoid(logsnr)).astype(x.dtype),
        std=jnp.sqrt(var),
        var=var,
        logvar=jax.nn.log_sigmoid(-logsnr),
    )


def pred_x_from_eps(z: jax.Array, eps: jax.Array, logsnr: jax.Array) -> jax.Array:
    """Recover x0-hat from an epsilon prediction.

    x = (z - sigma * eps) / alpha with 1/alpha = sqrt(1 + exp(-logsnr)) and
    sigma = rsqrt(1 + exp(logsnr)) (reference: `diffusion_helper_func.py:36-39`).
    """
    logsnr = jnp.asarray(logsnr, jnp.float32)
    inv_alpha = jnp.sqrt(1.0 + jnp.exp(-logsnr))
    sigma = jax.lax.rsqrt(1.0 + jnp.exp(logsnr))
    return (inv_alpha * (z - eps * sigma)).astype(z.dtype)


def diffusion_reverse(
    x: jax.Array,
    z_t: jax.Array,
    logsnr_s: jax.Array,
    logsnr_t: jax.Array,
    var_type: str = "small",
) -> Gaussian:
    """DDPM ancestral-step posterior q(z_s | z_t, x) with s < t (logsnr_s > logsnr_t).

    mean = r * (alpha_s/alpha_t) * z_t + (1 - r) * alpha_s * x, r = SNR(t)/SNR(s)
    var 'large' = (1 - r) * sigmoid(-logsnr_t)   [used by all call sites]
    var 'small' = (1 - a_s) / (1 - a_t) * (1 - a_t / a_s),  a = sigmoid(logsnr)
    (reference: `diffusion_helper_func.py:52-70`; 'large' selected at
    `train_gen_recon.py:377`).
    """
    logsnr_s = jnp.asarray(logsnr_s, jnp.float32)
    logsnr_t = jnp.asarray(logsnr_t, jnp.float32)
    alpha_st = jnp.sqrt((1.0 + jnp.exp(-logsnr_t)) / (1.0 + jnp.exp(-logsnr_s)))
    alpha_s = jnp.sqrt(jax.nn.sigmoid(logsnr_s))
    r = jnp.exp(logsnr_t - logsnr_s)
    one_minus_r = -jnp.expm1(logsnr_t - logsnr_s)
    mean = (r * alpha_st * z_t + one_minus_r * alpha_s * x).astype(z_t.dtype)

    if var_type == "large":
        var = one_minus_r * jax.nn.sigmoid(-logsnr_t)
        logvar = log1mexp(logsnr_s - logsnr_t) + jax.nn.log_sigmoid(-logsnr_t)
    elif var_type == "small":
        a_t = jax.nn.sigmoid(logsnr_t)
        a_s = jax.nn.sigmoid(logsnr_s)
        beta_t = 1.0 - a_t / a_s
        var = (1.0 - a_s) / (1.0 - a_t) * beta_t
        logvar = jnp.log(var)
    else:
        raise ValueError(f"unknown var_type {var_type!r}")
    return Gaussian(mean=mean, std=jnp.sqrt(var), var=var, logvar=logvar)


def denoise_true(
    key: jax.Array,
    z: jax.Array,
    x0: jax.Array,
    logsnr_t: jax.Array,
    logsnr_s: jax.Array,
) -> jax.Array:
    """Ground-truth ancestral denoise step with the beta-tilde ('small') std.

    Kept for capability parity with `diffusion_helper_func.py:80-87` (unused
    by reference entry points).
    """
    b = z.shape[0]
    dist = diffusion_reverse(
        x=x0,
        z_t=z,
        logsnr_s=logsnr_s.reshape(b, 1),
        logsnr_t=logsnr_t.reshape(b, 1),
        var_type="small",
    )
    return dist.mean + dist.std.astype(z.dtype) * jax.random.normal(key, z.shape, z.dtype)


def sweep_logsnr_grid(n_interval: int, logsnr_min: float, logsnr_max: float):
    """(logsnr_t, logsnr_s) arrays for the n-step reverse sweep, in scan
    order i = n-1 .. 0 (reference `diffusion_net.py:597-600`).

    Single source of truth for the step grid: the scan sampler
    (`ops/reverse_diffusion.py`), the hoisted context tables
    (`models/amortizer.py::sample_q`), and the fused kernel's coefficient
    table (`ops/pallas/fused_qsweep.py::step_coefficients`) must index the
    SAME grid positionally, so they all call this.
    """
    i_arr = jnp.arange(n_interval - 1, -1, -1, dtype=jnp.float32)
    logsnr_t = logsnr_schedule(i_arr / (n_interval - 1.0), logsnr_min, logsnr_max)
    logsnr_s = logsnr_schedule(
        jnp.maximum(i_arr - 1.0, 0.0) / (n_interval - 1.0), logsnr_min, logsnr_max
    )
    return logsnr_t, logsnr_s
