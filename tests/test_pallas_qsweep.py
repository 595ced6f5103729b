"""Fused Pallas reverse-sweep kernel: parity vs the lax.scan sampler.

Interpreter mode on CPU (hardware numbers + noise statistics:
tools/validate_qsweep_tpu.py). Noiseless sweeps must match the scan path
(same weights, same hoisted tables, same schedule coefficients — the
coefficients are linearity-probed from the canonical diffusion ops, so any
disagreement is a kernel bug, not a schedule reimplementation drift).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from damc_tpu.models.amortizer import sample_q
from damc_tpu.ops.diffusion import logsnr_schedule
from damc_tpu.ops.pallas.fused_qsweep import (
    denoiser_layer_params,
    fits_vmem,
    fused_reverse_sweep,
    step_coefficients,
)
from damc_tpu.train.state import create_state
from damc_tpu.utils.config import preset


@pytest.fixture(scope="module")
def setup():
    cfg = preset("cifar10")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, nz=16, ngf=8, nif=8, nxemb=24, ntemb=8
        ),
        diffusion=dataclasses.replace(
            cfg.diffusion, n_interval=6, with_noise=False
        ),
    )
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    return cfg, state, models


def run_both(cfg, state, models, b=12):
    """(z_scan, z_fused) for identical weights/tables/inits, noiseless."""
    model = models.amortizer
    params = state.params_q
    n = cfg.diffusion.n_interval

    x = jax.random.uniform(jax.random.PRNGKey(1), (b, 32, 32, 3), minval=-1, maxval=1)
    xemb = model.apply(params, x, method="encode")
    z_init = jax.random.normal(jax.random.PRNGKey(2), (b, model.nz))

    from damc_tpu.ops.diffusion import sweep_logsnr_grid

    grid, _ = sweep_logsnr_grid(n, model.logsnr_min, model.logsnr_max)
    tables = model.apply(
        params, grid, xemb, method=lambda m, g, e: m.p.sample_tables(g, e)
    )

    from damc_tpu.ops.reverse_diffusion import reverse_diffusion_sample

    def denoise_fn(z, logsnr, pre_t_step):
        return model.apply(
            params, z, pre_t_step, tables["pre_x"],
            method=lambda m, zz, t, xx: m.p.denoise_from_tables(zz, t, xx),
        )

    z_scan = reverse_diffusion_sample(
        jax.random.PRNGKey(3), denoise_fn, z_init, n,
        model.logsnr_min, model.logsnr_max, model.var_type,
        with_noise=False, step_xs=tables["pre_t"],
    )

    fourier, layers = denoiser_layer_params(params["params"]["p"])
    coeffs = step_coefficients(n, model.logsnr_min, model.logsnr_max, model.var_type)
    z_fused = fused_reverse_sweep(
        z_init, fourier, layers, tables["pre_x"], tables["pre_t"], coeffs,
        seed=jnp.int32(0), steps=n, with_noise=False,
        residual=model.residual, interpret=True,
    )
    return np.asarray(z_scan), np.asarray(z_fused)


@pytest.mark.slow
def test_noiseless_fused_matches_scan(setup):
    cfg, state, models = setup
    z_scan, z_fused = run_both(cfg, state, models)
    np.testing.assert_allclose(z_fused, z_scan, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_sample_q_fused_dispatch_matches(setup):
    """sample_q(fused=True) must equal sample_q(fused=False) noiseless,
    through the public API with the same key."""
    cfg, state, models = setup
    x = jax.random.uniform(jax.random.PRNGKey(5), (8, 32, 32, 3), minval=-1, maxval=1)
    z_ref = sample_q(
        state.params_q, models.amortizer, jax.random.PRNGKey(6), x=x, fused=False
    )
    z_fused = sample_q(
        state.params_q, models.amortizer, jax.random.PRNGKey(6), x=x,
        fused=True, fused_interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(z_fused), np.asarray(z_ref), atol=2e-4, rtol=1e-4
    )


@pytest.mark.slow
def test_vmem_gate(setup):
    """The compact family fits; the StyleGAN-width family must not."""
    cfg, state, models = setup
    params = state.params_q
    fourier, layers = denoiser_layer_params(params["params"]["p"])
    n = cfg.diffusion.n_interval
    widths = [lt[1].shape[-1] for lt in layers]
    pre_x = [jnp.zeros((256, w)) for w in widths]
    pre_t = [jnp.zeros((n, w)) for w in widths]
    assert fits_vmem(fourier, layers, pre_x, pre_t)

    # Honest StyleGAN-width footprint (nz=7168, widths 1024): kernels at
    # (in, 1024), biases at their real (1, 1024) — _layer_tuple order is
    # lin_k, lin_b, skip_k, skip_b, gate_k, gate_b, hyper_k.
    def big_layer(d_in):
        k = lambda: jnp.zeros((d_in, 1024))
        b = lambda: jnp.zeros((1, 1024))
        return (k(), b(), k(), b(), k(), b(), jnp.zeros((1152, 1024)))

    big_layers = [big_layer(2 * 7168)] + [big_layer(1024)] * (len(layers) - 1)
    big_px = [jnp.zeros((256, 1024))] * len(layers)
    big_pt = [jnp.zeros((100, 1024))] * len(layers)
    assert not fits_vmem(jnp.zeros((7168, 3584)), big_layers, big_px, big_pt)
