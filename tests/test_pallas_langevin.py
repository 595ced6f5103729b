"""Fused Pallas prior-Langevin kernel: correctness vs the lax.scan path.

Runs in interpreter mode on CPU (the real kernel path is exercised on TPU by
bench.py). Noiseless chains must match the reference scan EXACTLY (same math,
no RNG); noisy chains are checked statistically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from damc_tpu.models import LatentEBM
from damc_tpu.ops.langevin import langevin_sample, prior_energy
from damc_tpu.ops.pallas.fused_langevin import (
    ebm_params_to_dense_weights,
    fused_prior_langevin,
)


@pytest.fixture(scope="module")
def setup():
    ebm = LatentEBM(ndf=64)
    z = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    params = ebm.init(jax.random.PRNGKey(1), z)
    return ebm, params, z


@pytest.mark.slow
def test_noiseless_matches_lax_scan(setup):
    ebm, params, z = setup
    steps, eps = 7, 0.3

    ref_energy = prior_energy(lambda zz: ebm.apply(jax.lax.stop_gradient(params), zz))
    z_ref, _ = langevin_sample(
        jax.random.PRNGKey(2), z, ref_energy, steps, eps, with_noise=False
    )

    weights = ebm_params_to_dense_weights(params)
    z_pallas = fused_prior_langevin(
        z, *weights, seed=jnp.int32(0), steps=steps, step_size=eps,
        with_noise=False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(z_pallas), np.asarray(z_ref), atol=1e-5)


@pytest.mark.slow
def test_tiled_large_batch_matches_scan(setup):
    """Batches beyond one VMEM tile (block_b=1024) run as a chain-block grid;
    a non-divisible batch exercises the padding path too."""
    ebm, params, _ = setup
    steps, eps = 3, 0.3
    z = jax.random.normal(jax.random.PRNGKey(3), (1024 + 37, 8))

    ref_energy = prior_energy(lambda zz: ebm.apply(jax.lax.stop_gradient(params), zz))
    z_ref, _ = langevin_sample(
        jax.random.PRNGKey(2), z, ref_energy, steps, eps, with_noise=False
    )
    weights = ebm_params_to_dense_weights(params)
    z_pallas = fused_prior_langevin(
        z, *weights, seed=jnp.int32(0), steps=steps, step_size=eps,
        with_noise=False, interpret=True,
    )
    assert z_pallas.shape == z.shape
    np.testing.assert_allclose(np.asarray(z_pallas), np.asarray(z_ref), atol=1e-5)


@pytest.mark.slow
def test_bf16_dots_tracks_fp32(setup):
    """dots_dtype='bfloat16' (bf16 MXU operands, fp32 accumulate/state) must
    stay within operand-rounding distance of the fp32 kernel on a noiseless
    chain; learning-level validation runs on TPU
    (tools/validate_pallas_bf16_tpu.py)."""
    ebm, params, z = setup
    weights = ebm_params_to_dense_weights(params)
    kw = dict(seed=jnp.int32(0), steps=5, step_size=0.3, with_noise=False,
              interpret=True)
    z_f32 = fused_prior_langevin(z, *weights, **kw)
    z_bf16 = fused_prior_langevin(z, *weights, dots_dtype="bfloat16", **kw)
    err = np.max(np.abs(np.asarray(z_f32) - np.asarray(z_bf16)))
    assert err < 0.05, err  # bf16 operand rounding, compounded over 5 steps
    assert err > 0.0  # and the bf16 path is actually a different program


@pytest.mark.slow
def test_noisy_path_compiles_in_interpret_mode(setup):
    """The interpret-mode simulator stubs the on-core PRNG (bits == 0), so
    only compile/shape/finiteness is checked here; the stationary-variance
    statistics are validated on real TPU by tools/validate_pallas_tpu.py."""
    ebm, params, z = setup
    weights = ebm_params_to_dense_weights(params)
    out = fused_prior_langevin(
        z, *weights, seed=jnp.int32(7), steps=3, step_size=0.1,
        with_noise=True, interpret=True,
    )
    assert out.shape == z.shape
    assert np.all(np.isfinite(np.asarray(out)))
