"""TPU throughput + accuracy comparison of fused prior-Langevin variants.

Measures the deployed bench configuration (256 chains x 60 steps, rounds
batched per program like bench.py) and a saturated one (2048 x 600) for:
  * fp32 MXU dots (default, exact scan parity)
  * bf16 MXU dots (fp32 accumulation/state/noise)
plus bf16-vs-fp32 noiseless drift and bf16 ULA stationary statistics.

Run: python tools/bench_langevin_dtypes.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from damc_tpu.models import LatentEBM
from damc_tpu.ops.pallas.fused_langevin import (
    ebm_params_to_dense_weights,
    fused_prior_langevin,
)


def force_sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def bench(fn, n=20):
    out = fn(0)
    force_sync(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(1 + i)
    force_sync(out)
    return time.perf_counter() - t0


def main():
    assert jax.devices()[0].platform != "cpu", "needs a real TPU"
    ebm = LatentEBM(ndf=200)
    z = jax.random.normal(jax.random.PRNGKey(0), (256, 128))
    params = ebm.init(jax.random.PRNGKey(1), z)
    w = ebm_params_to_dense_weights(params)

    # Accuracy: noiseless bf16 drift vs fp32 over the training chain length.
    z60_f32 = fused_prior_langevin(
        z, *w, seed=jnp.int32(0), steps=60, step_size=0.4, with_noise=False
    )
    z60_bf16 = fused_prior_langevin(
        z, *w, seed=jnp.int32(0), steps=60, step_size=0.4, with_noise=False,
        dots_dtype="bfloat16",
    )
    drift = float(jnp.max(jnp.abs(z60_f32 - z60_bf16)))
    scale = float(jnp.std(z60_f32))
    print(f"bf16 noiseless drift over 60 steps: max {drift:.3e} "
          f"(state std {scale:.3f}); per-step noise std would be 0.4")

    # bf16 ULA stationary stats on the pure Gaussian energy.
    zeroed = ebm_params_to_dense_weights(jax.tree.map(jnp.zeros_like, params))
    eps = 0.3
    zs = fused_prior_langevin(
        jnp.zeros((2048, 128)), *zeroed, seed=jnp.int32(7),
        steps=500, step_size=eps, with_noise=True, dots_dtype="bfloat16",
    )
    var, mean = float(jnp.var(zs)), float(jnp.mean(zs))
    expected = 1.0 / (1.0 - eps * eps / 4.0)
    print(f"bf16 ULA var {var:.4f} (expected {expected:.4f}) mean {mean:+.4f}")
    assert abs(var - expected) / expected < 0.05 and abs(mean) < 0.05

    # Throughput: deployed config (rounds of 256x60 in one program).
    ROUNDS, B, STEPS = 20, 256, 60

    def deployed(dtype):
        @jax.jit
        def run(seed):
            zz = z
            for r in range(ROUNDS):
                zz = fused_prior_langevin(
                    zz, *w, seed=seed + r, steps=STEPS, step_size=0.4,
                    with_noise=True, dots_dtype=dtype,
                )
            return zz
        return lambda s: run(jnp.int32(s))

    for dtype in ("float32", "bfloat16"):
        t = bench(deployed(dtype))
        cs = 20 * ROUNDS * B * STEPS
        print(f"deployed {dtype}: {cs / t / 1e6:.1f}M chain-steps/s")

    # Saturated config.
    z_big = jax.random.normal(jax.random.PRNGKey(2), (2048, 128))
    for dtype in ("float32", "bfloat16"):
        run = lambda s, d=dtype: fused_prior_langevin(
            z_big, *w, seed=jnp.int32(s), steps=600, step_size=0.4,
            with_noise=True, dots_dtype=d,
        )
        t = bench(run)
        cs = 20 * 2048 * 600
        print(f"saturated(2048x600) {dtype}: {cs / t / 1e6:.1f}M chain-steps/s")

    # Noise share: noiseless vs noisy at the saturated config (fp32).
    for noise in (True, False):
        run = lambda s, nn=noise: fused_prior_langevin(
            z_big, *w, seed=jnp.int32(s), steps=600, step_size=0.4,
            with_noise=nn,
        )
        t = bench(run)
        cs = 20 * 2048 * 600
        print(f"saturated fp32 with_noise={noise}: {cs / t / 1e6:.1f}M chain-steps/s")


if __name__ == "__main__":
    main()
