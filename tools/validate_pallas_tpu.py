"""TPU-hardware validation of the fused Pallas prior-Langevin kernel.

Run on a machine with a real TPU:  python tools/validate_pallas_tpu.py

Checks (which interpret mode cannot): Box-Muller noise statistics from the
on-core PRNG, ULA stationary variance on a Gaussian energy, exact noiseless
parity vs the lax.scan path, and a throughput comparison.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


from damc_tpu.utils.profiling import force_sync  # noqa: E402


sys.path.insert(0, ".")

from damc_tpu.models import LatentEBM
from damc_tpu.ops.langevin import langevin_sample, prior_energy
from damc_tpu.ops.pallas.fused_langevin import (
    ebm_params_to_dense_weights,
    fused_prior_langevin,
)


def main():
    assert jax.devices()[0].platform != "cpu", "needs a real TPU"
    ebm = LatentEBM(ndf=200)
    z = jax.random.normal(jax.random.PRNGKey(0), (512, 128))
    params = ebm.init(jax.random.PRNGKey(1), z)
    weights = ebm_params_to_dense_weights(params)

    # 1. Exact noiseless parity vs lax.scan.
    energy = prior_energy(lambda zz: ebm.apply(jax.lax.stop_gradient(params), zz))
    z_ref, _ = langevin_sample(jax.random.PRNGKey(2), z, energy, 20, 0.3, False)
    z_pal = fused_prior_langevin(
        z, *weights, seed=jnp.int32(0), steps=20, step_size=0.3, with_noise=False
    )
    err = float(jnp.max(jnp.abs(z_pal - z_ref)))
    print(f"noiseless parity max err: {err:.2e}")
    assert err < 1e-3, "fused kernel diverges from lax.scan"

    # 2. Stationary variance on U = 0.5||z||^2 (EBM zeroed).
    zeroed = ebm_params_to_dense_weights(jax.tree.map(jnp.zeros_like, params))
    eps = 0.3
    zs = fused_prior_langevin(
        jnp.zeros((2048, 128)), *zeroed, seed=jnp.int32(7),
        steps=500, step_size=eps, with_noise=True,
    )
    var, mean = float(jnp.var(zs)), float(jnp.mean(zs))
    expected = 1.0 / (1.0 - eps * eps / 4.0)
    print(f"ULA stationary var {var:.4f} (expected {expected:.4f}), mean {mean:.4f}")
    assert abs(var - expected) / expected < 0.05
    assert abs(mean) < 0.05

    # 3. Noise moments (fresh chain of pure noise steps: steps=1, coeff tiny).
    n = fused_prior_langevin(
        jnp.zeros((2048, 128)), *zeroed, seed=jnp.int32(9),
        steps=1, step_size=1.0, with_noise=True,
    )
    print(f"one-step noise mean {float(n.mean()):.4f} std {float(n.std()):.4f}")

    # 3b. Tiled chain-block grid (B > 1024): noiseless parity + noise stats.
    z_big = jax.random.normal(jax.random.PRNGKey(11), (4096 + 37, 128))
    zb_ref, _ = langevin_sample(
        jax.random.PRNGKey(12), z_big, energy, 10, 0.3, False
    )
    zb_pal = fused_prior_langevin(
        z_big, *weights, seed=jnp.int32(0), steps=10, step_size=0.3,
        with_noise=False,
    )
    err = float(jnp.max(jnp.abs(zb_pal - zb_ref)))
    print(f"tiled (4133 chains) noiseless parity max err: {err:.2e}")
    assert err < 1e-3
    zs_big = fused_prior_langevin(
        jnp.zeros((8192, 128)), *zeroed, seed=jnp.int32(13),
        steps=500, step_size=eps, with_noise=True,
    )
    var_b = float(jnp.var(zs_big))
    # Cross-block independence: correlation between block 0 and block 1 rows.
    a0 = np.asarray(zs_big[:1024]).ravel()
    a1 = np.asarray(zs_big[1024:2048]).ravel()
    corr = float(np.corrcoef(a0, a1)[0, 1])
    print(f"tiled ULA var {var_b:.4f} (expected {expected:.4f}), "
          f"block0/block1 corr {corr:+.4f}")
    assert abs(var_b - expected) / expected < 0.05
    assert abs(corr) < 0.05

    # 3c. bf16 MXU dots: ULA stationary stats must hold (fp32 accumulate/
    # state/noise; operand rounding is far below the per-step noise scale).
    zs16 = fused_prior_langevin(
        jnp.zeros((2048, 128)), *zeroed, seed=jnp.int32(7),
        steps=500, step_size=eps, with_noise=True, dots_dtype="bfloat16",
    )
    var16 = float(jnp.var(zs16))
    print(f"bf16-dots ULA var {var16:.4f} (expected {expected:.4f})")
    assert abs(var16 - expected) / expected < 0.05

    # 3d. Per-row COUNTER noise (round-5 serving-determinism mode,
    # row_seeds): the murmur-mix Box-Muller stream must hold the same ULA
    # stationary statistics on real Mosaic, and a row's noisy chain must be
    # bit-identical whether it runs alone or packed in a batch (the
    # property the fused serving path rests on).
    row_seeds = jnp.arange(2048, dtype=jnp.int32)
    zs_ctr = fused_prior_langevin(
        jnp.zeros((2048, 128)), *zeroed, row_seeds=row_seeds,
        steps=500, step_size=eps, with_noise=True,
    )
    var_c, mean_c = float(jnp.var(zs_ctr)), float(jnp.mean(zs_ctr))
    print(f"counter-noise ULA var {var_c:.4f} (expected {expected:.4f}), "
          f"mean {mean_c:.4f}")
    assert abs(var_c - expected) / expected < 0.05
    assert abs(mean_c) < 0.05
    full = fused_prior_langevin(
        z[:128], *weights, row_seeds=row_seeds[:128], steps=10,
        step_size=0.1, with_noise=True,
    )
    solo = fused_prior_langevin(
        z[5:6], *weights, row_seeds=row_seeds[5:6], steps=10,
        step_size=0.1, with_noise=True,
    )
    same = bool(jnp.all(full[5] == solo[0]))
    print(f"counter-noise composition independence (row 5 alone vs packed): "
          f"{same}")
    assert same
    # cross-row independence of the counter stream
    c0 = np.asarray(zs_ctr[:512]).ravel()
    c1 = np.asarray(zs_ctr[512:1024]).ravel()
    corr_c = float(np.corrcoef(c0, c1)[0, 1])
    print(f"counter-noise cross-row corr {corr_c:+.4f}")
    assert abs(corr_c) < 0.05

    # 4. Throughput vs lax.scan.
    STEPS, N = 600, 30

    @jax.jit
    def run_scan(key, zz):
        return langevin_sample(key, zz, energy, STEPS, 0.4, True)[0]

    out = run_scan(jax.random.PRNGKey(3), z)
    force_sync(out)
    t0 = time.perf_counter()
    for i in range(N):
        out = run_scan(jax.random.PRNGKey(4 + i), z)
    force_sync(out)
    t_scan = time.perf_counter() - t0

    run_pal = lambda s: fused_prior_langevin(
        z, *weights, seed=s, steps=STEPS, step_size=0.4, with_noise=True
    )
    out = run_pal(jnp.int32(0))
    force_sync(out)
    t0 = time.perf_counter()
    for i in range(N):
        out = run_pal(jnp.int32(1 + i))
    force_sync(out)
    t_pal = time.perf_counter() - t0

    run_ctr = lambda i: fused_prior_langevin(
        z, *weights, row_seeds=row_seeds[: z.shape[0]] + i, steps=STEPS,
        step_size=0.4, with_noise=True,
    )
    out = run_ctr(jnp.int32(0))
    force_sync(out)
    t0 = time.perf_counter()
    for i in range(N):
        out = run_ctr(jnp.int32(1 + i))
    force_sync(out)
    t_ctr = time.perf_counter() - t0

    cs = z.shape[0] * STEPS * N
    print(
        f"lax.scan: {cs / t_scan / 1e6:.1f}M chain-steps/s | "
        f"pallas fused: {cs / t_pal / 1e6:.1f}M chain-steps/s | "
        f"speedup x{t_scan / t_pal:.2f} | "
        f"counter-noise fused: {cs / t_ctr / 1e6:.1f}M chain-steps/s "
        f"(x{t_ctr / t_pal:.2f} vs stream)"
    )
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
