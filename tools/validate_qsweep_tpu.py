"""TPU validation of the fused Pallas reverse-sweep kernel.

Correctness criteria (learned the hard way — see the numbers below):

* SHORT sweeps are compared POINTWISE against a float64 NumPy reference and
  the highest-precision scan. Measured: fused-vs-float64 8.0e-4 at n=4,
  full CIFAR sizes — identical accuracy to the scan path (8.5e-4).
* LONG (n=100) sweeps are compared DISTRIBUTIONALLY. The 100-step residual
  recursion amplifies ANY fp32 rounding difference exponentially: the XLA
  scan diverges from ITSELF by ~0.23 max-abs when toggling matmul precision
  (default single-pass-bf16 dots are 2.3e-3 rel on this chip; the kernel
  pins Precision.HIGHEST, 1.3e-7), so pointwise equality at n=100 is not a
  property ANY implementation pair has — agreement of the sampled
  distribution is the meaningful gate.

Also measures throughput of the deployed sampler.
Run:  python tools/validate_qsweep_tpu.py
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


from damc_tpu.utils.profiling import force_sync  # noqa: E402



def main():
    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.models.amortizer import sample_q
    from damc_tpu.ops.diffusion import logsnr_schedule
    from damc_tpu.ops.pallas.fused_qsweep import (
        denoiser_layer_params,
        fused_reverse_sweep,
        step_coefficients,
    )
    from damc_tpu.train.state import create_state
    from damc_tpu.utils.config import preset

    enable_compile_cache()
    assert jax.devices()[0].platform != "cpu", "needs a real TPU"

    cfg = preset("cifar10")
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    model = models.amortizer
    params = state.params_q
    B = 128
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 32, 32, 3), minval=-1, maxval=1)

    # ---- 1. short-sweep pointwise parity vs float64 --------------------
    n_short = 4
    with jax.default_matmul_precision("highest"):
        xemb = jax.jit(lambda p, xx: model.apply(p, xx, method="encode"))(params, x)
        i_arr = jnp.arange(n_short - 1, -1, -1, dtype=jnp.float32)
        grid = logsnr_schedule(i_arr / (n_short - 1.0), model.logsnr_min, model.logsnr_max)
        tables = jax.jit(
            lambda p, g, e: model.apply(
                p, g, e, method=lambda m, gg, ee: m.p.sample_tables(gg, ee)
            )
        )(params, grid, xemb)
    fourier, layers = denoiser_layer_params(params["params"]["p"])
    coeffs = step_coefficients(
        n_short, model.logsnr_min, model.logsnr_max, model.var_type
    )
    z0 = jax.random.normal(jax.random.PRNGKey(2), (B, model.nz))

    z_fused = np.asarray(
        fused_reverse_sweep(
            z0, fourier, layers, tables["pre_x"], tables["pre_t"], coeffs,
            seed=jnp.int32(0), steps=n_short, with_noise=False, residual=True,
        ),
        np.float64,
    )

    # float64 reference of the exact same computation.
    F = np.asarray(fourier, np.float64)
    L = [[np.asarray(t, np.float64) for t in lt] for lt in layers]
    PX = [np.asarray(t, np.float64) for t in tables["pre_x"]]
    PT = [np.asarray(t, np.float64) for t in tables["pre_t"]]
    C = np.asarray(coeffs, np.float64)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))

    def denoise_np(z, step):
        films = []
        for li in range(7):
            _, _, _, _, gate_k, gate_b, hyper_k = L[li]
            pre = PT[li][step][None, :] + PX[li]
            c = pre * sig(pre)
            films.append((sig(c @ gate_k + gate_b), c @ hyper_k))

        def lay(li, h):
            lin_k, lin_b, skip_k, skip_b = L[li][:4]
            g, b = films[li]
            return (h @ lin_k + lin_b) * g + b + h @ skip_k + skip_b

        act = lambda h: np.where(h >= 0, h, 0.01 * h)
        proj = 2 * np.pi * (z @ F)
        h = np.concatenate([np.sin(proj), np.cos(proj), z], axis=-1)
        hs = []
        li = 0
        for _ in range(3):
            h = lay(li, h); li += 1
            hs.append(h); h = act(h)
        h = lay(li, h); li += 1
        for _ in range(3):
            h = np.concatenate([h, hs.pop()], axis=-1)
            h = act(h)
            h = lay(li, h); li += 1
        return z + h

    z = np.asarray(z0, np.float64)
    for step in range(n_short):
        c1, c2, m_z, m_x, _, last = C[step]
        eps = denoise_np(z, step)
        x_pred = c1 * z - c2 * eps
        z = x_pred if last > 0.5 else m_z * z + m_x * x_pred
    err = np.abs(z_fused - z).max()
    print(f"short-sweep (n={n_short}) fused vs float64: max err {err:.2e}")
    assert err < 5e-3, err

    # ---- 2. long-sweep distributional parity ---------------------------
    @jax.jit
    def run_scan(p, xx, k):
        return sample_q(p, model, k, x=xx, fused=False)

    @jax.jit
    def run_fused(p, xx, k):
        return sample_q(p, model, k, x=xx, fused=True)

    k = jax.random.PRNGKey(3)
    zs = np.concatenate(
        [np.asarray(run_scan(params, x, jax.random.fold_in(k, i))) for i in range(8)]
    )
    zf = np.concatenate(
        [np.asarray(run_fused(params, x, jax.random.fold_in(k, 100 + i))) for i in range(8)]
    )
    dm = np.abs(zs.mean() - zf.mean())
    ds = abs(zs.std() / zf.std() - 1.0)
    q = np.linspace(0.05, 0.95, 7)
    dq = np.abs(np.quantile(zs, q) - np.quantile(zf, q)).max()
    print(f"100-step stochastic sweep: mean diff {dm:.4f}, std ratio-1 {ds:.4f}, "
          f"max quantile diff {dq:.4f}")
    assert dm < 0.05 and ds < 0.05 and dq < 0.1

    # ---- 3. throughput --------------------------------------------------
    for tag, fn in (("scan", run_scan), ("fused", run_fused)):
        out = fn(params, x, k)
        force_sync(out)
        t0 = time.perf_counter()
        for i in range(20):
            out = fn(params, x, jax.random.fold_in(k, 200 + i))
        force_sync(out)
        dt = (time.perf_counter() - t0) / 20
        print(f"{tag}: {dt*1000:.2f} ms / 100-step sweep at B={B} "
              f"({B*100/dt/1e6:.2f}M denoiser-evals/s)")
        if tag == "scan":
            t_scan = dt
        else:
            print(f"fused speedup: x{t_scan/dt:.2f}")

    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
