"""Alternating A/B: pair-output vs single-output Box-Muller in the fused
reverse-sweep kernel, plus a scan-path control for tunnel drift.

Motivation: the pair-output noise path (commit "Pair-output Box-Muller in
fused kernels") was a measured win for the prior-Langevin kernel (noise is
~23% of its step time) but was never re-measured for the reverse sweep,
where the 7-layer denoiser matmuls dominate and the sublane-axis
concatenate could cost more than the saved transcendentals. Sequential
runs of validate_qsweep_tpu.py disagree by >10% (shared-tunnel drift), so
this measures the two variants ALTERNATING in one process, medians over
many reps.

Run:  python tools/ab_qsweep_noise.py
"""

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
    cfg = preset("cifar10")
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    model = models.amortizer
    params = state.params_q
    B = 128
    n = cfg.diffusion.n_interval
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 32, 32, 3), minval=-1, maxval=1)

    with jax.default_matmul_precision("highest"):
        xemb = jax.jit(lambda p, xx: model.apply(p, xx, method="encode"))(params, x)
        i_arr = jnp.arange(n - 1, -1, -1, dtype=jnp.float32)
        grid = logsnr_schedule(i_arr / (n - 1.0), model.logsnr_min, model.logsnr_max)
        tables = jax.jit(
            lambda p, g, e: model.apply(
                p, g, e, method=lambda m, gg, ee: m.p.sample_tables(gg, ee)
            )
        )(params, grid, xemb)
    fourier, layers = denoiser_layer_params(params["params"]["p"])
    coeffs = step_coefficients(n, model.logsnr_min, model.logsnr_max, model.var_type)
    z0 = jax.random.normal(jax.random.PRNGKey(2), (B, model.nz))

    def make(pair):
        def run(seed):
            return fused_reverse_sweep(
                z0, fourier, layers, tables["pre_x"], tables["pre_t"], coeffs,
                seed=seed, steps=n, with_noise=True, residual=True,
                noise_pair=pair,
            )
        return run

    run_scan = jax.jit(lambda p, xx, k: sample_q(p, model, k, x=xx, fused=False))

    variants = {"pair": make(True), "single": make(False)}
    # warm up all compiles
    for fn in variants.values():
        force_sync(fn(jnp.int32(0)))
    force_sync(run_scan(params, x, jax.random.PRNGKey(3)))

    reps, inner = 9, 10
    times = {k: [] for k in list(variants) + ["scan"]}
    for r in range(reps):
        for tag, fn in variants.items():
            out = fn(jnp.int32(r))
            force_sync(out)
            t0 = time.perf_counter()
            for i in range(inner):
                out = fn(jnp.int32(1000 + r * inner + i))
            force_sync(out)
            times[tag].append((time.perf_counter() - t0) / inner)
        out = run_scan(params, x, jax.random.PRNGKey(r))
        force_sync(out)
        t0 = time.perf_counter()
        for i in range(inner):
            out = run_scan(params, x, jax.random.fold_in(jax.random.PRNGKey(9), r * inner + i))
        force_sync(out)
        times["scan"].append((time.perf_counter() - t0) / inner)

    for tag, ts in times.items():
        ms = np.array(ts) * 1000
        print(f"{tag:7s}: median {np.median(ms):.2f} ms  "
              f"min {ms.min():.2f}  max {ms.max():.2f}  "
              f"all {[f'{v:.2f}' for v in ms]}")
    med = {k: np.median(v) for k, v in times.items()}
    print(f"pair/single ratio: {med['pair']/med['single']:.3f}  "
          f"(>1 means pair-output is slower)")
    print(f"fused(best-variant) vs scan: x{med['scan']/min(med['pair'], med['single']):.2f}")


if __name__ == "__main__":
    main()
