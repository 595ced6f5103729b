"""A/B: lax.scan `unroll` factor for the posterior Langevin chain (TPU).

The gen_recon sampling phase is ~99.5% posterior Langevin (generator conv
fwd + input-bwd per step — bench.py flops breakdown), running at ~68% MFU.
The remaining gap could be per-iteration scan overhead / lost cross-step
scheduling freedom, which `unroll` trades HLO size for. The math and PRNG
stream are identical for any unroll; fusion/reassociation differences put
the outputs within chained-rounding drift of each other (checked on chain
statistics) — this is purely a scheduling experiment.

Measurement discipline: shared-tenancy TPU drift makes sequential runs
disagree by 10-30%, so variants are timed ALTERNATING inside one process
(pattern: tools/ab_qsweep_noise.py) and compared per-round, median-reported.

Result (TPU v5e, 2026-08-18, B=128 CIFAR sizes, 30-step chain, 12 rounds,
medians 117.3 / 116.3 / 124.7 ms): unroll=2 is +0.8% (consistent across
rounds but marginal), unroll=4 is 6% SLOWER (HLO bloat hurts scheduling).
The phase is MXU-bound, not scan-overhead-bound; unroll stays at the
default 1 in production paths — the knob and this record exist so the
next person doesn't re-run the hypothesis.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from damc_tpu.cli.common import enable_compile_cache
from damc_tpu.ops.langevin import langevin_sample, posterior_energy
from damc_tpu.train.state import create_state
from damc_tpu.utils.config import preset
from damc_tpu.utils.profiling import force_sync


def main(B=128, rounds=12, iters=5):
    enable_compile_cache()
    cfg = preset("cifar10")
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    mc = cfg.mcmc
    sg = jax.lax.stop_gradient

    x = jax.random.uniform(
        jax.random.PRNGKey(1), (B, 32, 32, 3), minval=-1.0, maxval=1.0
    )
    z0 = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.model.nz))

    def make(unroll):
        @jax.jit
        def run(params_g, params_e, xx, zz, key):
            gen_fn = lambda z: models.generator.apply(sg(params_g), z)
            ebm_fn = lambda z: models.ebm.apply(sg(params_e), z)
            zk, _ = langevin_sample(
                key, zz,
                posterior_energy(gen_fn, ebm_fn, xx, mc.g_llhd_sigma),
                mc.g_l_steps, mc.g_l_step_size, mc.g_l_with_noise,
                unroll=unroll,
            )
            return zk

        return run

    variants = {u: make(u) for u in (1, 2, 4)}
    args = (state.params_g, state.params_e, x, z0, jax.random.PRNGKey(3))

    # Compile + numerics sanity. Unroll does NOT change the math or the
    # PRNG stream, but it does change fusion/reassociation, and 30 chained
    # steps amplify ulp-level rounding differences into ~1e-2 elementwise
    # drift — so compare chain statistics, not elements.
    outs = {}
    for u, fn in variants.items():
        t0 = time.perf_counter()
        outs[u] = fn(*args)
        force_sync(outs[u])
        print(f"unroll={u}: compiled+first-run {time.perf_counter()-t0:.1f}s",
              flush=True)
    m1, s1 = float(jnp.mean(outs[1])), float(jnp.std(outs[1]))
    for u in (2, 4):
        mu, su = float(jnp.mean(outs[u])), float(jnp.std(outs[u]))
        assert abs(mu - m1) < 0.05 * max(s1, 1e-3) and abs(su - s1) < 0.05 * s1, (
            u, (mu, su), (m1, s1),
        )
        err = float(jnp.max(jnp.abs(outs[u] - outs[1])))
        print(f"unroll={u}: stats match (mean {mu:.4f} vs {m1:.4f}); "
              f"elementwise drift {err:.2e} (rounding-only)", flush=True)

    times = {u: [] for u in variants}
    for r in range(rounds):
        for u, fn in variants.items():  # alternating within each round
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            force_sync(out)
            times[u].append((time.perf_counter() - t0) / iters)
        print(f"round {r}: " + "  ".join(
            f"u{u}={times[u][-1]*1e3:.2f}ms" for u in variants), flush=True)

    med = {u: sorted(ts)[len(ts) // 2] for u, ts in times.items()}
    ratios = {u: med[1] / med[u] for u in variants}  # >1 => unroll=u faster
    result = {
        "B": B, "steps": mc.g_l_steps, "rounds": rounds, "iters": iters,
        "median_ms": {u: round(m * 1e3, 3) for u, m in med.items()},
        "speedup_vs_unroll1": {u: round(r, 4) for u, r in ratios.items()},
        "per_round_ms": {
            u: [round(t * 1e3, 3) for t in ts] for u, ts in times.items()
        },
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
