"""Round-2 perf exploration, part 2: isolate per-call dispatch overhead and
measure the prior-Langevin kernel as deployed (fused inside one program).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from damc_tpu.cli.common import enable_compile_cache
from damc_tpu.models import LatentEBM
from damc_tpu.ops.langevin import prior_langevin_auto


from damc_tpu.utils.profiling import force_sync  # noqa: E402



def bench(tag, fn, args, chain_steps, iters=20):
    out = fn(*args)
    force_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_sync(out)
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt/iters*1000:.2f} ms/call  {chain_steps*iters/dt/1e6:.1f}M chain-steps/s", flush=True)


def main():
    enable_compile_cache()
    ebm = LatentEBM(ndf=200)
    zproto = jax.random.normal(jax.random.PRNGKey(0), (256, 128))
    params = ebm.init(jax.random.PRNGKey(1), zproto)

    def single(n_chains, steps, use_pallas=True):
        z = jax.random.normal(jax.random.PRNGKey(0), (n_chains, 128))

        @jax.jit
        def run(key, zz):
            return prior_langevin_auto(key, zz, ebm, params, steps, 0.4, True, use_pallas=use_pallas)[0]

        return run, (jax.random.PRNGKey(2), z), n_chains * steps

    # Per-call overhead probe: same chains, 60 vs 600 steps.
    for steps in (60, 600):
        run, args, cs = single(256, steps)
        bench(f"single-call chains=256 steps={steps}", run, args, cs)

    # Round-1 reproduction: 512 x 600.
    run, args, cs = single(512, 600)
    bench("round1-repro chains=512 steps=600", run, args, cs)

    # As-deployed: R rounds of the train-config chain inside ONE jit scan
    # (matches the fused train step where the kernel is one phase of a big
    # program and per-call overhead is shared).
    def rounds(n_chains, steps, R):
        @jax.jit
        def run(key):
            def body(carry, k):
                z0 = jax.random.normal(k, (n_chains, 128))
                zf, en = prior_langevin_auto(k, z0, ebm, params, steps, 0.4, True)
                return carry + jnp.sum(en), None

            acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, R))
            return acc

        return run, (jax.random.PRNGKey(3),), n_chains * steps * R

    run, args, cs = rounds(256, 60, 20)
    bench("as-deployed scan20 chains=256 steps=60", run, args, cs)
    run, args, cs = rounds(500, 100, 10)
    bench("as-deployed scan10 chains=500 steps=100", run, args, cs)

    # FID-generation scale: all 50k prior chains in one call, 100 steps.
    for n in (4096, 16384, 50000):
        run, args, cs = single(n, 100)
        bench(f"fidgen chains={n} steps=100", run, args, cs)

    # Scan path at FID scale for comparison.
    run, args, cs = single(16384, 100, use_pallas=False)
    bench("fidgen-scan chains=16384 steps=100", run, args, cs)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
