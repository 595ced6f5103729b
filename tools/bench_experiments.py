"""Round-2 perf exploration on TPU: bf16 compute dtype, batch scaling, and
kernel-level prior-Langevin throughput at the training/eval chain configs.

Prints one line per measurement; run on the real TPU chip:
    python tools/bench_experiments.py
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from damc_tpu.cli.common import enable_compile_cache
from damc_tpu.models.amortizer import sample_q
from damc_tpu.ops.langevin import (
    langevin_sample,
    posterior_energy,
    prior_langevin_auto,
)
from damc_tpu.train import create_state
from damc_tpu.utils import preset


from damc_tpu.utils.profiling import force_sync  # noqa: E402



def make_phase(cfg, models):
    mc = cfg.mcmc

    @jax.jit
    def sampling_phase(params_q_ema, params_g, params_e, x, key):
        sg = jax.lax.stop_gradient
        k_q, k_post, k_neg, k_prior = jax.random.split(key, 4)
        z0 = sample_q(sg(params_q_ema), models.amortizer, k_q, x=x)
        gen_fn = lambda z: models.generator.apply(sg(params_g), z)
        ebm_fn = lambda z: models.ebm.apply(sg(params_e), z)
        zk_pos, _ = langevin_sample(
            k_post, z0,
            posterior_energy(gen_fn, ebm_fn, x, mc.g_llhd_sigma),
            mc.g_l_steps, mc.g_l_step_size, mc.g_l_with_noise,
        )
        z_neg_init = jnp.concatenate(
            [z0, jax.random.normal(k_neg, z0.shape, z0.dtype)], axis=0
        )
        zk_neg, _ = prior_langevin_auto(
            k_prior, z_neg_init, models.ebm, params_e,
            mc.e_l_steps, mc.e_l_step_size, mc.e_l_with_noise,
        )
        return zk_pos, zk_neg

    return sampling_phase


def bench_phase(tag, cfg, B, iters=20):
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    phase = make_phase(cfg, models)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 32, 32, 3), minval=-1.0, maxval=1.0)
    out = phase(state.params_q_ema, state.params_g, state.params_e, x, jax.random.PRNGKey(2))
    force_sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = phase(state.params_q_ema, state.params_g, state.params_e, x, jax.random.PRNGKey(3 + i))
    force_sync(out)
    dt = time.perf_counter() - t0
    mc = cfg.mcmc
    cs = B * (cfg.diffusion.n_interval + mc.g_l_steps + 2 * mc.e_l_steps)
    print(f"PHASE {tag}: B={B} {dt/iters*1000:.1f} ms/iter  {cs*iters/dt:,.0f} chain-steps/s", flush=True)
    return cs * iters / dt


def bench_kernel(tag, n_chains, steps, use_pallas, iters=30):
    cfg = preset("cifar10")
    from damc_tpu.models import LatentEBM
    ebm = LatentEBM(ndf=200)
    z = jax.random.normal(jax.random.PRNGKey(0), (n_chains, 128))
    params = ebm.init(jax.random.PRNGKey(1), z)

    @jax.jit
    def run(key, zz):
        return prior_langevin_auto(key, zz, ebm, params, steps, 0.4, True, use_pallas=use_pallas)[0]

    out = run(jax.random.PRNGKey(2), z)
    force_sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(jax.random.PRNGKey(3 + i), z)
    force_sync(out)
    dt = time.perf_counter() - t0
    cs = n_chains * steps * iters
    print(f"KERNEL {tag}: chains={n_chains} steps={steps} pallas={use_pallas} "
          f"{dt/iters*1000:.2f} ms/call  {cs/dt/1e6:.1f}M chain-steps/s", flush=True)
    return cs / dt


def main():
    enable_compile_cache()
    print("backend:", jax.default_backend(), flush=True)

    cfg32 = preset("cifar10")
    cfg16 = dataclasses.replace(
        cfg32, model=dataclasses.replace(cfg32.model, compute_dtype="bfloat16")
    )

    bench_phase("fp32", cfg32, 128)
    bench_phase("bf16", cfg16, 128)
    bench_phase("fp32", cfg32, 256)
    bench_phase("bf16", cfg16, 256)
    bench_phase("bf16", cfg16, 512)

    # Kernel-level gate metric configs.
    bench_kernel("train-config", 256, 60, True)
    bench_kernel("train-config-scan", 256, 60, False)
    bench_kernel("eval-config", 500, 100, True)
    bench_kernel("big", 1024, 100, True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
