"""MFU evidence probe: device kind, matmul precision behavior, cost analysis.

Settles the round-2 open question ("~73% of bf16 roofline at fp32" vs "bf16
compute_dtype only +4%"): on TPU, JAX's DEFAULT matmul/conv precision executes
f32 operands as one-pass bf16 MXU multiplies (fp32 accumulation), so an
'fp32-path' conv stack already runs at the bf16 MXU rate — switching
activations to bf16 only trims non-MXU elementwise/HBM traffic. This probe
measures, A/B-alternated in ONE process (shared-tenancy drift discipline):

  1. a big square f32 matmul at default precision vs precision=HIGHEST vs
     true-bf16 operands — if default-f32 ~= bf16 and HIGHEST is ~3x slower,
     the one-pass-bf16 interpretation is confirmed;
  2. XLA cost_analysis FLOPs + measured wall time for the gen_recon sampling
     phase at compute_dtype in {float32, bfloat16} -> achieved TFLOP/s + MFU.

Writes a JSON summary for artifacts/.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys as _sys

_sys.path.insert(0, ".")
from damc_tpu.utils.flops import peak_bf16_flops, xla_cost_flops  # single source of truth


def force_sync(x):
    from damc_tpu.utils.profiling import force_sync as fs

    return fs(x)


def timed_ab(fns, iters=10, block=10):
    """Alternate the candidate fns in BLOCKS inside one process; returns
    per-fn mean seconds per call. Two disciplines combined:
      * alternation between variants (shared-tenancy drift makes sequential
        runs disagree >10%);
      * ONE device sync per block of `block` back-to-back dispatches — a
        per-call sync costs ~30 ms of tunnel round-trip on this platform
        and would swamp any sub-50ms kernel (the round-2 '+4% bf16'
        artifact came exactly from per-call-synced timing)."""
    for f in fns:  # warmup/compile
        force_sync(f())
    totals = [0.0] * len(fns)
    for _ in range(iters):
        for i, f in enumerate(fns):
            t0 = time.perf_counter()
            out = None
            for _ in range(block):
                out = f()
            force_sync(out)
            totals[i] += time.perf_counter() - t0
    return [t / (iters * block) for t in totals]


def matmul_precision_probe(n=4096, iters=3, K=500):
    """f32-default vs f32-HIGHEST vs bf16 square-matmul device rate + MFU.

    Each variant runs K data-DEPENDENT matmuls chained inside ONE jit
    (c <- normalize(c @ b)); XLA can neither hoist nor overlap them, so
    wall/K is a pure device-rate sample with the tunnel's ~30 ms sync
    latency amortized to <0.1 ms/matmul. (A per-call-synced version of
    this probe measured 4.2 TFLOP/s for ALL variants — pure latency; that
    artifact is what produced round 2's 'bf16 only +4%' confusion.)
    Variants alternate per round; min-of-rounds reported."""
    a32 = jnp.asarray(np.random.RandomState(0).rand(n, n), jnp.float32)
    b32 = jnp.asarray(np.random.RandomState(1).rand(n, n), jnp.float32)
    a16, b16 = a32.astype(jnp.bfloat16), b32.astype(jnp.bfloat16)

    def chained(b, precision=None):
        def body(i, c):
            c = jnp.matmul(c, b, precision=precision)
            return c * (1.0 / jnp.maximum(jnp.max(jnp.abs(c)), 1e-30))

        return jax.jit(lambda c0: jax.lax.fori_loop(0, K, body, c0))

    f_default = chained(b32)
    f_highest = chained(b32, precision=jax.lax.Precision.HIGHEST)
    f_bf16 = chained(b16)

    for f, a in ((f_default, a32), (f_highest, a32), (f_bf16, a16)):
        force_sync(f(a))  # compile + warm
    best = [float("inf")] * 3
    for _ in range(iters):
        for i, (f, a) in enumerate(
            ((f_default, a32), (f_highest, a32), (f_bf16, a16))
        ):
            t0 = time.perf_counter()
            force_sync(f(a))
            best[i] = min(best[i], (time.perf_counter() - t0) / K)
    t_def, t_high, t_bf16 = best
    flops = 2.0 * n**3
    return {
        "n": n,
        "chained_K": K,
        "f32_default_s": t_def,
        "f32_highest_s": t_high,
        "bf16_s": t_bf16,
        "f32_default_tflops": flops / t_def / 1e12,
        "f32_highest_tflops": flops / t_high / 1e12,
        "bf16_tflops": flops / t_bf16 / 1e12,
        "default_over_bf16_ratio": t_def / t_bf16,
        "highest_over_default_ratio": t_high / t_def,
    }


def sampling_phase_mfu(iters=10, batches=(128, 512)):
    """gen_recon sampling phase at fp32 vs bf16 compute_dtype and a batch
    sweep, A/B in blocks, with XLA-cost-analysis FLOPs -> achieved TFLOP/s
    and MFU. Larger B = more parallel chains per sequential Langevin step =
    better MXU shapes; the per-chip MFU ceiling of the phase is set by its
    ~250 SERIAL small-kernel steps, not by the matmul roofline."""
    import dataclasses

    from damc_tpu.models.amortizer import sample_q
    from damc_tpu.ops.langevin import langevin_sample, posterior_energy, prior_langevin_auto
    from damc_tpu.train import create_state
    from damc_tpu.utils import preset

    def build(compute_dtype):
        cfg = preset("cifar10")
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, compute_dtype=compute_dtype)
        )
        state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
        mc = cfg.mcmc

        @jax.jit
        def phase(params_q_ema, params_g, params_e, x, key):
            sg = jax.lax.stop_gradient
            k_q, k_post, k_neg, k_prior = jax.random.split(key, 4)
            z0 = sample_q(sg(params_q_ema), models.amortizer, k_q, x=x)
            gen_fn = lambda z: models.generator.apply(sg(params_g), z)
            ebm_fn = lambda z: models.ebm.apply(sg(params_e), z)
            zk_pos, _ = langevin_sample(
                k_post, z0, posterior_energy(gen_fn, ebm_fn, x, mc.g_llhd_sigma),
                mc.g_l_steps, mc.g_l_step_size, mc.g_l_with_noise,
            )
            z_neg_init = jnp.concatenate(
                [z0, jax.random.normal(k_neg, z0.shape, z0.dtype)], axis=0
            )
            zk_neg, _ = prior_langevin_auto(
                k_prior, z_neg_init, models.ebm, params_e,
                mc.e_l_steps, mc.e_l_step_size, mc.e_l_with_noise,
                use_pallas=cfg.train.use_pallas,
                dots_dtype=cfg.train.pallas_dots_dtype,
            )
            return zk_pos, zk_neg

        def args_for(b):
            x = jax.random.uniform(
                jax.random.PRNGKey(1), (b, 32, 32, 3), minval=-1, maxval=1
            )
            return (
                state.params_q_ema, state.params_g, state.params_e, x,
                jax.random.PRNGKey(2),
            )

        return phase, args_for

    from damc_tpu.utils.flops import sampling_phase_flops
    from damc_tpu.utils import preset as _preset

    phase32, args32_for = build("float32")
    phase16, args16_for = build("bfloat16")
    kind = jax.devices()[0].device_kind
    peak = peak_bf16_flops(kind)
    out = {"device_kind": kind, "peak_bf16_flops": peak, "by_batch": {}}
    for b in batches:
        a32, a16 = args32_for(b), args16_for(b)
        # TRUE phase FLOPs from the analytic exact-MAC model — XLA
        # cost_analysis counts the scan bodies once (~30x under on this
        # phase) and is recorded only as the cautionary cross-check.
        flops = sampling_phase_flops(_preset("cifar10"), b)["total"]
        xla32 = xla_cost_flops(phase32, a32)
        # Fewer sync-blocks at the big batch: each call is ~4x the work.
        t32, t16 = timed_ab(
            [lambda: phase32(*a32), lambda: phase16(*a16)],
            iters=max(iters // 2, 3), block=5,
        )
        def path(t):
            return {
                "analytic_flops": flops,
                "wall_s": t,
                "achieved_tflops": flops / t / 1e12,
                "mfu_vs_bf16_peak": (flops / t / peak) if peak else None,
                "chain_steps_per_sec": b * (100 + 30 + 2 * 60) / t,
            }

        out["by_batch"][str(b)] = {
            "fp32_path": path(t32),
            "bf16_path": path(t16),
            "xla_cost_flops_scan_body_once": xla32,
            "bf16_speedup": t32 / t16,
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/mfu_probe.json")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import sys

    sys.path.insert(0, ".")
    from damc_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"platform {dev.platform} kind {dev.device_kind}", flush=True)

    result = {
        "device_kind": dev.device_kind,
        "platform": dev.platform,
        "matmul_precision_probe": matmul_precision_probe(iters=args.iters),
    }
    print(json.dumps(result["matmul_precision_probe"], indent=2), flush=True)
    result["sampling_phase"] = sampling_phase_mfu(iters=args.iters)
    print(json.dumps(result["sampling_phase"], indent=2), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()
