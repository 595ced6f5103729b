"""Per-workload MFU table: analytic FLOPs / achieved TFLOP/s / MFU.

Round-5 bookkeeping close (VERDICT r4 weak #5): the flagship celebaHQ-256
result previously carried only a bare wall-seconds figure, and the svhn/
celeba64/anomaly phases had no utilization numbers at all. This tool
measures, per workload preset:

  * the FULL fused train step (the deployed per-iteration program,
    train/step.py via the production make_step_fn wiring) against
    `utils.flops.train_step_flops`;
  * the sampling phase alone (Q sweep + posterior + prior Langevin — the
    phase the r4 MFU evidence covered for cifar10 only) against
    `utils.flops.sampling_phase_flops`, honoring the workload's prior-chain
    structure (2B gen_recon / B anomaly).

Writes artifacts/mfu_table.json incrementally after every workload (a
tunnel flake mid-run keeps the completed rows). README's MFU table is
sourced from this artifact.

Usage:
  python tools/mfu_table.py                     # all workloads, TPU
  python tools/mfu_table.py --workloads cifar10,celebaHQ --iters 5
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WORKLOADS = ("cifar10", "svhn", "celeba64", "mnist_anomaly", "celebaHQ")


def block_timed(fn, args, iters, repeats):
    from damc_tpu.utils.profiling import force_sync

    out = fn(*args)
    force_sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        force_sync(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def make_phase_fn(models, cfg):
    """The workload's sampling phase as one jitted program, mirroring
    train/step.py's phase structure (incl. single-chain anomaly priors) on
    the DEPLOYED kernel implementations (use_pallas honored)."""
    from damc_tpu.models.amortizer import sample_q
    from damc_tpu.ops.langevin import (
        gaussian_posterior_energy,
        langevin_sample,
        posterior_energy,
        prior_langevin_auto,
    )

    mc, tc = cfg.mcmc, cfg.train

    @jax.jit
    def phase(params_q_ema, params_g, params_e, x, key):
        sg = jax.lax.stop_gradient
        k_q, k_post, k_neg, k_prior = jax.random.split(key, 4)
        z0 = sample_q(sg(params_q_ema), models.amortizer, k_q, x=x)
        gen_fn = lambda z: models.generator.apply(sg(params_g), z)
        if tc.remat_generator:
            gen_fn = jax.checkpoint(gen_fn)
        if models.ebm is not None:
            energy = posterior_energy(
                gen_fn, lambda z: models.ebm.apply(sg(params_e), z), x,
                mc.g_llhd_sigma,
            )
        else:
            energy = gaussian_posterior_energy(gen_fn, x, mc.g_llhd_sigma)
        zk_pos, _ = langevin_sample(
            k_post, z0, energy, mc.g_l_steps, mc.g_l_step_size,
            mc.g_l_with_noise,
        )
        zk_neg = zk_pos
        if tc.prior_chains != "none" and models.ebm is not None:
            if tc.prior_chains == "double":
                z_init = jnp.concatenate(
                    [z0, jax.random.normal(k_neg, z0.shape, z0.dtype)], axis=0
                )
            else:
                z_init = z0
            zk_neg, _ = prior_langevin_auto(
                k_prior, z_init, models.ebm, params_e, mc.e_l_steps,
                mc.e_l_step_size, mc.e_l_with_noise,
                use_pallas=tc.use_pallas,
                dots_dtype=tc.pallas_dots_dtype,
            )
        return zk_pos, zk_neg

    return phase


def measure_workload(name, iters, repeats):
    from damc_tpu.train.driver_utils import make_step_fn
    from damc_tpu.train.state import create_state_host_init
    from damc_tpu.utils import preset
    from damc_tpu.utils.flops import (
        peak_bf16_flops, sampling_phase_flops, train_step_flops,
    )
    from damc_tpu.utils.profiling import force_sync

    cfg = preset(name)
    m, tc = cfg.model, cfg.train
    B = tc.batch_size
    state, models, opts = create_state_host_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (B, m.image_size, m.image_size, m.nc),
        minval=-1.0, maxval=1.0,
    )
    peak = peak_bf16_flops(jax.devices()[0].device_kind)
    row = {
        "dataset": m.dataset,
        "batch": B,
        "image_size": m.image_size,
        "nz": m.nz,
    }

    # --- full fused train step (donated state: thread it) ---
    step, state2 = make_step_fn(models, opts, cfg, None, state)
    holder = {"s": jax.tree.map(jnp.copy, state2)}

    def fused():
        s2, metrics = step(holder["s"], x)
        holder["s"] = s2
        return metrics["g_loss"]

    t0 = time.time()
    force_sync(fused())
    row["train_step_compile_s"] = round(time.time() - t0, 1)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fused()
        force_sync(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    fl = train_step_flops(cfg, B)
    row.update(
        train_step_wall_s=round(best, 6),
        train_step_analytic_flops=fl["total"],
        train_step_flops_breakdown_gf={
            k: round(fl[k] / 1e9, 2)
            for k in ("sampling_phase", "q_updates", "g_update", "e_update")
        },
        train_step_achieved_tflops=float(f"{fl['total'] / best / 1e12:.4g}"),
        train_step_mfu_vs_bf16_peak=(
            round(fl["total"] / best / peak, 5) if peak else None
        ),
    )

    # --- sampling phase alone ---
    phase = make_phase_fn(models, cfg)
    args = (
        state.params_q_ema, state.params_g, state.params_e, x,
        jax.random.PRNGKey(2),
    )
    dt = block_timed(phase, args, iters, repeats)
    pfl = sampling_phase_flops(cfg, B)
    row.update(
        sampling_phase_wall_s=round(dt, 6),
        sampling_phase_analytic_flops=pfl["total"],
        sampling_phase_achieved_tflops=float(f"{pfl['total'] / dt / 1e12:.4g}"),
        sampling_phase_mfu_vs_bf16_peak=(
            round(pfl["total"] / dt / peak, 5) if peak else None
        ),
        sampling_phase_fraction_of_step=round(dt / best, 4),
    )
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workloads", default=",".join(WORKLOADS))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="artifacts/mfu_table.json")
    args = ap.parse_args()

    from damc_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    result = {
        "what": (
            "Per-workload MFU table: full fused train step + sampling phase "
            "vs the analytic FLOPs model (utils/flops.py::train_step_flops /"
            " sampling_phase_flops); dense-bf16 chip peak denominator"
        ),
        "tool": "tools/mfu_table.py",
        "date": time.strftime("%Y-%m-%d"),
        "device_kind": jax.devices()[0].device_kind,
        "backend": jax.default_backend(),
        "iters": args.iters,
        "repeats": args.repeats,
        "workloads": {},
    }
    for name in args.workloads.split(","):
        name = name.strip()
        if not name:
            continue
        print(f"[mfu_table] measuring {name} ...", flush=True)
        t0 = time.time()
        result["workloads"][name] = measure_workload(
            name, args.iters, args.repeats
        )
        result["workloads"][name]["tool_wall_s"] = round(time.time() - t0, 1)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps({name: result["workloads"][name]}), flush=True)
    print(f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()
