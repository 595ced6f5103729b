"""Record a jax.profiler device trace + phase breakdown of ONE train step.

Round-3 evidence artifact (VERDICT #3): the full-phase throughput story must
rest on a recorded profile, not an asserted roofline argument. This tool:

  1. captures a `jax.profiler` trace of a few fused train steps
     (artifacts/train_step_trace/ — loadable in TensorBoard/Perfetto/XProf);
  2. measures an amortized phase decomposition in separate jits — sampling
     phase (Q sweep + posterior + prior Langevin), Q update x6, G update,
     E update — against the fused step wall, so the trace has a host-side
     cross-check (all timings one-sync-per-block; per-call syncs cost
     ~30 ms of tunnel latency on this platform and are never used).

Usage: python tools/profile_train_step.py [--out artifacts/train_step_profile.json]
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def block_timed(fn, args, blocks=5, per_block=4):
    from damc_tpu.utils.profiling import force_sync

    out = fn(*args)
    force_sync(out)
    best = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        o = None
        for _ in range(per_block):
            o = fn(*args)
        force_sync(o)
        best = min(best, (time.perf_counter() - t0) / per_block)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/train_step_profile.json")
    ap.add_argument("--trace_dir", default="artifacts/train_step_trace")
    args = ap.parse_args()

    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.train.state import create_state_host_init
    from damc_tpu.train.driver_utils import make_step_fn
    from damc_tpu.utils import preset
    from damc_tpu.utils.profiling import force_sync, trace

    enable_compile_cache()
    cfg = preset("cifar10")
    state, models, opts = create_state_host_init(jax.random.PRNGKey(0), cfg)
    step, state = make_step_fn(models, opts, cfg, None, state)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (cfg.train.batch_size, 32, 32, 3),
        minval=-1.0, maxval=1.0,
    )

    # --- fused step wall (the deployed path) ---
    # The step donates its state argument (driver_utils.make_step_fn,
    # donate_argnums=0): the state must be THREADED through repeated calls
    # (re-calling with the original state hits deleted buffers), and this
    # timing runs on a dedicated state copy so the decomposed probes below
    # keep a live `state`. force_sync targets the scalar g_loss.
    holder = {"s": jax.tree.map(jnp.copy, state)}

    def fused():
        s2, m = step(holder["s"], x)
        holder["s"] = s2
        return m["g_loss"]

    t_fused = block_timed(fused, ())

    # --- decomposed phases (separate jits; sum ~ fused modulo fusion) ---
    import bench  # repo-root bench.py: reuses the exact sampling-phase jit

    t_phase_info = {}
    # bench_sampling_phase returns the flat cumulative-fields dict since the
    # round-4 bench redesign. pallas follows cfg.train.use_pallas so the
    # profiled phase runs the SAME kernel implementations the fused train
    # step above dispatches (r4 advisor finding: the pallas=False default
    # mixed implementations, ~4% phase-fraction skew).
    mfu = bench.bench_sampling_phase(models, state, cfg,
                                     B=cfg.train.batch_size,
                                     pallas=cfg.train.use_pallas)
    t_phase_info["sampling_phase"] = mfu["sampling_phase_wall_s"]

    # --- sampling-phase internals: sweep vs posterior vs prior ---
    from damc_tpu.models.amortizer import sample_q
    from damc_tpu.ops.langevin import (
        langevin_sample, posterior_energy, prior_langevin_auto,
    )

    mc, tc = cfg.mcmc, cfg.train
    zk = jax.random.normal(jax.random.PRNGKey(2), (tc.batch_size, cfg.model.nz))

    @jax.jit
    def sweep_only(pq, xx, key):
        return sample_q(pq, models.amortizer, key, x=xx)

    t_phase_info["sampling/q_sweep_%d" % cfg.diffusion.n_interval] = block_timed(
        sweep_only, (state.params_q_ema, x, jax.random.PRNGKey(4))
    )

    @jax.jit
    def posterior_only(pg, pe, z0, xx, key):
        gen_fn = lambda z: models.generator.apply(pg, z)
        ebm_fn = lambda z: models.ebm.apply(pe, z)
        zkp, _ = langevin_sample(
            key, z0, posterior_energy(gen_fn, ebm_fn, xx, mc.g_llhd_sigma),
            mc.g_l_steps, mc.g_l_step_size, mc.g_l_with_noise,
        )
        return zkp

    t_phase_info["sampling/posterior_langevin_%d" % mc.g_l_steps] = block_timed(
        posterior_only,
        (state.params_g, state.params_e, zk, x, jax.random.PRNGKey(5)),
    )

    z2 = jnp.concatenate([zk, zk], axis=0)

    @jax.jit
    def prior_only(pe, z0, key):
        zkn, _ = prior_langevin_auto(
            key, z0, models.ebm, pe, mc.e_l_steps, mc.e_l_step_size,
            mc.e_l_with_noise, use_pallas=tc.use_pallas,
            dots_dtype=tc.pallas_dots_dtype,
        )
        return zkn

    t_phase_info["sampling/prior_langevin_%d" % mc.e_l_steps] = block_timed(
        prior_only, (state.params_e, z2, jax.random.PRNGKey(6))
    )

    @jax.jit
    def q_updates(params_q, opt_q, key):
        def body(carry, k):
            pq, oq = carry

            def loss_fn(p):
                return models.amortizer.apply(
                    p, k, zk, x, jnp.ones((tc.batch_size, 1)), method="loss"
                ).mean()

            g = jax.grad(loss_fn)(pq)
            return (pq, oq), jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b), g, 0.0
            )

        (_, _), s = jax.lax.scan(
            body, (params_q, opt_q), jax.random.split(key, tc.q_updates)
        )
        return s.sum()

    t_phase_info["q_grads_x%d" % tc.q_updates] = block_timed(
        q_updates, (state.params_q, state.opt_q, jax.random.PRNGKey(3))
    )

    @jax.jit
    def g_update(pg):
        def loss_fn(p):
            x_hat = models.generator.apply(p, zk)
            return jnp.sum((x_hat - x).reshape(tc.batch_size, -1) ** 2, -1).mean()

        g = jax.grad(loss_fn)(pg)
        return jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), g, 0.0)

    t_phase_info["g_grad"] = block_timed(g_update, (state.params_g,))

    @jax.jit
    def e_update(pe):
        def loss_fn(p):
            return models.ebm.apply(p, zk).mean()

        g = jax.grad(loss_fn)(pe)
        return jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), g, 0.0)

    t_phase_info["e_grad"] = block_timed(e_update, (state.params_e,))

    # --- the trace artifact (continues threading the donated state) ---
    os.makedirs(args.trace_dir, exist_ok=True)
    with trace(args.trace_dir):
        m = None
        for _ in range(3):
            s2, m = step(holder["s"], x)
            holder["s"] = s2
        force_sync(m["g_loss"])
    trace_files = []
    for root, _, files in os.walk(args.trace_dir):
        trace_files += [os.path.join(root, f) for f in files]

    result = {
        "device_kind": jax.devices()[0].device_kind,
        "fused_train_step_wall_s": t_fused,
        "train_steps_per_sec": 1.0 / t_fused,
        "phase_wall_s": t_phase_info,
        # The "sampling/..." entries are an internal re-measurement of the
        # work already timed by "sampling_phase" — summing both would count
        # the sampling work twice.
        "decomposed_sum_s": sum(
            v for k, v in t_phase_info.items() if not k.startswith("sampling/")
        ),
        "sampling_phase_mfu": mfu,
        "sampling_phase_fraction_of_step": (
            t_phase_info["sampling_phase"] / t_fused
        ),
        "trace_files": trace_files,
        "note": "separate-jit phase sum can exceed the fused wall "
                "(fused step overlaps/fuses across phases)",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2), flush=True)
    print(f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()
