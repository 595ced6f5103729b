"""A/B: generator deconv lowering — lax.conv_transpose vs phase decomposition.

The gen_recon sampling phase is ~99.5% posterior Langevin (generator conv
fwd + input-bwd per step) at ~68% MFU with the default `nn.ConvTranspose`
lowering, which XLA implements as a conv over the zero-dilated input. The
`impl='phase'` path (`models/generators.py::PhaseConvTranspose`) computes
the same sums through dense k=2 convs + interleave (sub-pixel
decomposition) and a flipped matmul for the 1x1-input first layer — same
MAC count, no dilated-lhs handling. This probe measures whether the dense
lowering buys real wall-clock on hardware.

Equality of the two impls (forward, grad-z, param grads, shared param
tree) is pinned in tests/test_models.py::test_phase_deconv_*; this is
purely a scheduling/lowering experiment.

Measurement discipline: shared-tenancy TPU drift makes sequential runs
disagree by 10-30%, so the two variants are timed ALTERNATING inside one
process (pattern: tools/ab_posterior_unroll.py), median-reported.

Result (TPU v5e, 2026-08-19, artifacts/ab_deconv_impl.json): the phase
decomposition LOSES everywhere — 0.67x at CIFAR B=128 (173 vs 116 ms),
0.61x at B=256, 0.40x at celebaHQ-256 B=32. XLA's dilated conv_transpose
lowering on TPU is already near-optimal for these stacks; 4 small dense
convs + interleave pipeline the MXU worse and add layout traffic. The
default (`impl='conv_transpose'`) stands; together with the exact-MAC MFU
figure (68%, train_step_profile.json) this closes the "is the transposed
conv wasting dilated zeros?" hypothesis with a direct measurement: it
is not.

Usage:
    python tools/ab_deconv_impl.py [--out artifacts/ab_deconv_impl.json]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from damc_tpu.cli.common import enable_compile_cache
from damc_tpu.models import make_generator
from damc_tpu.ops.langevin import langevin_sample, posterior_energy
from damc_tpu.train.state import create_state
from damc_tpu.utils.config import preset
from damc_tpu.utils.profiling import force_sync


def build_arms(cfg, B, res):
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    mc = cfg.mcmc
    sg = jax.lax.stop_gradient
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (B, res, res, cfg.model.nc), minval=-1.0, maxval=1.0
    )
    z0 = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.model.nz))

    def make(impl):
        gen = make_generator(
            cfg.model.dataset, ngf=cfg.model.ngf, nc=cfg.model.nc, impl=impl
        )

        @jax.jit
        def run(params_g, params_e, xx, zz, key):
            gen_fn = lambda z: gen.apply(sg(params_g), z)
            ebm_fn = lambda z: models.ebm.apply(sg(params_e), z)
            zk, _ = langevin_sample(
                key, zz,
                posterior_energy(gen_fn, ebm_fn, xx, mc.g_llhd_sigma),
                mc.g_l_steps, mc.g_l_step_size, mc.g_l_with_noise,
            )
            return zk

        return run

    args = (state.params_g, state.params_e, x, z0, jax.random.PRNGKey(3))
    return {impl: make(impl) for impl in ("conv_transpose", "phase")}, args


def run_config(dataset, B, rounds, iters):
    cfg = preset(dataset)
    res = cfg.model.image_size
    variants, args = build_arms(cfg, B, res)

    outs = {}
    for impl, fn in variants.items():
        t0 = time.perf_counter()
        outs[impl] = fn(*args)
        force_sync(outs[impl])
        print(f"{dataset} B={B} {impl}: compiled+first-run "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
    # 30 chained steps amplify the phase path's reassociation (~1e-7/step)
    # into elementwise drift; compare chain statistics.
    a, b = outs["conv_transpose"], outs["phase"]
    ma, mb = float(jnp.mean(a)), float(jnp.mean(b))
    sa, sb = float(jnp.std(a)), float(jnp.std(b))
    assert abs(ma - mb) < 0.05 * max(sa, 1e-3) and abs(sa - sb) < 0.05 * sa, (
        (ma, sa), (mb, sb),
    )
    print(f"{dataset} B={B}: chain stats match "
          f"(mean {ma:.4f}/{mb:.4f}, std {sa:.4f}/{sb:.4f})", flush=True)

    times = {impl: [] for impl in variants}
    for r in range(rounds):
        for impl, fn in variants.items():  # alternating within each round
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            force_sync(out)
            times[impl].append((time.perf_counter() - t0) / iters)
        print(f"{dataset} B={B} round {r}: " + "  ".join(
            f"{impl}={times[impl][-1]*1e3:.2f}ms" for impl in variants),
            flush=True)

    med = {impl: sorted(ts)[len(ts) // 2] for impl, ts in times.items()}
    return {
        "dataset": dataset, "B": B, "rounds": rounds, "iters": iters,
        "median_ms": {k: round(m * 1e3, 3) for k, m in med.items()},
        "phase_speedup": round(med["conv_transpose"] / med["phase"], 4),
        "per_round_ms": {
            k: [round(t * 1e3, 3) for t in ts] for k, ts in times.items()
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=9)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    enable_compile_cache()
    results = {
        "device_kind": jax.devices()[0].device_kind,
        "protocol": "interleaved within one process, median over rounds; "
                    "posterior-Langevin phase (30 steps, fwd+grad-z per step)",
        "configs": [
            run_config("cifar10", 128, args.rounds, args.iters),
            run_config("cifar10", 256, args.rounds, args.iters),
            run_config("celebaHQ", 32, args.rounds, args.iters),
        ],
    }
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"-> {args.out}")


if __name__ == "__main__":
    main()
