"""Decompose the StyleGAN-inversion program's MFU gap by phase, on hardware.

At the bf16 knee (B=16) the full invert_batch program achieves 44.3% MFU
(artifacts/mfu_inversion_bf16_scale.json). This tool attributes the
remaining gap by timing, in ONE process with ALTERNATING blocks (the only
trustworthy comparison on this shared-tenancy chip):

  full      — invert_batch(B, steps Adam) as deployed;
  sweep     — the same program with adam_steps=0 (encoder conditioning +
              Q reverse sweep + NaN rescue + final synthesis): everything
              that is NOT the Adam refine loop;
  synth     — an Adam loop whose loss is ONLY the pixel term
              (1.5*mse(synth(z), x)): synthesis fwd + input-bwd per step;
  vgg       — an Adam loop descending a pixel image under ONLY the
              perceptual term (mse(vgg(y), feat)): VGG fwd + input-bwd
              per step.

Each arm gets achieved TFLOP/s from the analytic exact-MAC model
(`utils/flops.py`, XLA-validated in tests/test_flops_model.py), so the
output says which op class runs at what fraction of peak and how much of
the full wall is unexplained by the two dominant loops (fusion/overhead
residual). Also captures a jax.profiler trace of one warm full call
(artifacts/inversion_trace/) for op-level inspection.

Usage: python tools/inversion_phase_profile.py [--batch 16] [--dtype bf16]
       [--out artifacts/inversion_phase_profile.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/reference/workspace/src")

import jax
import jax.numpy as jnp

from damc_tpu.utils.profiling import force_sync
from mfu_inversion import build_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--steps", type=int, default=100, help="Adam steps")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=2, help="timed calls per block")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--trace_dir", default="artifacts/inversion_trace")
    ap.add_argument("--out", default="artifacts/inversion_phase_profile.json")
    args = ap.parse_args()

    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.models import stylegan as sg
    from damc_tpu.ops.langevin import adam_latent_descent
    from damc_tpu.train.stylegan_inv import invert_batch, make_stylegan_amortizer
    from damc_tpu.utils.config import preset
    from damc_tpu.utils.flops import (
        inversion_phase_flops,
        peak_bf16_flops,
        stylegan_synthesis_fwd_flops,
        vgg16_fwd_flops,
    )

    enable_compile_cache()
    dev = jax.devices()[0]
    assert dev.platform != "cpu", "needs a real TPU"
    peak = peak_bf16_flops(dev.device_kind)
    cd = None if args.dtype == "f32" else jnp.bfloat16

    res, B, steps = args.res, args.batch, args.steps
    print(f"building torch nets at res {res}...", flush=True)
    sp = build_params(res)

    cfg = preset("celebaHQ")
    q_model = make_stylegan_amortizer(cfg, resolution=res)
    qp = q_model.init(jax.random.PRNGKey(0), jnp.zeros((1, q_model.nz)))
    x = jax.random.uniform(
        jax.random.PRNGKey(B), (B, res, res, 3), minval=-1.0, maxval=1.0
    )

    # --- arm programs -----------------------------------------------------
    from damc_tpu.utils.placement import cast_float_leaves

    # the SAME cast the deployed loss uses (inversion_loss_fn), one program
    # per tree (avoids per-leaf dispatch storms on the tunnel)
    cast_tree = jax.jit(cast_float_leaves, static_argnums=1)
    gen_c = cast_tree({"synthesis": sp["generator"]["synthesis"]}, cd)
    vgg_c = cast_tree(sp["vgg"], cd)
    x_c = x.astype(cd) if cd is not None else x

    # params are jit ARGUMENTS, not closure captures (captured arrays are
    # embedded as literals in the lowered program — see evaluate_inversion)
    def synth_only(gp, xt, z0):
        # Adam on z under ONLY the pixel term; same per-step conv work as
        # the deployed refine minus VGG
        def loss(z):
            zc = z.astype(xt.dtype)
            x_hat = sg.generator_apply(gp, zc, res).astype(jnp.float32)
            return 1.5 * jnp.mean(
                (x_hat - xt.astype(jnp.float32)).reshape(z.shape[0], -1) ** 2,
                axis=-1,
            )

        return adam_latent_descent(z0, loss, steps=steps, lr=0.01)

    feat_target = np.asarray(
        jax.jit(lambda vp, xt: sg.vgg16_features(vp, xt))(vgg_c, x_c),
        np.float32,
    )

    def vgg_only(vp, ft, y0):
        # Adam on a pixel image under ONLY the perceptual term
        def loss(y):
            f = sg.vgg16_features(vp, y.astype(x_c.dtype)).astype(jnp.float32)
            return 5e-5 * jnp.mean(
                (f - ft).reshape(y.shape[0], -1) ** 2, axis=-1
            )

        return adam_latent_descent(y0, loss, steps=steps, lr=0.01)

    full = jax.jit(
        lambda qpp, spp, k, xb: invert_batch(
            k, qpp, q_model, spp, xb, steps=steps, lr=0.01, resolution=res,
            compute_dtype=cd,
        )
    )
    sweep = jax.jit(
        lambda qpp, spp, k, xb: invert_batch(
            k, qpp, q_model, spp, xb, steps=0, lr=0.01, resolution=res,
            compute_dtype=cd,
        )
    )
    synth_j = jax.jit(synth_only)
    vgg_j = jax.jit(vgg_only)

    z0 = jax.random.normal(jax.random.PRNGKey(7), (B, q_model.nz))
    y0 = jax.random.uniform(
        jax.random.PRNGKey(8), (B, res, res, 3), minval=-1.0, maxval=1.0
    )
    # gen_c/vgg_c/x_c are already device-resident jit outputs; only the
    # numpy feat_target needs placement
    feat_target = jax.device_put(feat_target)

    arms = {
        "full": lambda k: full(qp, sp, k, x)[0],
        "sweep": lambda k: sweep(qp, sp, k, x)[0],
        "synth": lambda k: synth_j(gen_c, x_c, z0)[0],
        "vgg": lambda k: vgg_j(vgg_c, feat_target, y0)[0],
    }

    for name, fn in arms.items():
        t0 = time.perf_counter()
        force_sync(fn(jax.random.PRNGKey(1)))
        print(f"{name}: first call {time.perf_counter()-t0:.1f}s", flush=True)

    blocks = {name: [] for name in arms}
    for r in range(args.rounds):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            o = None
            for i in range(args.iters):
                o = fn(jax.random.PRNGKey(100 + 17 * r + i))
            force_sync(o)
            dt = (time.perf_counter() - t0) / args.iters
            blocks[name].append(dt)
            print(f"round {r} {name}: {dt*1e3:.0f} ms", flush=True)

    # one warm traced call for op-level inspection
    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        force_sync(arms["full"](jax.random.PRNGKey(999)))

    # --- FLOPs attribution ------------------------------------------------
    d = inversion_phase_flops(B, resolution=res, q_steps=cfg.diffusion.n_interval,
                              adam_steps=steps)
    g_fwd = stylegan_synthesis_fwd_flops(res)
    v_fwd = vgg16_fwd_flops(res)
    flops = {
        # d["total"] includes the rescue probe + final synthesis
        # ("rescue_final"), which every invert_batch call executes
        "full": d["total"],
        # steps=0 arm runs encoder + Q sweep + rescue probe + final
        # synthesis (feat_x is DCE'd with an empty Adam scan)
        "sweep": d["sweep"] + d["rescue_final"],
        "synth": B * steps * 2.0 * g_fwd,
        "vgg": B * steps * 2.0 * v_fwd,
    }
    med = {name: float(np.median(blocks[name])) for name in arms}
    result = {
        "device_kind": dev.device_kind,
        "resolution": res,
        "batch": B,
        "dtype": args.dtype,
        "adam_steps": steps,
        "rounds": args.rounds,
        "iters_per_block": args.iters,
        "peak_bf16_tflops": peak / 1e12 if peak else None,
        "arms": {},
    }
    for name in arms:
        result["arms"][name] = {
            "median_s": round(med[name], 4),
            "analytic_tflop": round(flops[name] / 1e12, 3),
            "achieved_tflops": float(f"{flops[name] / med[name] / 1e12:.4g}"),
            "mfu_vs_bf16_peak": round(flops[name] / med[name] / peak, 4)
            if peak
            else None,
            "blocks_s": [round(b, 4) for b in blocks[name]],
        }
    adam_wall = med["full"] - med["sweep"]
    result["decomposition"] = {
        "adam_wall_s": round(adam_wall, 4),
        "synth_plus_vgg_wall_s": round(med["synth"] + med["vgg"], 4),
        "residual_s": round(adam_wall - med["synth"] - med["vgg"], 4),
        "residual_frac_of_adam": round(
            (adam_wall - med["synth"] - med["vgg"]) / adam_wall, 4
        ),
        "sweep_frac_of_full": round(med["sweep"] / med["full"], 4),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["decomposition"]))
    for name in arms:
        print(name, result["arms"][name])


if __name__ == "__main__":
    main()
