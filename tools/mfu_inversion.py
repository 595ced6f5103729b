"""StyleGAN-inversion MFU on TPU hardware: batch-size A/B + roofline.

The inversion pipeline (100-step Q sweep + 100-step Adam refine under
pixel+VGG loss, `train/stylegan_inv.py::invert_batch`) is the one hot path
whose utilization was never recorded: the full-size validation measured
1.97 s/batch(4), which against the analytic model
(`utils/flops.py::inversion_phase_flops`, XLA-validated in
tests/test_flops_model.py) is ~34 TFLOP/s = ~17% of v5e bf16 peak — far
below the sampling phase's 68%. Plausible causes: (a) the high-resolution
convs have only 64-128 output channels, underfilling one MXU axis
regardless of batch; (b) B=4 gives XLA little to pipeline with.

This tool measures achieved TFLOP/s and MFU at several batch sizes with
ALTERNATING blocks inside one process (the only trustworthy comparison on
this shared-tenancy chip — see tools/ab_qsweep_noise.py) and records the
per-image wall so the eval driver can pick the knee.

Usage: python tools/mfu_inversion.py [--batches 4,8,16] [--rounds 4]
       [--out artifacts/mfu_inversion.json]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "/root/reference/workspace/src")

import jax

from damc_tpu.utils.profiling import force_sync


def build_params(res):
    import torch

    from stylegan.perceptual_model import VGG16
    from stylegan.stylegan_encoder_network import StyleGANEncoderNet
    from stylegan.stylegan_generator_network import StyleGANGeneratorNet

    from damc_tpu.models.stylegan import (
        convert_encoder_state_dict,
        convert_generator_state_dict,
        convert_vgg16_state_dict,
    )

    torch.manual_seed(0)
    gen = StyleGANGeneratorNet(resolution=res, repeat_w=False, final_tanh=True)
    enc = StyleGANEncoderNet(resolution=res, use_wscale=False, use_bn=True)
    vgg = VGG16()
    sp = {
        "generator": convert_generator_state_dict(gen.state_dict(), res),
        "encoder": convert_encoder_state_dict(enc.state_dict(), res),
        "vgg": convert_vgg16_state_dict(vgg.state_dict()),
    }
    # converters return host numpy; place the whole tree once so the timed
    # jit calls below don't re-transfer weights every invocation (packed:
    # one transfer per dtype, immune to tunnel round-trip degradation)
    from damc_tpu.utils.placement import device_put_packed

    return device_put_packed(sp)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4,8,16")
    ap.add_argument("--dtypes", default="f32",
                    help="comma list of f32,bf16 — Adam-refine compute dtype arms")
    ap.add_argument("--rounds", type=int, default=4, help="alternating A/B rounds")
    ap.add_argument("--iters", type=int, default=2, help="timed calls per block")
    ap.add_argument("--steps", type=int, default=100, help="Adam steps")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--out", default="artifacts/mfu_inversion.json")
    args = ap.parse_args()

    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.train.stylegan_inv import invert_batch, make_stylegan_amortizer
    from damc_tpu.utils.config import preset
    from damc_tpu.utils.flops import inversion_phase_flops, peak_bf16_flops

    import jax.numpy as jnp

    # validate BEFORE touching the device: backend init takes ~a minute on
    # the tunnel and a typo'd dtype must not silently run (or wait) at all
    _DTYPES = {"f32": None, "bf16": jnp.bfloat16}
    dtypes = {}
    for d in args.dtypes.split(","):
        d = d.strip()
        if d not in _DTYPES:
            raise SystemExit(f"--dtypes: unknown token {d!r} (use f32,bf16)")
        dtypes[d] = _DTYPES[d]

    enable_compile_cache()
    dev = jax.devices()[0]
    assert dev.platform != "cpu", "needs a real TPU"
    peak = peak_bf16_flops(dev.device_kind)

    res = args.res
    batches = [int(b) for b in args.batches.split(",")]
    print(f"building torch nets at res {res}...", flush=True)
    sp = build_params(res)

    cfg = preset("celebaHQ")
    q_model = make_stylegan_amortizer(cfg, resolution=res)
    qp = q_model.init(jax.random.PRNGKey(0), jnp.zeros((1, q_model.nz)))

    # one jitted wrapper per dtype; jit further specializes per input shape,
    # so each (dtype, batch) arm compiles its own executable
    runs = {
        dname: jax.jit(
            lambda qpp, spp, k, xb, _cd=cd: invert_batch(
                k, qpp, q_model, spp, xb, steps=args.steps, lr=0.01,
                resolution=res, compute_dtype=_cd,
            )
        )
        for dname, cd in dtypes.items()
    }
    xs = {
        B: jax.random.uniform(
            jax.random.PRNGKey(B), (B, res, res, 3), minval=-1.0, maxval=1.0
        )
        for B in batches
    }
    arms_list = [(B, d) for B in batches for d in dtypes]

    # compile + warm every program first (remote compiles are minutes)
    final_losses = {}
    for B, d in arms_list:
        t0 = time.perf_counter()
        out = runs[d](qp, sp, jax.random.PRNGKey(1), xs[B])
        force_sync(out[0])
        # adam_latent_descent's losses are batch SUMS; record per-image so
        # arms with different B are comparable in one artifact
        final_losses[(B, d)] = float(np.asarray(out[2])[-1]) / B
        print(f"B={B} {d}: first call {time.perf_counter()-t0:.1f}s "
              f"final refine loss/img {final_losses[(B, d)]:.5f}", flush=True)

    blocks = {arm: [] for arm in arms_list}
    for r in range(args.rounds):
        for arm in arms_list:
            B, d = arm
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = runs[d](qp, sp, jax.random.PRNGKey(100 + r * 17 + i), xs[B])
            force_sync(out[0])
            dt = (time.perf_counter() - t0) / args.iters
            blocks[arm].append(dt)
            print(f"round {r} B={B} {d}: {dt*1e3:.0f} ms/batch", flush=True)

    result = {
        "device_kind": dev.device_kind,
        "resolution": res,
        "adam_steps": args.steps,
        "q_steps": cfg.diffusion.n_interval,
        "rounds": args.rounds,
        "iters_per_block": args.iters,
        "peak_bf16_tflops": peak / 1e12 if peak else None,
        "arms": {},
    }
    for arm in arms_list:
        B, d = arm
        med = float(np.median(blocks[arm]))
        flops = inversion_phase_flops(B, resolution=res, adam_steps=args.steps,
                                      q_steps=cfg.diffusion.n_interval)["total"]
        result["arms"][f"B{B}_{d}"] = {
            "final_refine_loss_per_image": round(final_losses[arm], 5),
            "median_s_per_batch": round(med, 4),
            "s_per_image": round(med / B, 4),
            "images_per_s": round(B / med, 3),
            "analytic_tflop_per_batch": round(flops / 1e12, 3),
            "achieved_tflops": float(f"{flops / med / 1e12:.4g}"),
            "mfu_vs_bf16_peak": round(flops / med / peak, 4) if peak else None,
            "blocks_s": [round(b, 4) for b in blocks[arm]],
        }
    import os

    if os.path.dirname(args.out):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "arms"}))
    for arm in arms_list:
        B, d = arm
        print(f"B{B}_{d}", result["arms"][f"B{B}_{d}"])


if __name__ == "__main__":
    main()
