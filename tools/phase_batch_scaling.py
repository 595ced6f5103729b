"""Batch-scaling curve for the flagship gen_recon sampling phase on TPU.

Closes the last open thread of round-2 VERDICT directive #3 ("if the
conv-transpose stack is the wall, try ... larger B and record the outcome
either way"): measures the full CIFAR-10 sampling phase (100-step amortized
reverse sweep + 30-step posterior Langevin + 2B-chain 60-step prior, one jit
— the same program `bench.py::bench_sampling_phase` times at B=128) across
batch sizes, reporting wall, chain-steps/s, achieved TFLOP/s and MFU per B.

Protocol: INTERLEAVED rounds (B-loop inside the repeat-loop) — sequential
same-shape runs on this shared-tenancy chip drift 10-30%, alternating
measurements inside one process are the only trustworthy comparison
(.claude/skills/verify). The reference training protocol pins B=128
(`train_gen_recon.py:109`); larger B here quantifies the serving/eval
headroom, not a training-protocol change.

Usage (on the real TPU chip):
    python tools/phase_batch_scaling.py [--batches 64,128,256,512] [--rounds 5]
"""

import argparse
import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import make_sampling_phase, phase_chain_steps  # noqa: E402
from damc_tpu.cli.common import enable_compile_cache  # noqa: E402
from damc_tpu.train import create_state  # noqa: E402
from damc_tpu.utils import preset  # noqa: E402
from damc_tpu.utils.flops import peak_bf16_flops, sampling_phase_flops  # noqa: E402
from damc_tpu.utils.profiling import force_sync  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128,256,512")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--out", default="artifacts/phase_batch_scaling.json")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    enable_compile_cache()
    cfg = preset("cifar10")
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    phase = make_sampling_phase(models, cfg)
    peak = peak_bf16_flops(jax.devices()[0].device_kind)

    arms = {}
    for B in batches:
        x = jax.random.uniform(
            jax.random.PRNGKey(B), (B, 32, 32, 3), minval=-1.0, maxval=1.0
        )
        arm_args = (
            state.params_q_ema, state.params_g, state.params_e, x,
            jax.random.PRNGKey(B + 1),
        )
        t0 = time.perf_counter()
        force_sync(phase(*arm_args))  # compile + warm
        arms[B] = {"args": arm_args, "walls": [], "compile_s": time.perf_counter() - t0}
        print(f"B={B} compiled/warmed in {arms[B]['compile_s']:.1f}s", flush=True)

    for r in range(args.rounds):
        for B in batches:  # interleave: every round touches every arm
            a = arms[B]
            t0 = time.perf_counter()
            force_sync(phase(*a["args"]))
            a["walls"].append(time.perf_counter() - t0)
        print(f"round {r + 1}/{args.rounds} done", flush=True)

    results = []
    for B in batches:
        walls = sorted(arms[B]["walls"])
        med = walls[len(walls) // 2]
        flops = sampling_phase_flops(cfg, B)["total"]
        chain_steps = phase_chain_steps(cfg, B)
        results.append({
            "B": B,
            "wall_s_median": round(med, 6),
            "wall_s_all": [round(w, 6) for w in walls],
            "chain_steps_per_sec": round(chain_steps / med, 1),
            "images_per_sec": round(B / med, 1),
            "achieved_tflops": round(flops / med / 1e12, 2),
            "mfu_vs_bf16_peak": round(flops / med / peak, 5) if peak else None,
        })
        print(json.dumps(results[-1]), flush=True)

    out = {
        "device_kind": jax.devices()[0].device_kind,
        "protocol": f"interleaved, {args.rounds} rounds, median reported",
        "config": "cifar10 preset sampling phase (Q100 + post30 + 2Bx60 prior)",
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
