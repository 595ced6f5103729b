"""A/B: device-resident training feed vs host loader + per-batch device_put.

`DeviceDataset` (data/device_data.py) keeps the store in HBM and builds
batches on device; this tool measures the end-to-end training-loop effect
on real hardware. First recorded result (idle host, cifar10 preset):
device 7.78 vs host 7.72 iters/s — only +0.7%, because the 0.136 s fused
train step dominates and the host feed pipelines behind it. This REFUTED
the motivating read of the endurance run's `time_s/data` 0.05-0.19 s
(async-dispatch wait misattributed to the data phase). The `--contend`
mode measures the case where the device path actually pays: host CPU
contention (this box has 1 core; any concurrent pytest/torch work starves
the host feed thread).

Method: ONE process, ONE jitted train step, alternating blocks
(device, host, device, host, ...) so shared-tenancy drift cannot fake the
comparison (same discipline as tools/ab_qsweep_noise.py — sequential runs
on this platform disagree by 10-30%). Wall time per block is fenced with
`force_sync` (axon: block_until_ready does not actually block). The first
block of each arm is a discarded warmup (compile + prefetch-thread
ramp-up).

Output: one JSON line + artifacts/ab_data_placement.json with per-block
iters/s, medians, and the device/host speedup ratio.

Run (background, idle box):
  python tools/ab_data_placement.py --rounds 5 --block 50 \
      --out artifacts/ab_data_placement.json
"""

import argparse
import dataclasses
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from diagnose_cd_divergence import synthetic_uint8  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="cifar10")
    ap.add_argument("--n_images", type=int, default=4096)
    ap.add_argument("--rounds", type=int, default=5,
                    help="measured blocks per arm (plus 1 warmup each)")
    ap.add_argument("--block", type=int, default=50,
                    help="train iterations per timed block")
    ap.add_argument("--out", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model: correctness of the harness only")
    ap.add_argument("--contend", type=int, default=0, metavar="N",
                    help="spawn N host CPU-hog processes for the measured "
                    "blocks (models real-world contention on the 1-core "
                    "box: pytest / torch loops starving the host feed)")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.train import create_state
    from damc_tpu.train.driver_utils import make_batch_source, make_step_fn
    from damc_tpu.utils import preset
    from damc_tpu.utils.profiling import force_sync

    enable_compile_cache()
    cfg = preset(args.dataset)
    if args.smoke:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=16
            ),
            diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
            mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
            train=dataclasses.replace(cfg.train, batch_size=16),
        )
    imgs = synthetic_uint8(args.n_images, cfg.model.image_size, seed=0)

    state, models, opts = create_state(jax.random.PRNGKey(0), cfg)
    step, state = make_step_fn(models, opts, cfg, None, state)

    arms = {}
    for placement in ("device", "host"):
        tc = dataclasses.replace(cfg.train, data_placement=placement)
        nb, close, got = make_batch_source(imgs, tc, None, seed=1)
        assert got == placement, (got, placement)
        arms[placement] = {"next_batch": nb, "close": close, "iters_per_s": []}

    # warmup both arms first (compile once, shared jit cache), then measure
    # alternating blocks. Hogs (if any) run only during measured blocks —
    # killed by recorded pid, never by pattern.
    import subprocess

    hogs = []
    try:
        for phase in ["warmup"] + ["measure"] * args.rounds:
            if phase == "measure" and args.contend and not hogs:
                hogs = [
                    subprocess.Popen([sys.executable, "-c",
                                      "while True:\n x = sum(range(10000))"])
                    for _ in range(args.contend)
                ]
                time.sleep(1.0)  # let the scheduler settle
            for placement in ("device", "host"):
                arm = arms[placement]
                t0 = time.perf_counter()
                for _ in range(args.block):
                    state, metrics = step(state, arm["next_batch"]())
                force_sync(metrics["g_loss"])
                dt = time.perf_counter() - t0
                if phase == "measure":
                    arm["iters_per_s"].append(args.block / dt)
                print(f"[{phase}] {placement}: {args.block / dt:.2f} iters/s",
                      flush=True)
    finally:
        for h in hogs:
            h.kill()

    for arm in arms.values():
        arm["close"]()

    med = {p: statistics.median(arms[p]["iters_per_s"]) for p in arms}
    result = {
        "platform": jax.devices()[0].platform,
        "dataset": args.dataset,
        "n_images": args.n_images,
        "batch_size": cfg.train.batch_size,
        "block": args.block,
        "rounds": args.rounds,
        "contend_hogs": args.contend,
        "device_iters_per_s": med["device"],
        "host_iters_per_s": med["host"],
        "speedup_device_over_host": med["device"] / med["host"],
        "blocks": {p: arms[p]["iters_per_s"] for p in arms},
    }
    print(json.dumps(result))
    if args.out:
        if os.path.dirname(args.out):
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        print(f"-> {args.out}")


if __name__ == "__main__":
    main()
