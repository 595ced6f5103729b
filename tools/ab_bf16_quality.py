"""fp32-vs-bf16 QUALITY A/B for the training compute path.

`--compute_dtype bfloat16` runs the generator/encoder conv stacks on bf16
(schedule math, latents, and energies stay fp32 — see
`models/generators.py` dtype plumbing) and was measured 1.04-1.19x faster
on the sampling phase (artifacts/mfu_probe.json). This tool supplies the
missing half of that story: does the bf16 path LEARN the same? Both arms
run the full gen_recon driver from the same seed on the same synthetic
dataset; we compare the eval-metric trajectories (frechet_rand via the
same random-feature oracle, recon MSE) and the final train losses.

Quality, unlike wall-clock, is immune to shared-tenancy drift, so
sequential arms in one process are sound (the A/B-alternation discipline
in tools/ab_qsweep_noise.py is only needed for TIMING comparisons).

Writes artifacts/bf16_quality.json.

Usage:  python tools/ab_bf16_quality.py [--iters 1501] [--dataset cifar10]
"""

import argparse
import dataclasses
import json
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def synthetic_images(res: int, n: int = 4096) -> np.ndarray:
    # Same generator as tools/validate_gen_recon_tpu.py: smooth random
    # gradients + noise, uint8.
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / (res - 1.0)
    base = np.stack([yy, xx, yy * xx], axis=-1)[None]
    imgs = base * rng.uniform(0.2, 1.0, (n, 1, 1, 3)).astype(np.float32)
    imgs = imgs + 0.1 * rng.rand(n, res, res, 3).astype(np.float32)
    return (np.clip(imgs, 0, 1) * 255).astype(np.uint8)


def run_arm(cfg, imgs, feat, iters: int, name: str) -> dict:
    from damc_tpu.train.gen_recon import train_gen_recon

    log_dir = tempfile.mkdtemp(prefix=f"damc_bf16ab_{name}_")
    # mse_images must be float in [-1, 1] (load_dataset contract) — raw
    # uint8 would swamp the MSE with the 0..255 target scale in BOTH arms
    # and make the comparison vacuous.
    mse_set = imgs[:512].astype(np.float32) / 255.0 * 2.0 - 1.0
    t0 = time.perf_counter()
    train_gen_recon(
        cfg, imgs, fid_images=imgs[:2048], mse_images=mse_set,
        feature_fn=feat, iterations=iters, log_dir=log_dir, seed=0,
        fid_metric_name="frechet_rand",
    )
    wall = time.perf_counter() - t0
    evals, trains = [], []
    with open(f"{log_dir}/metrics.jsonl") as f:
        for line in f:
            row = json.loads(line)
            (evals if row.get("phase") == "eval" else trains).append(row)
    return {
        "compute_dtype": name,
        "wall_s": round(wall, 1),
        "log_dir": log_dir,
        "eval_trajectory": [
            {k: round(v, 5) for k, v in r.items() if isinstance(v, float)}
            | {"step": r["step"]}
            for r in evals
        ],
        "final_train": {
            k: round(v, 5) for k, v in trains[-1].items()
            if isinstance(v, float)
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1501)
    ap.add_argument("--dataset", default="cifar10")
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--n_fid_samples", type=int, default=2000)
    args = ap.parse_args()

    import jax

    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.metrics.fid import make_random_feature_fn
    from damc_tpu.utils import preset

    enable_compile_cache()
    base = preset(args.dataset)
    res = base.model.image_size
    imgs = synthetic_images(res)
    feat = make_random_feature_fn(jax.random.PRNGKey(0), (res, res, 3))

    arms = {}
    for dtype in ("float32", "bfloat16"):
        cfg = dataclasses.replace(
            base,
            model=dataclasses.replace(base.model, compute_dtype=dtype),
            train=dataclasses.replace(
                base.train, n_fid_samples=args.n_fid_samples,
                eval_every=args.eval_every, plot_every=0,
                print_every=500, ckpt_every=0,
            ),
        )
        arms[dtype] = run_arm(cfg, imgs, feat, args.iters, dtype)
        last = arms[dtype]["eval_trajectory"][-1]
        print(f"[{dtype}] wall {arms[dtype]['wall_s']}s last eval {last}",
              flush=True)

    # Compare trajectories, not single noisy endpoints: both the final and
    # the best value of each declining eval metric.
    def metric_cmp(key):
        t32 = [r[key] for r in arms["float32"]["eval_trajectory"] if key in r]
        t16 = [r[key] for r in arms["bfloat16"]["eval_trajectory"] if key in r]
        out = {
            "float32": {"final": t32[-1], "best": min(t32)},
            "bfloat16": {"final": t16[-1], "best": min(t16)},
        }
        out["best_rel_diff"] = round(
            abs(min(t16) - min(t32)) / max(min(t32), 1e-9), 4
        )
        return out

    verdict = {
        "frechet_rand_damc": metric_cmp("frechet_rand_damc"),
        "recon_mse": metric_cmp("recon_mse"),
        "device_kind": jax.devices()[0].device_kind,
        "iters": args.iters,
        "dataset": args.dataset,
    }
    out = {"verdict": verdict, "arms": arms}
    with open("artifacts/bf16_quality.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(verdict, indent=2), flush=True)


if __name__ == "__main__":
    main()
