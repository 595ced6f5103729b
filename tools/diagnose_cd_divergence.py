"""Diagnose the late contrastive-divergence divergence (round-3 item).

Round 2's 10k-iter endurance run on a 4,096-image synthetic set showed EBM
energies blowing up after ~6k iters (~380 epochs of recycling the same
images) — noted, gated around via best-ckpt, but unexplained. This tool
settles WHY with a controlled experiment on the real TPU:

  run A (small-data): the round-2 regime — N=4096 images, cifar10 preset.
  run B (large-data control): N=50,000 images (the real CIFAR-10 scale the
      reference trains on, `train_gen_recon.py` + torchvision CIFAR10),
      same config, same iterations.

If A diverges at the same epochs-recycled point while B stays stable at the
SAME iteration count, the divergence is a small-data CD artifact (the EBM
overfits the recycled posterior samples and the pos/neg energy gap runs
away) — reference-inherent behavior under that regime, not a porting bug.
A torch-reference head-to-head under heavy recycling (tools/
trajectory_parity.py `run_reference` at tiny config) closes the loop.

Subcommands:
  run      one training run, diagnostics logged every --print_every iters
  analyze  read >=1 metrics.jsonl files -> onset detection + verdict JSON

The train step already emits every diagnostic needed (e_pos, e_neg,
prior_energy_final, post_energy_final, zk_pos_abs_max — train/step.py:178-186);
this tool only orchestrates runs and post-processes the jsonl.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthetic_uint8(n: int, res: int, seed: int = 0) -> np.ndarray:
    """Same synthetic family as tools/validate_gen_recon_tpu.py."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / (res - 1.0)
    base = np.stack([yy, xx, yy * xx], axis=-1)[None]
    # Chunked to keep peak memory sane at n=50k.
    out = np.empty((n, res, res, 3), np.uint8)
    for i in range(0, n, 8192):
        j = min(i + 8192, n)
        m = j - i
        imgs = base * rng.uniform(0.2, 1.0, (m, 1, 1, 3)).astype(np.float32)
        imgs = imgs + 0.1 * rng.rand(m, res, res, 3).astype(np.float32)
        out[i:j] = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
    return out


def cmd_run(args):
    import dataclasses
    import time

    import jax

    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.train.gen_recon import train_gen_recon
    from damc_tpu.utils import preset

    enable_compile_cache()
    cfg = preset(args.dataset)
    res = cfg.model.image_size
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            e_energy_reg=args.e_energy_reg,
            data_placement=args.data_placement,
            print_every=args.print_every,
            # dynamics run: no FID/plots — maximize iters/hour; periodic
            # ckpt retained so the run is resumable after preemption.
            eval_every=0, plot_every=0, ckpt_every=5000,
            # --resume: continue a preempted/stalled run from its newest
            # checkpoint (the log_dir IS the run dir here, so 'auto'
            # resolves against <log_dir>/ckpt; metrics.jsonl appends).
            resume_path="auto" if args.resume else None,
        ),
    )
    imgs = synthetic_uint8(args.n_images, res, seed=0)
    os.makedirs(args.log_dir, exist_ok=True)
    print(f"run: n_images={args.n_images} iters={args.iters} -> {args.log_dir}",
          flush=True)
    t0 = time.perf_counter()
    train_gen_recon(
        cfg, imgs, fid_images=None, mse_images=None, feature_fn=None,
        iterations=args.iters, log_dir=args.log_dir, seed=args.seed,
    )
    print(f"done in {time.perf_counter()-t0:.0f}s", flush=True)


def load_train_records(jsonl_path):
    recs = [json.loads(l) for l in open(jsonl_path)]
    return [r for r in recs if r.get("phase") == "train" and "e_pos" in r]


def detect_onset(recs, batch, n_images, warmup_frac=0.2, k=5.0):
    """Onset = first iter where the |pos-neg| energy gap exceeds k x its
    robust (median + 5*MAD-ish via quantiles) warmup level, sustained for
    3 consecutive records. Returns a dict (onset None if stable)."""
    it = np.array([r["step"] for r in recs])
    gap = np.abs(np.array([r["e_pos"] - r["e_neg"] for r in recs]))
    prior_e = np.abs(np.array([r["prior_energy_final"] for r in recs]))
    zmax = np.array([r["zk_pos_abs_max"] for r in recs])

    w = max(int(len(recs) * warmup_frac), 8)
    base = max(float(np.quantile(gap[:w], 0.9)), 1e-3)
    thresh = k * base
    hot = gap > thresh
    onset = None
    for i in range(len(hot) - 2):
        if hot[i] and hot[i + 1] and hot[i + 2]:
            onset = int(it[i])
            break
    out = {
        "records": len(recs),
        "last_iter": int(it[-1]),
        "warmup_gap_q90": base,
        "threshold": thresh,
        "onset_iter": onset,
        "onset_epochs_recycled": (onset * batch / n_images) if onset is not None else None,
        "final_gap": float(gap[-1]),
        "final_abs_prior_energy": float(prior_e[-1]),
        "max_zk_pos_abs": float(zmax.max()),
        "final_g_loss": float(recs[-1]["g_loss"]),
        "any_nan": bool(any(not np.isfinite(g) for g in gap)),
    }
    return out


def cmd_analyze(args):
    results = {}
    for spec in args.runs:
        name, path, n_images = spec.split(":")
        recs = load_train_records(os.path.join(path, "metrics.jsonl"))
        results[name] = detect_onset(recs, args.batch, int(n_images))
        results[name]["n_images"] = int(n_images)

    verdict = None
    if {"small", "large"} <= set(results):
        s, l = results["small"], results["large"]
        if s["onset_iter"] is not None and l["onset_iter"] is None:
            verdict = (
                f"small-data CD artifact confirmed: N={s['n_images']} diverges at "
                f"iter {s['onset_iter']} ({s['onset_epochs_recycled']:.0f} epochs of "
                f"recycling) while N={l['n_images']} is stable through iter "
                f"{l['last_iter']} of the SAME config — the EBM overfits recycled "
                "posterior samples; not a porting bug."
            )
        elif s["onset_iter"] is not None and l["onset_iter"] is not None:
            verdict = (
                f"both regimes diverge (small at {s['onset_iter']}, large at "
                f"{l['onset_iter']}) — divergence is NOT explained by data "
                "recycling alone; investigate E update/clip ordering."
            )
        else:
            verdict = "no divergence detected in either regime at this length."
    out = {"runs": results, "verdict": verdict}
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(f"-> {args.out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run")
    r.add_argument("--dataset", default="cifar10")
    r.add_argument("--n_images", type=int, required=True)
    r.add_argument("--iters", type=int, default=25000)
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--print_every", type=int, default=50)
    r.add_argument("--e_energy_reg", type=float, default=0.0,
                   help="EBM energy regularizer alpha (0 = reference CD)")
    r.add_argument("--resume", action="store_true",
                   help="continue from the newest checkpoint in --log_dir")
    r.add_argument("--data_placement", default="auto",
                   choices=["auto", "device", "host"],
                   help="training-batch feed (device = HBM-resident store)")
    r.add_argument("--log_dir", required=True)
    r.set_defaults(fn=cmd_run)
    a = sub.add_parser("analyze")
    a.add_argument("runs", nargs="+",
                   help="name:log_dir:n_images (e.g. small:/tmp/cd_small:4096)")
    a.add_argument("--batch", type=int, default=128)
    a.add_argument("--out", default=None)
    a.set_defaults(fn=cmd_analyze)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
