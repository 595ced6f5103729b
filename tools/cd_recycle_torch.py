"""Does the REFERENCE torch loop also diverge under heavy data recycling?

Round 2's 10k-iter TPU endurance run (4,096 synthetic images, ~300+ epochs
of recycling) showed late contrastive-divergence blowup. tools/
diagnose_cd_divergence.py runs the damc small-vs-large-data control on TPU;
this tool closes the loop by running the REFERENCE's own torch training
loop (via tools/trajectory_parity.py::run_reference — reference modules
imported from /root/reference/workspace) AND the damc loop side by side at
a tiny config under the SAME heavy-recycling regime (few images, many
epochs), recording e_pos/e_neg/g_loss trajectories.

If BOTH loops' |e_pos - e_neg| gap runs away at a comparable
epochs-recycled point, the divergence is reference-inherent EBM-CD
overfitting of recycled posterior samples — not a porting bug.

Progress is dumped to --out every --dump_every iters (a multi-hour 1-core
run must be crash-safe).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--n_images", type=int, default=128)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dump_every", type=int, default=100)
    ap.add_argument("--out", default="artifacts/cd_recycle_torch.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from trajectory_parity import (
        METRIC_KEYS,
        batch_schedule,
        mask_sequence,
        run_reference,
        synthetic_images,
        tiny_config,
    )

    from damc_tpu.train.state import create_state
    from damc_tpu.train.step import make_train_step
    from damc_tpu.utils.torch_compat import export_reference_checkpoint

    cfg = tiny_config(
        batch_size=args.batch, g_l_steps=10, e_l_steps=12, n_interval=6,
        nz=16, ngf=8, nif=8, ndf=32, nxemb=24, ntemb=8,
    )
    images = synthetic_images(args.n_images, res=32, seed=args.seed)
    sched = batch_schedule(args.n_images, args.batch, args.iters, seed=args.seed + 1)
    epochs_per_iter = args.batch / args.n_images

    state, models, opts = create_state(jax.random.PRNGKey(args.seed), cfg)
    masks = mask_sequence(state.rng, args.iters, args.batch, cfg.diffusion.p_mask)

    import tempfile

    pth = os.path.join(tempfile.mkdtemp(prefix="cd_recycle_"), "init.pth.tar")
    export_reference_checkpoint(
        state, pth, dataset=cfg.model.dataset, nxemb=cfg.model.nxemb
    )

    meta = {
        "iters": args.iters, "n_images": args.n_images, "batch": args.batch,
        "epochs_per_iter": epochs_per_iter,
        "config": "tiny cifar10-family (nz=16 ngf=8 g_l=10 e_l=12 T=6)",
    }

    def dump(damc, ref, done):
        with open(args.out, "w") as f:
            json.dump(
                {
                    "meta": {**meta, "iters_done": done},
                    "damc": {k: [float(v) for v in damc[k]] for k in damc},
                    "ref": {k: [float(v) for v in ref[k]] for k in ref},
                },
                f,
            )

    # damc loop first, dumped in chunks (crash-safe on 1 core).
    step = jax.jit(make_train_step(models, opts, cfg))
    damc_traj = {k: [] for k in METRIC_KEYS}
    ref_traj = {k: [] for k in METRIC_KEYS}
    s = state
    chunk = args.dump_every
    for start in range(0, args.iters, chunk):
        end = min(start + chunk, args.iters)
        for t in range(start, end):
            s, metrics = step(s, jax.numpy.asarray(images[sched[t]]))
            for k in METRIC_KEYS:
                damc_traj[k].append(float(metrics[k]))
        dump(damc_traj, ref_traj, end)
        print(f"damc {end}/{args.iters} "
              f"(e_gap {damc_traj['e_pos'][-1] - damc_traj['e_neg'][-1]:+.3f})",
              flush=True)

    # Reference loop with periodic dumps via the progress callback.
    def on_progress(done, traj):
        for k in METRIC_KEYS:
            ref_traj[k] = [float(v) for v in traj[k]]
        dump(damc_traj, ref_traj, done)
        print(f"ref {done}/{args.iters} "
              f"(e_gap {traj['e_pos'][-1] - traj['e_neg'][-1]:+.3f})", flush=True)

    ref_traj_full, _nets = run_reference(
        cfg, pth, images, sched, masks, seed=args.seed, torch_threads=1,
        progress_cb=on_progress, progress_every=args.dump_every,
    )
    for k in METRIC_KEYS:
        ref_traj[k] = [float(v) for v in ref_traj_full[k]]
    dump(damc_traj, ref_traj, args.iters)

    gap_d = np.abs(np.array(damc_traj["e_pos"]) - np.array(damc_traj["e_neg"]))
    gap_r = np.abs(np.array(ref_traj["e_pos"]) - np.array(ref_traj["e_neg"]))
    w = max(args.iters // 10, 1)
    print(json.dumps({
        "early_gap": {"damc": float(gap_d[:w].mean()), "ref": float(gap_r[:w].mean())},
        "late_gap": {"damc": float(gap_d[-w:].mean()), "ref": float(gap_r[-w:].mean())},
        "late_over_early": {
            "damc": float(gap_d[-w:].mean() / max(gap_d[:w].mean(), 1e-9)),
            "ref": float(gap_r[-w:].mean() / max(gap_r[:w].mean(), 1e-9)),
        },
        "epochs_recycled_total": args.iters * epochs_per_iter,
    }, indent=2), flush=True)
    print(f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()
