"""Shared CLI plumbing: flag -> Config overrides, dataset loading.

The flag inventory mirrors the reference argparse blocks (SURVEY.md §5)
while the values live in the typed Config tree.
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime as dt
import os
import os.path as osp
from typing import Optional, Tuple

import numpy as np

from ..data.datasets import (
    load_cifar10,
    load_image_folder,
    load_image_folder_cached,
    load_svhn,
)
from ..utils.config import Config, preset


def honor_jax_platforms_env() -> None:
    """Re-apply the `JAX_PLATFORMS` env var through the live config.

    This image's sitecustomize imports jax at interpreter startup (with the
    axon TPU platform pre-registered), so by the time any CLI main() runs,
    the env var has already been consumed and setting it has NO effect —
    `JAX_PLATFORMS=cpu python -m damc_tpu.cli.train_gen_recon ...` would
    silently run on the TPU. Restore the standard JAX contract by pushing
    the env value into the config before the backend is touched."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def enable_compile_cache(path: str = "~/.cache/damc/jax_compile") -> None:
    """Persistent XLA compilation cache — long-scan programs can take minutes
    to compile through remote-compile tunnels; cache them across processes.
    Also the common entry hook for every CLI, so it re-applies JAX_PLATFORMS
    (see honor_jax_platforms_env)."""
    import jax

    honor_jax_platforms_env()
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def str2bool(v: str) -> bool:
    """Strict bool flag parser. The reference uses `type=bool`, under which
    ANY non-empty string (including "False") parses truthy
    (`train_gen_recon.py:376-378,395-397`); we keep the flag names but parse
    the values correctly."""
    if isinstance(v, bool):
        return v
    s = v.strip().lower()
    if s in ("true", "t", "yes", "y", "1"):
        return True
    if s in ("false", "f", "no", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def add_common_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--dataset", type=str, default="cifar10")
    p.add_argument("--log_path", type=str, default="logs")
    p.add_argument("--data_path", type=str, default="data")
    p.add_argument(
        "--resume_path", type=str, default=None,
        help="checkpoint to resume from, or 'auto' to continue from the "
        "newest checkpoint in the run dir (preemption recovery)",
    )
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--n_fid_samples", type=int, default=None)
    # architecture
    p.add_argument(
        "--compute_dtype", type=str, default=None,
        choices=["float32", "bfloat16"],
        help="conv-net compute dtype (bf16 is learning-parity validated; "
        "schedule/Langevin math stays fp32)",
    )
    p.add_argument("--nz", type=int, default=None)
    p.add_argument("--ngf", type=int, default=None)
    p.add_argument("--nif", type=int, default=None)
    p.add_argument("--nc", type=int, default=None, help="image channels")
    p.add_argument("--nxemb", type=int, default=None)
    p.add_argument("--ntemb", type=int, default=None)
    # diffusion
    p.add_argument(
        "--n_interval", "--n_interval_posterior", dest="n_interval",
        type=int, default=None,
        help="reverse-diffusion steps (reference --n_interval_posterior)",
    )
    p.add_argument(
        "--n_interval_prior", type=int, default=None,
        help="accepted for reference-CLI parity; the reference parses but "
        "never uses it (train_gen_recon.py:373) — only the posterior "
        "interval feeds the amortizer",
    )
    p.add_argument("--logsnr_min", type=float, default=None)
    p.add_argument("--logsnr_max", type=float, default=None)
    p.add_argument(
        "--diffusion_residual", type=str2bool, default=None,
        help="denoiser predicts a residual on z (reference default True)",
    )
    p.add_argument("--var_type", type=str, default=None, choices=["large", "small"])
    p.add_argument(
        "--Q_with_noise", type=str2bool, default=None,
        help="stochastic ancestral steps in Q.sample (reference default True)",
    )
    p.add_argument("--p_mask", type=float, default=None)
    p.add_argument("--cond_w", type=float, default=None)
    # mcmc
    p.add_argument("--g_l_steps", type=int, default=None)
    p.add_argument("--g_l_step_size", type=float, default=None)
    p.add_argument("--g_l_with_noise", type=str2bool, default=None)
    p.add_argument("--g_llhd_sigma", type=float, default=None)
    p.add_argument("--e_l_steps", type=int, default=None)
    p.add_argument("--e_l_step_size", type=float, default=None)
    p.add_argument("--e_l_with_noise", type=str2bool, default=None)
    # optim
    p.add_argument("--g_lr", type=float, default=None)
    p.add_argument("--e_lr", type=float, default=None)
    p.add_argument("--q_lr", type=float, default=None)
    # grad-clip norms; the reference's *_is_grad_clamp toggles default True
    # with max_norm=100 (`train_gen_recon.py:392-397`) — pass a very large
    # norm to disable clipping.
    p.add_argument("--q_max_norm", type=float, default=None)
    p.add_argument("--e_max_norm", type=float, default=None)
    p.add_argument("--g_max_norm", type=float, default=None)
    p.add_argument(
        "--e_energy_reg", type=float, default=None,
        help="EBM energy-magnitude regularizer alpha (default 0 = exact "
             "reference CD, which runs away after ~5k iters — see "
             "artifacts/CD_DIVERGENCE.md; 2e-4 stabilizes long horizons)",
    )
    p.add_argument(
        "--fid_batch_size", type=int, default=None,
        help="FID sample-generation batch (reference MCMC.py:130: 500)",
    )
    p.add_argument(
        "--data_placement", type=str, default=None,
        choices=["auto", "device", "host"],
        help="training-batch feed: 'auto' keeps array stores resident in "
        "device HBM (on-device shuffle/flip, no per-iteration transfer), "
        "'host' forces the host loader + per-batch device_put",
    )
    p.add_argument(
        "--data_device_budget_gb", type=float, default=None,
        help="HBM budget for the device-resident store (default 8 GB: "
        "admits CelebA-HQ-256's 5.9 GB on a 16 GB chip)",
    )
    # grad-clip on/off toggles, for reference-CLI compatibility
    # (`train_gen_recon.py:395-397`): False maps to max_norm=inf, which
    # makes optax.clip_by_global_norm an exact no-op.
    p.add_argument("--q_is_grad_clamp", type=str2bool, default=None,
                   help="False disables Q grad clipping (max_norm=inf)")
    p.add_argument("--e_is_grad_clamp", type=str2bool, default=None,
                   help="False disables E grad clipping (max_norm=inf)")
    p.add_argument("--g_is_grad_clamp", type=str2bool, default=None,
                   help="False disables G grad clipping (max_norm=inf)")
    # intervals — each accepts the reference spelling too
    # (print/plot/ckpt/fid_iter `train_gen_recon.py:402-405`, eval_iter
    # `train_anomaly_det.py:305`)
    p.add_argument("--print_every", "--print_iter", dest="print_every",
                   type=int, default=None)
    p.add_argument("--plot_every", "--plot_iter", dest="plot_every",
                   type=int, default=None)
    p.add_argument("--ckpt_every", "--ckpt_iter", dest="ckpt_every",
                   type=int, default=None)
    p.add_argument("--eval_every", "--fid_iter", "--eval_iter",
                   dest="eval_every", type=int, default=None,
                   help="fid/auprc eval interval")
    # misc
    p.add_argument("--label", type=int, default=None, help="anomaly held-out digit")
    p.add_argument("--use_mesh", action="store_true", help="data-parallel over all devices")
    p.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed BEFORE any backend use (TPU pods: "
        "auto-detected from the environment; implies --use_mesh over the "
        "resulting global device set). Manual setups also set "
        "--coordinator_address/--num_processes/--process_id.",
    )
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (with --multihost)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)


def maybe_init_multihost(args) -> None:
    """Call FIRST in a CLI main(), before enable_compile_cache or any jax
    backend query — jax.distributed.initialize refuses to run once XLA is
    initialized. Makes --multihost imply --use_mesh (a multi-host run with
    an unsharded step would silently compute on device 0 of each host)."""
    honor_jax_platforms_env()
    if getattr(args, "multihost", False):
        from ..parallel.distributed import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        args.use_mesh = True


def config_from_args(args, preset_name: Optional[str] = None) -> Config:
    cfg = preset(preset_name or args.dataset)

    def over(section, **kw):
        nonlocal cfg
        kw = {k: v for k, v in kw.items() if v is not None}
        if kw:
            cfg = dataclasses.replace(
                cfg, **{section: dataclasses.replace(getattr(cfg, section), **kw)}
            )

    if args.n_interval_prior is not None and args.n_interval_prior != (
        args.n_interval if args.n_interval is not None else cfg.diffusion.n_interval
    ):
        print(
            "[damc] NOTE: --n_interval_prior is accepted for reference-CLI "
            "parity but has no effect (the reference never uses it either, "
            "train_gen_recon.py:373)."
        )
    over(
        "model", nz=args.nz, ngf=args.ngf, nif=args.nif, nc=args.nc,
        nxemb=args.nxemb, ntemb=args.ntemb, compute_dtype=args.compute_dtype,
    )
    over(
        "diffusion",
        n_interval=args.n_interval,
        logsnr_min=args.logsnr_min,
        logsnr_max=args.logsnr_max,
        residual=args.diffusion_residual,
        var_type=args.var_type,
        with_noise=args.Q_with_noise,
        p_mask=args.p_mask,
        cond_w=args.cond_w,
    )
    over(
        "mcmc",
        g_l_steps=args.g_l_steps,
        g_l_step_size=args.g_l_step_size,
        g_l_with_noise=args.g_l_with_noise,
        g_llhd_sigma=args.g_llhd_sigma,
        e_l_steps=args.e_l_steps,
        e_l_step_size=args.e_l_step_size,
        e_l_with_noise=args.e_l_with_noise,
    )
    over(
        "optim", g_lr=args.g_lr, e_lr=args.e_lr, q_lr=args.q_lr,
        q_max_norm=args.q_max_norm, e_max_norm=args.e_max_norm,
        g_max_norm=args.g_max_norm,
    )
    # Reference clamp toggles: --x_is_grad_clamp false == no clipping
    # (overrides any max_norm; the reference ignores max_norm when the
    # toggle is off, `train_gen_recon.py:218,229,239`).
    over("optim", **{
        norm_field: float("inf")
        for norm_field, toggle in (
            ("q_max_norm", args.q_is_grad_clamp),
            ("e_max_norm", args.e_is_grad_clamp),
            ("g_max_norm", args.g_is_grad_clamp),
        )
        if toggle is False
    })
    over(
        "train",
        seed=args.seed,
        batch_size=args.batch_size,
        iterations=args.iterations,
        n_fid_samples=args.n_fid_samples,
        fid_batch_size=args.fid_batch_size,
        log_path=args.log_path,
        data_path=args.data_path,
        resume_path=args.resume_path,
        heldout_digit=args.label,
        print_every=args.print_every,
        plot_every=args.plot_every,
        ckpt_every=args.ckpt_every,
        eval_every=args.eval_every,
        e_energy_reg=args.e_energy_reg,
        data_placement=args.data_placement,
        data_device_budget_gb=args.data_device_budget_gb,
    )
    return cfg


def make_log_dir(cfg: Config) -> str:
    """Timestamped run dir with the full config serialized for provenance
    (supersedes the reference's self-copy of the launch script,
    `train_gen_recon.py:46`).

    `--resume_path auto` reuses the NEWEST existing run dir instead of
    minting a fresh timestamp: preemption recovery is "re-run the same
    command", so the restarted process must land in the interrupted run's
    dir — that is where `auto` finds its newest checkpoint, and where the
    pre-resume metrics.jsonl seeds the CD-gap monitor. A fresh timestamp
    every invocation would silently start over.

    Multi-host: ALL processes must agree on this path — the orbax
    checkpoint save is a coordinated all-host write, and per-host clocks
    (or directory-listing races) differ, so process 0's choice is broadcast
    to everyone (names are fixed-width timestamps, so the byte-broadcast is
    shape-safe on every host)."""
    import dataclasses as dc
    import json
    import math

    import jax

    base = osp.join(cfg.train.log_path, cfg.model.dataset)
    now = dt.datetime.now()
    stamp = now.strftime("%Y%m%d_%H%M%S")
    def is_run_name(d: str) -> bool:
        # Exact timestamp shape (8 digits, '_', 6 digits) — a stray 15-char
        # directory like "baseline_sweep1" must not be adopted as a run.
        return (
            len(d) == len(stamp)
            and d[8] == "_"
            and (d[:8] + d[9:]).isdigit()
        )

    adopted = False
    if cfg.train.resume_path == "auto" and osp.isdir(base):
        runs = sorted(
            d for d in os.listdir(base)
            if is_run_name(d) and osp.isdir(osp.join(base, d))
        )
        if runs:  # lexicographic == chronological for the timestamp format
            stamp = runs[-1]
            adopted = True
    if not adopted and jax.process_index() == 0:
        # Fresh runs must not share a dir: two launches in the same second
        # would clobber each other's config/metrics. makedirs(exist_ok=False)
        # makes creation itself the claim — an exists() pre-check alone is a
        # TOCTOU window where two concurrent launches both adopt the stamp.
        # An `auto` launch with no adoptable run takes the SAME exclusive
        # claim (before this, `isdir(base) and not runs` skipped it and two
        # same-second `auto` relaunches fell through to the shared
        # makedirs(exist_ok=True)) — but on collision it ADOPTS the winner
        # instead of bumping: `auto` means "attach to the newest run", and
        # bumping would split concurrently double-started relaunches (the
        # preemption-recovery path) across two half-runs. Plain fresh runs
        # bump seconds until a create succeeds; the stamp stays fixed-width
        # (broadcast shape) and lexicographically chronological (the `auto`
        # scan above). Primary-host-only: the other hosts take the broadcast.
        while True:
            try:
                os.makedirs(osp.join(base, stamp), exist_ok=False)
                break
            except FileExistsError:
                if cfg.train.resume_path == "auto":
                    # stamp is run-shaped, so the colliding dir is a run a
                    # concurrent relaunch just claimed — converge on it.
                    break
                now += dt.timedelta(seconds=1)
                stamp = now.strftime("%Y%m%d_%H%M%S")
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        raw = np.frombuffer(stamp.encode(), np.uint8)
        stamp = bytes(
            np.asarray(multihost_utils.broadcast_one_to_all(raw))
        ).decode()
    log_dir = osp.join(base, stamp)
    os.makedirs(log_dir, exist_ok=True)
    if jax.process_index() == 0:
        def json_safe(obj):
            # json.dumps emits bare Infinity/NaN tokens (invalid strict
            # JSON) for non-finite floats — reachable via the
            # --*_is_grad_clamp false -> max_norm=inf mapping. Stringify
            # them so config.json stays parseable by jq/JS/etc.
            if isinstance(obj, float) and not math.isfinite(obj):
                return repr(obj)
            if isinstance(obj, dict):
                return {k: json_safe(v) for k, v in obj.items()}
            if isinstance(obj, (list, tuple)):
                return [json_safe(v) for v in obj]
            return obj

        serialized = json.dumps(json_safe(dc.asdict(cfg)), indent=2, default=str)
        main_cfg = osp.join(log_dir, "config.json")
        if not osp.exists(main_cfg):
            with open(main_cfg, "w") as f:
                f.write(serialized)
        elif open(main_cfg).read() != serialized:
            # Auto-resume relaunch with CHANGED hyperparameters (e.g. adding
            # --e_energy_reg after a CD-gap alarm): config.json stays the
            # original run's provenance; record what the post-resume
            # iterations actually ran under, one file per relaunch.
            resumed = osp.join(
                log_dir,
                f"config.resume.{dt.datetime.now().strftime('%Y%m%d_%H%M%S')}.json",
            )
            with open(resumed, "w") as f:
                f.write(serialized)
    return log_dir


def to_pm1(u8: np.ndarray) -> np.ndarray:
    return u8.astype(np.float32) / 255.0 * 2.0 - 1.0


def load_dataset(cfg: Config) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(train_images, fid_reference_images, mse_eval_images) in [-1, 1].

    Split roles follow `train_gen_recon.py:58-111`: FID stats come from the
    train split; recon MSE from the held-out split.
    """
    d, root = cfg.model.dataset, cfg.train.data_path
    # Train stores stay uint8 (native C++ loader path + 4x less host RAM);
    # eval arrays are converted to [-1, 1] float up front.
    if d == "cifar10":
        tr = load_cifar10(root, "train")
        te = to_pm1(load_cifar10(root, "test"))
        return tr, tr, te
    if d == "svhn":
        tr = load_svhn(root, "train")
        te = to_pm1(load_svhn(root, "test"))
        return tr, tr, te
    if d == "celeba64":
        tr = load_image_folder_cached(osp.join(root, "celeba64_train"), 64)
        te = to_pm1(load_image_folder(osp.join(root, "celeba64_test"), 64))
        return tr, tr, te
    if d == "celebaHQ":
        tr = load_image_folder_cached(osp.join(root, "train"), 256)
        te = to_pm1(load_image_folder(osp.join(root, "test"), 256))
        return tr, tr, te
    # MNIST is the anomaly-detection workload (labels, not a gen_recon
    # split triple) — reference train_gen_recon supports svhn/cifar10/
    # celeba only (`train_gen_recon.py:58-107`); use train_anomaly_det.
    raise ValueError(
        f"unknown gen_recon dataset {d!r} (mnist is the anomaly workload: "
        "python -m damc_tpu.cli.train_anomaly_det)"
    )


def make_feature_fn(cfg: Config):
    """Returns (feature_fn, metric_name).

    metric_name is 'fid' only when the real InceptionV3 weights are on disk;
    otherwise the random-projection fallback is used and the metric is named
    'frechet_rand' so its numbers are never presented as FID (they are NOT
    comparable to published FID values)."""
    import jax

    from ..metrics.fid import make_random_feature_fn
    from ..models.inception import try_load_inception_feature_fn

    fn = try_load_inception_feature_fn()
    if fn is not None:
        return fn, "fid"
    print(
        "[damc] WARNING: InceptionV3 weights unavailable — using the "
        "random-feature Frechet metric, reported as 'frechet_rand' "
        "(NOT comparable to published FID)."
    )
    return (
        make_random_feature_fn(
            jax.random.PRNGKey(0),
            (cfg.model.image_size, cfg.model.image_size, cfg.model.nc),
        ),
        "frechet_rand",
    )
