"""CLI: serve a trained DAMC checkpoint over HTTP with dynamic batching.

The reference repo has no serving surface (scripts only); this is the
online-deployment path for the two inference modes its eval scripts imply —
prior sampling (`MCMC.py:119-150`) and posterior reconstruction
(`train_gen_recon.py:324-348`) — fronted by the micro-batching runtime in
`damc_tpu.serve` (fixed compiled batch buckets, per-request determinism).

    python -m damc_tpu.cli.serve --dataset cifar10 \
        --ckpt_dir logs/cifar10/<run>/ckpt --ckpt_name best --port 8787

    curl -s localhost:8787/healthz
    curl -s -X POST localhost:8787/sample \
        -d '{"n": 4, "prior": "damc", "seed": 7}'

Without --ckpt_dir it serves a RANDOM-INIT model (loudly) — useful for
smoke-testing a deployment before training finishes.
"""

from __future__ import annotations

import argparse

from .common import add_common_flags, config_from_args


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_flags(p)
    p.add_argument("--ckpt_dir", type=str, default=None)
    p.add_argument("--ckpt_name", type=str, default="best")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument(
        "--max_batch", type=int, default=16,
        help="dynamic-batching bucket cap (compiled buckets are the powers "
        "of two up to this)",
    )
    p.add_argument(
        "--window_ms", type=float, default=3.0,
        help="coalescing window: how long the batcher waits for more "
        "requests before dispatching a partial bucket",
    )
    p.add_argument(
        "--bucketed", action="store_true",
        help="power-of-two batch buckets instead of the single fixed "
        "bucket: less padded compute at low load, but responses may vary "
        "at the float-ulp level with batch composition (deterministic "
        "mode is the default)",
    )
    p.add_argument(
        "--fused", choices=("auto", "on", "off"), default="auto",
        help="serve through the fused Pallas kernels in per-row counter-"
        "noise mode (same per-request determinism contract as the scan "
        "path, different noise stream). auto = on when on TPU with the "
        "compact model family (serving_fused_auto)",
    )
    p.add_argument(
        "--recon_langevin_steps", type=int, default=None,
        help="noiseless posterior-Langevin refinement steps on /reconstruct "
        "(reference train-eval protocol: 10 = the default; anomaly eval: 5)",
    )
    p.add_argument(
        "--artifact", type=str, default=None,
        help="serve from an AOT artifact directory (damc_tpu.artifact) "
        "instead of building models: pre-lowered programs with params "
        "baked in; dataset/arch/ckpt/batching flags are ignored, as are "
        "--recon_langevin_steps and --bucketed (the Langevin step count "
        "and the single batch bucket are baked into the exported program)",
    )
    p.add_argument(
        "--export_artifact", type=str, default=None,
        help="write an AOT serving artifact for the (--ckpt_dir) model to "
        "this directory and exit (batch size = --max_batch)",
    )
    p.add_argument(
        "--artifact_platforms", type=str, default="cpu,tpu",
        help="comma-separated jax.export platforms for --export_artifact",
    )
    args = p.parse_args(argv)
    if args.multihost:
        raise SystemExit("serving is single-process; --multihost is invalid")
    if args.artifact and args.export_artifact:
        raise SystemExit("--artifact and --export_artifact are exclusive")

    from .common import enable_compile_cache

    enable_compile_cache()

    import jax

    from ..serve import SamplerService, make_http_server

    if args.artifact:
        for flag, is_set in (
            ("--recon_langevin_steps", args.recon_langevin_steps is not None),
            ("--bucketed", args.bucketed),
            ("--fused", args.fused != "auto"),
        ):
            if is_set:
                print(
                    f"[damc] WARNING: {flag} is ignored with --artifact "
                    "(baked into the exported program)"
                )
        service = SamplerService.from_artifact(
            args.artifact, window_ms=args.window_ms
        )
        meta = service.artifact_meta
        print(
            f"[damc] serving AOT artifact {args.artifact} "
            f"(dataset={meta['dataset']}, step={meta['trained_step']}, "
            f"batch={meta['batch_size']}, platforms={meta['platforms']})"
        )
    else:
        cfg = config_from_args(args)

        from ..train.state import create_state
        from ..utils.checkpoint import restore_checkpoint

        state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
        if args.ckpt_dir:
            state = restore_checkpoint(args.ckpt_dir, args.ckpt_name, state)
            print(
                f"[damc] serving step-{int(state.step)} checkpoint from "
                f"{args.ckpt_dir}/{args.ckpt_name}"
            )
        else:
            print(
                "[damc] WARNING: no --ckpt_dir — serving a RANDOM-INIT model "
                "(smoke-test mode)"
            )

        if args.export_artifact:
            from ..artifact import export_serving_artifact

            meta = export_serving_artifact(
                state, models, cfg, args.export_artifact,
                batch_size=args.max_batch,
                recon_langevin_steps=(
                    10 if args.recon_langevin_steps is None
                    else args.recon_langevin_steps
                ),
                platforms=tuple(
                    s for s in args.artifact_platforms.split(",") if s
                ),
            )
            print(
                f"[damc] wrote serving artifact to {args.export_artifact}: "
                f"paths={meta['paths']}, batch={meta['batch_size']}, "
                f"platforms={meta['platforms']}"
            )
            return

        mesh = None
        if args.use_mesh and len(jax.devices()) > 1:
            from ..parallel import make_mesh

            mesh = make_mesh()
            print(
                f"[damc] data-parallel serving over "
                f"{mesh.shape['data']} devices"
            )

        service = SamplerService(
            state, models, cfg,
            max_batch=args.max_batch,
            window_ms=args.window_ms,
            recon_langevin_steps=(
                10 if args.recon_langevin_steps is None
                else args.recon_langevin_steps
            ),
            deterministic=not args.bucketed,
            mesh=mesh,
            fused={"auto": None, "on": True, "off": False}[args.fused],
        )
        print(
            f"[damc] serving kernels: "
            f"{'fused Pallas (per-row counter noise)' if service.fused else 'lax.scan'}"
        )
    print("[damc] warming up (compiling serving buckets)...")
    service.warmup()
    server = make_http_server(service, args.host, args.port)
    host, port = server.server_address[:2]
    print(
        f"[damc] serving {sorted(service.paths)} on http://{host}:{port} "
        f"(max_batch={service.max_batch}, window={args.window_ms}ms, "
        f"backend={jax.default_backend()})"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("[damc] shutting down")
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
