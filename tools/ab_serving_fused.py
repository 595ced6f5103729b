"""Alternating A/B: scan vs fused-Pallas serving programs (round-5).

VERDICT r4 weak #2: serving used to forfeit both fused kernels for
determinism; the per-row counter-noise mode removed that conflict. This
measures what was being left on the table (or records the negative if the
small-batch programs are latency-bound): per-dispatch latency of the
deterministic serving programs — 'damc' (100-step amortized sample + G
decode), 'recon' (posterior init + noiseless refine + decode), 'ebm'
(60-step prior chain + decode) — with the scan and fused implementations
ALTERNATING in one process (sequential runs on this shared tunnel disagree
by >10-30%; only in-process alternation is trustworthy).

Every dispatch is fenced to completion (the serving batcher's view).

Run:  python tools/ab_serving_fused.py [--buckets 1,16] [--out artifacts/ab_serving_fused.json]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from damc_tpu.utils.profiling import force_sync  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="1,16")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--out", default="artifacts/ab_serving_fused.json")
    args = ap.parse_args()

    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.serve import build_serving_fns, serving_fused_auto
    from damc_tpu.train.state import create_state_host_init
    from damc_tpu.utils import preset

    enable_compile_cache()
    cfg = preset("cifar10")
    state, models, _ = create_state_host_init(jax.random.PRNGKey(0), cfg)
    sg = jax.lax.stop_gradient
    pq, pg, pe = sg(state.params_q), sg(state.params_g), sg(state.params_e)
    assert serving_fused_auto(models, pq, pe, cfg), (
        "fused serving should auto-enable for cifar10 on TPU"
    )

    result = {
        "what": (
            "scan vs fused serving-program latency, alternating in one "
            "process, per-dispatch fenced"
        ),
        "tool": "tools/ab_serving_fused.py",
        "date": time.strftime("%Y-%m-%d"),
        "device_kind": jax.devices()[0].device_kind,
        "reps": args.reps,
        "inner": args.inner,
        "buckets": {},
    }

    base = jax.random.PRNGKey(0)
    x_img = jax.random.uniform(
        jax.random.PRNGKey(1), (32, 32, 32, 3), minval=-1.0, maxval=1.0
    )

    for b in [int(s) for s in args.buckets.split(",") if s]:
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(b))
        xb = x_img[:b]
        fns = {}
        compile_walls = {}
        for impl, fused in (("scan", False), ("fused", True)):
            built = build_serving_fns(
                models, pq, pg, pe, cfg, recon_langevin_steps=10, fused=fused
            )
            for path, (fn, _, _) in built.items():
                jitted = jax.jit(fn)
                t0 = time.time()
                if path == "recon":
                    force_sync(jitted(keys, xb))
                else:
                    force_sync(jitted(keys))
                compile_walls[f"{impl}_{path}"] = round(time.time() - t0, 1)
                fns[(impl, path)] = jitted

        med = {}
        for path in ("damc", "recon", "ebm"):
            times = {"scan": [], "fused": []}
            for r in range(args.reps):
                for impl in ("scan", "fused"):  # alternate within the rep
                    fn = fns[(impl, path)]
                    call = (
                        (lambda: fn(keys, xb)) if path == "recon"
                        else (lambda: fn(keys))
                    )
                    force_sync(call())
                    per = []
                    for _ in range(args.inner):
                        t0 = time.perf_counter()
                        force_sync(call())
                        per.append(time.perf_counter() - t0)
                    times[impl].append(float(np.percentile(per, 50)))
            med[path] = {
                impl: round(float(np.median(ts)) * 1e3, 3)
                for impl, ts in times.items()
            }
            med[path]["fused_over_scan"] = round(
                med[path]["fused"] / med[path]["scan"], 3
            )
        result["buckets"][str(b)] = {
            "per_path_p50_ms": med,
            "compile_walls_s": compile_walls,
        }
        print(json.dumps({f"b={b}": med}), flush=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)

    print(f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()
