"""Hardware probe of the fused-qsweep VMEM dispatch boundary (round-3 item).

`fits_vmem()` (ops/pallas/fused_qsweep.py) gates auto-dispatch of the fused
Pallas reverse-sweep by an analytic VMEM estimate. If the estimate were
OPTIMISTIC for some width/batch combo, the kernel would OOM at runtime on a
config no test visits. This probe sweeps denoiser width (nf) upward on the
REAL TPU at deployment batch sizes until the estimate rejects, then:

  * runs the LARGEST-ACCEPTED config with the fused kernel forced on —
    it must execute and return finite values (estimate not optimistic);
  * verifies the SMALLEST-REJECTED config auto-dispatches to the scan path
    (sample_q with fused=None still succeeds);
  * optionally force-runs the rejected config's fused kernel to record
    whether the budget is conservative (an OOM here is EXPECTED and fine).

Writes a JSON record for artifacts/.
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def build(nz, nf, nxemb=1024, n_interval=100, b=128, seed=0):
    from damc_tpu.models.amortizer import DAMCAmortizer

    model = DAMCAmortizer(
        nz=nz, nxemb=nxemb, ntemb=128, nf=nf, nif=64, nc=3,
        dataset="cifar10", n_interval=n_interval,
    )
    kp, kx = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.uniform(kx, (b, 32, 32, 3), minval=-1.0, maxval=1.0)
    params = model.init(kp, x)
    return model, params, x


def vmem_verdict(model, params, x):
    """(fits, estimate_bytes) the dispatch logic would compute."""
    from damc_tpu.ops.pallas.fused_qsweep import (
        _VMEM_BUDGET_BYTES,
        denoiser_layer_params,
        estimate_vmem_bytes,
    )
    from damc_tpu.ops.diffusion import sweep_logsnr_grid

    xemb = model.apply(params, x, method="encode")
    grid, _ = sweep_logsnr_grid(model.n_interval, model.logsnr_min, model.logsnr_max)
    tables = model.apply(
        params, grid, xemb, method=lambda m, g, e: m.p.sample_tables(g, e)
    )
    fourier, layers = denoiser_layer_params(params["params"]["p"])
    est = estimate_vmem_bytes(
        fourier, layers, tables["pre_x"], tables["pre_t"], block_b=128
    )
    return est <= _VMEM_BUDGET_BYTES, int(est), int(_VMEM_BUDGET_BYTES)


def try_run(model, params, x, fused):
    """Run sample_q; returns (ok, error_string)."""
    from damc_tpu.models.amortizer import sample_q

    try:
        z = sample_q(params, model, jax.random.PRNGKey(1), x=x, fused=fused)
        z = np.asarray(z)
        if not np.all(np.isfinite(z)):
            return False, "non-finite output"
        return True, None
    except Exception as e:  # XLA OOM / Mosaic errors surface as exceptions
        return False, f"{type(e).__name__}: {str(e)[:300]}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=128)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n_interval", type=int, default=100)
    ap.add_argument("--force_rejected", action="store_true",
                    help="also force-run the fused kernel past the boundary")
    ap.add_argument("--out", default="artifacts/qsweep_boundary.json")
    args = ap.parse_args()

    from damc_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    assert jax.devices()[0].platform != "cpu", "hardware probe needs the TPU"

    rows = []
    last_accept = first_reject = None
    # nf=4 is the deployed family (~6 MB); sweep width upward to the edge.
    for nf in (4, 8, 12, 16, 20, 24, 28, 32, 40, 48, 64):
        model, params, x = build(args.nz, nf, b=args.batch, n_interval=args.n_interval)
        fits, est, budget = vmem_verdict(model, params, x)
        rows.append({"nf": nf, "fits": fits, "estimate_mb": round(est / 2**20, 2)})
        print(f"nf={nf}: estimate {est/2**20:.2f} MiB budget {budget/2**20:.0f} MiB -> "
              f"{'ACCEPT' if fits else 'reject'}", flush=True)
        if fits:
            last_accept = (nf, model, params, x)
        else:
            first_reject = (nf, model, params, x)
            break

    assert last_accept and first_reject, "sweep never crossed the boundary"

    nf_a, model_a, params_a, x_a = last_accept
    print(f"running LARGEST-ACCEPTED nf={nf_a} with fused kernel forced on...", flush=True)
    ok_a, err_a = try_run(model_a, params_a, x_a, fused=True)
    print(f"  -> {'OK' if ok_a else 'FAILED: ' + str(err_a)}", flush=True)

    nf_r, model_r, params_r, x_r = first_reject
    print(f"running SMALLEST-REJECTED nf={nf_r} with auto-dispatch (must take scan)...",
          flush=True)
    ok_r, err_r = try_run(model_r, params_r, x_r, fused=None)
    print(f"  -> {'OK' if ok_r else 'FAILED: ' + str(err_r)}", flush=True)

    forced_rejected = None
    if args.force_rejected:
        print(f"force-running REJECTED nf={nf_r} fused (OOM here is expected)...",
              flush=True)
        ok_f, err_f = try_run(model_r, params_r, x_r, fused=True)
        forced_rejected = {"ok": ok_f, "error": err_f}
        print(f"  -> {'ran anyway (budget conservative)' if ok_f else 'failed as predicted'}",
              flush=True)

    result = {
        "device_kind": jax.devices()[0].device_kind,
        "nz": args.nz, "batch": args.batch, "n_interval": args.n_interval,
        "sweep": rows,
        "largest_accepted": {"nf": nf_a, "fused_ran_ok": ok_a, "error": err_a},
        "smallest_rejected": {"nf": nf_r, "auto_dispatch_ok": ok_r, "error": err_r},
        "forced_rejected_fused": forced_rejected,
        "verdict": (
            "estimate safe: largest-accepted runs, smallest-rejected falls back"
            if ok_a and ok_r else "BOUNDARY PROBLEM - see errors"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["verdict"], indent=0), f"-> {args.out}", flush=True)
    if not (ok_a and ok_r):
        sys.exit(1)


if __name__ == "__main__":
    main()
