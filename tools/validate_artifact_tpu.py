"""TPU hardware validation of AOT serving artifacts (damc_tpu/artifact.py).

Exports the flagship CIFAR-10 serving programs (batch 16, platforms
cpu+tpu) on this box, loads them back, and checks on the REAL chip:

  1. parity: artifact outputs vs the live jitted serving fns, same keys
     (same platform + same traced program => expect bitwise or ~ulp);
  2. latency: fenced per-dispatch wall for live vs artifact programs —
     the artifact must not tax the serving path;
  3. startup: wall to `load_serving_artifact` (deserialize, no trace)
     vs building state + tracing the live programs.

Writes artifacts/artifact_tpu.json.
Run:  python tools/validate_artifact_tpu.py  (on the TPU box, idle)
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from damc_tpu.utils.profiling import force_sync  # noqa: E402

BATCH = 16
LAT_ITERS = 30


def timed_p50(fn, args, iters=LAT_ITERS):
    force_sync(fn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_sync(fn(*args))
        samples.append(time.perf_counter() - t0)
    return float(np.percentile(samples, 50)) * 1e3


def main():
    from damc_tpu.artifact import export_serving_artifact, load_serving_artifact
    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.serve import build_serving_fns
    from damc_tpu.train.state import create_state_host_init
    from damc_tpu.utils.config import preset

    enable_compile_cache()
    assert jax.devices()[0].platform != "cpu", "needs a real TPU"

    out = {"batch": BATCH, "device": jax.devices()[0].device_kind}

    t0 = time.perf_counter()
    cfg = preset("cifar10")
    state, models, _ = create_state_host_init(jax.random.PRNGKey(0), cfg)
    sg = jax.lax.stop_gradient
    live = {
        path: jax.jit(fn)
        for path, (fn, _, _) in build_serving_fns(
            models, sg(state.params_q), sg(state.params_g),
            sg(state.params_e), cfg, recon_langevin_steps=10,
        ).items()
    }
    out["live_build_wall_s"] = round(time.perf_counter() - t0, 3)

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        meta = export_serving_artifact(
            state, models, cfg, td, batch_size=BATCH,
            recon_langevin_steps=10, platforms=("cpu", "tpu"),
        )
        out["export_wall_s"] = round(time.perf_counter() - t0, 3)
        out["artifact_bytes"] = {
            p: (Path(td) / meta["files"][p]).stat().st_size
            for p in meta["paths"]
        }

        t0 = time.perf_counter()
        art, _ = load_serving_artifact(td)
        out["load_wall_s"] = round(time.perf_counter() - t0, 3)

        key = jax.random.PRNGKey(0)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(BATCH)
        )
        x = jax.random.uniform(
            jax.random.PRNGKey(1), (BATCH, 32, 32, 3), minval=-1, maxval=1
        )

        for path in meta["paths"]:
            args = (keys, x) if path == "recon" else (keys,)
            want = live[path](*args)
            got = art[path](*args)
            flat_w = jax.tree.leaves(want)
            flat_g = jax.tree.leaves(got)
            diff = max(
                float(jnp.max(jnp.abs(w - g))) for w, g in zip(flat_w, flat_g)
            )
            out[f"{path}_max_abs_diff"] = diff
            out[f"{path}_live_p50_ms"] = round(timed_p50(live[path], args), 3)
            out[f"{path}_artifact_p50_ms"] = round(timed_p50(art[path], args), 3)
            print(f"{path}: diff={diff:.3e} "
                  f"live={out[f'{path}_live_p50_ms']}ms "
                  f"artifact={out[f'{path}_artifact_p50_ms']}ms")

    worst = max(out[f"{p}_max_abs_diff"] for p in meta["paths"])
    out["ok"] = bool(worst < 1e-5)
    Path("artifacts/artifact_tpu.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    assert out["ok"], f"artifact-vs-live divergence {worst}"


if __name__ == "__main__":
    main()
