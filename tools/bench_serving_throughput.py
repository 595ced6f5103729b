"""Serving throughput-vs-latency on hardware: does dynamic batching pay?

Closed-loop load test of `damc_tpu.serve.SamplerService` on the real chip:
C concurrent clients each issue sequential single-sample requests
(`/sample n=1`, DAMC prior) for a fixed wall window; sweep C. Records
achieved QPS, request p50/p99, and the mean coalesced batch size per C —
the classic dynamic-batching curve (throughput should scale with C while
p99 stays bounded, because on TPU the 100-step sweep program is
serial-latency-bound: a 16-row batch costs barely more wall than 1 row).

Also records, for context:
  * the no-batcher sequential baseline (direct jitted call, batch 1,
    fenced) — what a naive deployment without coalescing achieves;
  * one bucketed-mode (deterministic=False) point at C=1: the padding
    cost deterministic mode pays at low load.

Single-process, alternating nothing: each C-level is measured in its own
window inside ONE process (shared-tenancy drift applies across windows;
the qualitative shape — QPS scaling with C — is far larger than drift).

Run:  python tools/bench_serving_throughput.py [--out artifacts/serving_throughput.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_level(service, prior: str, n_clients: int, seconds: float):
    """Closed-loop: n_clients threads issue back-to-back n=1 requests."""
    stats_before = service.stats_snapshot()[prior]
    latencies = []
    lat_lock = threading.Lock()
    stop = threading.Event()
    done = [0]

    def client(cid: int):
        req = 0
        while not stop.is_set():
            t0 = time.perf_counter()
            service.sample(n=1, prior=prior, seed=cid * 100003 + req)
            dt = time.perf_counter() - t0
            with lat_lock:
                latencies.append(dt)
                done[0] += 1
            req += 1

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(n_clients)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats_after = service.stats_snapshot()[prior]
    lat = np.asarray(latencies)
    n_batches = stats_after["batches"] - stats_before["batches"]
    n_items = stats_after["items"] - stats_before["items"]
    return {
        "clients": n_clients,
        "requests": int(done[0]),
        "wall_s": round(wall, 3),
        "qps": round(done[0] / wall, 2),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
        "mean_batch_items": round(n_items / n_batches, 2) if n_batches else None,
        "device_batches": n_batches,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/serving_throughput.json")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--window_ms", type=float, default=2.0)
    ap.add_argument(
        "--clients", type=int, nargs="+", default=[1, 2, 4, 8, 16, 32]
    )
    args = ap.parse_args()
    if not os.path.isabs(args.out) and os.sep not in args.out:
        args.out = os.path.join("artifacts", args.out)

    import jax

    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.serve import SamplerService
    from damc_tpu.train.state import create_state_host_init
    from damc_tpu.utils.config import preset
    from damc_tpu.utils.profiling import force_sync

    enable_compile_cache()
    cfg = preset("cifar10")
    state, models, _ = create_state_host_init(jax.random.PRNGKey(0), cfg)

    service = SamplerService(
        state, models, cfg, max_batch=args.max_batch,
        window_ms=args.window_ms,
    )
    print(f"[serving-bench] warmup (compiling bucket {args.max_batch})...")
    service.warmup()

    # No-batcher baseline: the direct b=1 jitted scan-path program, fenced
    # per request (same math the service runs, minus coalescing).
    from damc_tpu.models.amortizer import sample_q

    direct = jax.jit(
        lambda k: models.generator.apply(
            state.params_g,
            sample_q(state.params_q, models.amortizer, k, x=None, b=1,
                     fused=False),
        )
    )
    force_sync(direct(jax.random.PRNGKey(0)))
    t, n = time.perf_counter(), 0
    walls = []
    while time.perf_counter() - t < min(args.seconds, 10.0):
        t0 = time.perf_counter()
        force_sync(direct(jax.random.PRNGKey(n)))
        walls.append(time.perf_counter() - t0)
        n += 1
    baseline = {
        "qps": round(n / sum(walls), 2),
        "p50_ms": round(float(np.percentile(walls, 50)) * 1e3, 2),
        "p99_ms": round(float(np.percentile(walls, 99)) * 1e3, 2),
    }
    print(f"[serving-bench] sequential no-batcher baseline: {baseline}")

    levels = []
    for c in args.clients:
        lvl = run_level(service, "damc", c, args.seconds)
        levels.append(lvl)
        print(f"[serving-bench] C={c}: {lvl}")
    service.close()

    # Bucketed-mode point: what deterministic-mode padding costs at C=1.
    svc_bucketed = SamplerService(
        state, models, cfg, max_batch=args.max_batch,
        window_ms=args.window_ms, deterministic=False,
    )
    svc_bucketed.warmup([1])
    bucketed_c1 = run_level(svc_bucketed, "damc", 1, min(args.seconds, 10.0))
    print(f"[serving-bench] bucketed-mode C=1: {bucketed_c1}")
    svc_bucketed.close()

    out = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0].device_kind),
        "config": {
            "preset": "cifar10",
            "max_batch": args.max_batch,
            "window_ms": args.window_ms,
            "seconds_per_level": args.seconds,
            "path": "damc prior (100-step scan sweep + G decode, "
                    "vmap-of-singles, deterministic mode)",
        },
        "sequential_no_batcher_b1": baseline,
        "levels": levels,
        "bucketed_mode_c1": bucketed_c1,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[serving-bench] wrote {args.out}")


if __name__ == "__main__":
    main()
