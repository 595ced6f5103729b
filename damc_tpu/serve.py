"""Online serving runtime: dynamic micro-batching over the jitted samplers.

The reference repo is scripts-only — it has no deployment surface. This
module provides the production path implied by `bench.py`'s serving-latency
fields: an in-process dynamic batcher (the TF-Serving/Triton
"dynamic batching" pattern) in front of the two online inference paths,

  * `sample`      — draw images via the DAMC prior (100-step amortized
                    reverse sweep + G decode, reference `MCMC.py:146-150`)
                    or the EBM prior (short-run Langevin from N(0, I),
                    `MCMC.py:119-128`);
  * `reconstruct` — posterior inference (Q(x) init + short noiseless
                    posterior Langevin + decode, `train_gen_recon.py:324-348`),

plus a dependency-free stdlib HTTP front (`make_http_server`) and a thin
CLI (`damc_tpu.cli.serve`).

TPU-shaped design decisions:

  * **Fixed compiled shapes.** Requests are coalesced and padded to a
    fixed batch bucket, so XLA never sees a fresh shape at request time.
    `warmup()` pre-compiles the buckets so the first real request doesn't
    pay a trace.
  * **Per-request determinism, independent of coalescing.** Each request
    item carries its own PRNG key (`fold_in(PRNGKey(seed), item_index)`)
    and every per-item draw derives from THAT key only — so the response
    for (seed, i) is bit-identical whether the item is served alone or
    packed into a bucket with strangers. Two ingredients: (a) per-item
    noise streams — either `vmap` of the single-item scan pipeline
    (per-item threefry keys; every backend), or, on TPU, the fused Pallas
    kernels in per-row COUNTER-noise mode (`row_seeds`: a row's
    ancestral/chain noise is a hash of its own seed, independent of batch
    composition by construction — `serving_fused_auto` decides, `fused=`
    overrides); (b) in the default `deterministic=True` mode EVERY
    dispatch pads to the single max_batch bucket — one compiled program
    per path, and a row's result in one program cannot depend on the
    other rows. (Different bucket sizes are different XLA programs whose
    fusion choices differ at the float-ulp level — measured on CPU; that
    is why per-size power-of-two buckets, `deterministic=False`, trade
    exact reproducibility for less padded compute. On TPU the small-batch
    programs are serial-step latency-bound, so the padded rows of the
    fixed bucket are close to free.) The scan and fused implementations
    draw DIFFERENT noise streams (same distribution): switching `fused`
    re-seeds the sampler, it does not perturb its statistics.
  * **One worker thread per path.** Device dispatch is serialized per
    batcher; HTTP handler threads only enqueue and wait on futures, so an
    arbitrary number of concurrent clients funnels into tight device-sized
    programs instead of queueing whole-program dispatches.
"""

from __future__ import annotations

import base64
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.amortizer import sample_q, sample_q_per_item
from .ops.langevin import (
    gaussian_posterior_energy,
    langevin_sample,
    posterior_energy,
    prior_langevin_auto,
)
from .parallel.mesh import Mesh, batch_sharding, replicated
from .utils.config import Config


def bucket_size(n: int, max_batch: int) -> int:
    """Smallest power-of-two >= n, capped at max_batch."""
    b = 1
    while b < n:
        b <<= 1
    return min(b, max_batch)


@dataclass
class BatchStats:
    """Thread-safe coalescing counters (exposed at GET /stats)."""

    requests: int = 0
    items: int = 0
    batches: int = 0
    padded_items: int = 0
    latency_ms: List[float] = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def record_batch(self, n_items: int, n_padded: int) -> None:
        with self._lock:
            self.items += n_items
            self.batches += 1
            self.padded_items += n_padded

    def record_request(self, wall_ms: float) -> None:
        with self._lock:
            self.requests += 1
            self.latency_ms.append(wall_ms)
            if len(self.latency_ms) > 4096:  # ring: keep the recent window
                del self.latency_ms[:2048]

    def snapshot(self) -> Dict[str, Any]:
        with self._lock:
            lat = np.asarray(self.latency_ms, np.float64)
            return {
                "requests": self.requests,
                "items": self.items,
                "batches": self.batches,
                "padded_items": self.padded_items,
                "mean_batch_items": (
                    round(self.items / self.batches, 3) if self.batches else None
                ),
                "latency_p50_ms": round(float(np.percentile(lat, 50)), 3)
                if lat.size
                else None,
                "latency_p99_ms": round(float(np.percentile(lat, 99)), 3)
                if lat.size
                else None,
            }


class _Shutdown:
    pass


class MicroBatcher:
    """Coalesce concurrently-submitted items into one device call.

    `run_batch(items) -> results` is called on the worker thread with
    between 1 and `max_batch` items: the worker blocks for the first item,
    then keeps gathering until `window_ms` elapses or the bucket is full —
    the standard latency/throughput trade of dynamic batching. A failed
    batch fails exactly the futures in that batch; the worker survives.
    """

    def __init__(
        self,
        run_batch: Callable[[List[Any]], Sequence[Any]],
        max_batch: int = 16,
        window_ms: float = 3.0,
        stats: Optional[BatchStats] = None,
    ):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self._run = run_batch
        self.max_batch = int(max_batch)
        self.window_s = float(window_ms) / 1e3
        self.stats = stats or BatchStats()
        self._queue: "queue.SimpleQueue" = queue.SimpleQueue()
        self._closed = False
        self._thread = threading.Thread(
            target=self._loop, name="damc-microbatcher", daemon=True
        )
        self._thread.start()

    def submit(self, item: Any) -> "_Future":
        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        fut = _Future()
        self._queue.put((item, fut))
        return fut

    def _gather(self, first) -> Tuple[List[Any], bool]:
        batch = [first]
        deadline = time.monotonic() + self.window_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if isinstance(nxt, _Shutdown):
                return batch, True
            batch.append(nxt)
        return batch, False

    def _loop(self) -> None:
        while True:
            nxt = self._queue.get()
            if isinstance(nxt, _Shutdown):
                return
            batch, shutdown = self._gather(nxt)
            items = [it for it, _ in batch]
            try:
                results = self._run(items)
                if len(results) != len(items):
                    raise RuntimeError(
                        f"run_batch returned {len(results)} results for "
                        f"{len(items)} items"
                    )
            except Exception as e:  # fail this batch only
                for _, fut in batch:
                    fut.set_exception(e)
            else:
                for (_, fut), res in zip(batch, results):
                    fut.set_result(res)
            if shutdown:
                return

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._queue.put(_Shutdown())
            self._thread.join(timeout=30)
        # Fail anything that raced past the closed check (or arrived between
        # the sentinel and thread exit) instead of leaving waiters hanging.
        while True:
            try:
                nxt = self._queue.get_nowait()
            except queue.Empty:
                break
            if not isinstance(nxt, _Shutdown):
                nxt[1].set_exception(RuntimeError("MicroBatcher closed"))


class _Future:
    """Tiny single-assignment future (threading.Event-based; the stdlib
    concurrent.futures.Future allows cancellation states we don't want)."""

    def __init__(self):
        self._event = threading.Event()
        self._value: Any = None
        self._exc: Optional[BaseException] = None

    def set_result(self, value: Any) -> None:
        self._value = value
        self._event.set()

    def set_exception(self, exc: BaseException) -> None:
        self._exc = exc
        self._event.set()

    def result(self, timeout: Optional[float] = None) -> Any:
        if not self._event.wait(timeout):
            raise TimeoutError("request timed out waiting for the batcher")
        if self._exc is not None:
            raise self._exc
        return self._value


def serving_fused_auto(models, params_q, params_e, cfg: Config) -> bool:
    """Can EVERY serving path run its fused-Pallas per-item implementation?

    Requires the TPU backend, the compact denoiser family (VMEM fit for the
    fused sweep), and — when an EBM exists — the standard 2-hidden LatentEBM
    layout (the fused chain kernel hand-codes that backward)."""
    if jax.default_backend() != "tpu":
        return False
    try:
        from .ops.pallas.fused_qsweep import denoiser_layer_params, fits_vmem

        fourier, layers = denoiser_layer_params(params_q["params"]["p"])
    except (KeyError, TypeError):
        return False
    widths = [lt[1].shape[-1] for lt in layers]
    n = models.amortizer.n_interval
    pre_x = [jnp.zeros((1, w)) for w in widths]  # fits_vmem reads widths only
    pre_t = [jnp.zeros((n, w)) for w in widths]
    if not fits_vmem(fourier, layers, pre_x, pre_t):
        return False
    if models.ebm is not None:
        p = params_e.get("params", {}) if isinstance(params_e, dict) else {}
        if set(p.keys()) != {"Dense_0", "Dense_1", "Dense_2"}:
            return False
    return True


def build_serving_fns(
    models,
    params_q,
    params_g,
    params_e,
    cfg: Config,
    recon_langevin_steps: int = 10,
    fused: bool = False,
    fused_interpret=False,
    mesh: Optional[Mesh] = None,
) -> Dict[str, Tuple[Callable, int, int]]:
    """The serving programs, keyed by path, as UNJITTED batched functions
    over already-placed (and stop_gradient'ed) params:

      'damc'  (keys)    -> images          — amortized-prior sample
      'ebm'   (keys)    -> images          — EBM-prior Langevin sample
                                             (absent when models.ebm is None)
      'recon' (keys, x) -> (x_hat, z)      — posterior reconstruction

    Values are `(fn, n_in, n_out)`. Single source of truth for BOTH the
    live `SamplerService` (which jits, optionally with mesh shardings) and
    the AOT artifact exporter (`damc_tpu.artifact`), so an exported
    artifact is the same math as the live service.

    Two implementations of the same per-request determinism contract
    (row i a pure function of keys[i] / x[i]):

      * `fused=False` — vmap-of-single over the scan kernels: per-item
        threefry keys drive every draw. Runs on every backend; this is
        what AOT artifacts export.
      * `fused=True` — per-item batched pipelines over the fused Pallas
        kernels, whose ancestral/chain noise comes from the per-row COUNTER
        stream (`row_seeds`: ops/pallas/fused_langevin._counter_normal), so
        a row is independent of batch composition by construction. Same
        distribution as the scan path, different noise stream. Requires
        `serving_fused_auto(...)` (TPU + compact family) or
        `fused_interpret` for CPU testing; `mesh` shard_maps the kernels
        over the `data` axis.
    """
    mc = cfg.mcmc
    amort, gen, ebm = models.amortizer, models.generator, models.ebm

    if fused:
        q_kw = dict(fused=True, fused_interpret=fused_interpret, mesh=mesh)

        def damc_batched(keys):
            z = sample_q_per_item(params_q, amort, keys, x=None, **q_kw)
            return gen.apply(params_g, z)

        def recon_batched(keys, x):
            ks = jax.vmap(jax.random.split)(keys)  # (B, 2, key)
            z0 = sample_q_per_item(params_q, amort, ks[:, 0], x=x, **q_kw)
            gen_fn = lambda z: gen.apply(params_g, z)
            if ebm is not None:
                energy = posterior_energy(
                    gen_fn, lambda z: ebm.apply(params_e, z), x, mc.g_llhd_sigma
                )
            else:
                energy = gaussian_posterior_energy(gen_fn, x, mc.g_llhd_sigma)
            # Noiseless refinement: no RNG, per-row independent, so the
            # batched scan keeps the contract (key below is unused noise-wise).
            z, _ = langevin_sample(
                jax.random.PRNGKey(0), z0, energy, recon_langevin_steps,
                mc.g_l_step_size, with_noise=False,
            )
            return gen.apply(params_g, z), z

        fns: Dict[str, Tuple[Callable, int, int]] = {
            "damc": (damc_batched, 1, 1),
            "recon": (recon_batched, 2, 2),
        }
        if ebm is not None:

            def ebm_batched(keys):
                ks = jax.vmap(jax.random.split)(keys)
                z0 = jax.vmap(
                    lambda k: jax.random.normal(k, (cfg.model.nz,))
                )(ks[:, 0])
                row_seeds = jax.vmap(
                    lambda k: jax.random.randint(
                        k, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32
                    )
                )(ks[:, 1])
                z, _ = prior_langevin_auto(
                    keys[0], z0, ebm, params_e, mc.e_l_steps,
                    mc.e_l_step_size, mc.e_l_with_noise, use_pallas=True,
                    row_seeds=row_seeds, mesh=mesh,
                    pallas_interpret=fused_interpret,
                )
                return gen.apply(params_g, z)

            fns["ebm"] = (ebm_batched, 1, 1)
        return fns

    def damc_single(key):
        # fused=False: per-item key => batch-composition-independent
        # results (see module docstring).
        z = sample_q(params_q, amort, key, x=None, b=1, fused=False)
        return gen.apply(params_g, z)[0]

    def recon_single(key, x):
        k_q, k_l = jax.random.split(key)
        xb = x[None]
        z0 = sample_q(params_q, amort, k_q, x=xb, fused=False)
        gen_fn = lambda z: gen.apply(params_g, z)
        if ebm is not None:
            energy = posterior_energy(
                gen_fn, lambda z: ebm.apply(params_e, z), xb, mc.g_llhd_sigma
            )
        else:
            energy = gaussian_posterior_energy(gen_fn, xb, mc.g_llhd_sigma)
        z, _ = langevin_sample(
            k_l, z0, energy, recon_langevin_steps, mc.g_l_step_size,
            with_noise=False,
        )
        return gen.apply(params_g, z)[0], z[0]

    fns = {
        "damc": (jax.vmap(damc_single), 1, 1),
        "recon": (jax.vmap(recon_single), 2, 2),
    }

    if ebm is not None:

        def ebm_single(key):
            k0, kc = jax.random.split(key)
            z0 = jax.random.normal(k0, (1, cfg.model.nz))
            z, _ = prior_langevin_auto(
                kc, z0, ebm, params_e, mc.e_l_steps, mc.e_l_step_size,
                mc.e_l_with_noise, use_pallas=False,
            )
            return gen.apply(params_g, z)[0]

        fns["ebm"] = (jax.vmap(ebm_single), 1, 1)

    return fns


class SamplerService:
    """Micro-batched serving facade over a trained DAMC state.

    Paths: 'damc' (amortized prior sample), 'ebm' (EBM-prior Langevin
    sample; absent for toy configs without an EBM), 'recon' (posterior
    reconstruction). Each path gets its own MicroBatcher + jitted
    vmap-of-single program family (one executable per batch bucket).

    `SamplerService.from_artifact(dir)` builds the same facade over
    AOT-exported programs instead of a live state (`damc_tpu.artifact`).
    """

    def __init__(
        self,
        state,
        models,
        cfg: Config,
        max_batch: int = 16,
        window_ms: float = 3.0,
        recon_langevin_steps: int = 10,
        request_timeout_s: float = 300.0,
        deterministic: bool = True,
        mesh: Optional[Mesh] = None,
        fused: Optional[bool] = None,
        fused_interpret=False,
    ):
        """`fused`: serve through the per-item fused Pallas kernels (counter
        noise — same per-request determinism contract, different noise
        stream than the scan path). None = auto: on when
        `serving_fused_auto` holds (TPU + compact model family).
        `fused_interpret` runs the kernels in interpreter mode for CPU
        tests of the exact fused programs ('plain' recommended)."""
        sg = jax.lax.stop_gradient
        params_q = sg(state.params_q)
        params_g = sg(state.params_g)
        params_e = sg(state.params_e) if models.ebm is not None else None

        if fused is None:
            fused = serving_fused_auto(models, params_q, params_e, cfg)
        self.fused = bool(fused)

        # Data-parallel serving: params replicate over the mesh once, every
        # dispatch shards its batch rows over the `data` axis (same
        # placement pattern as the eval CLIs' --use_mesh). Single-host only:
        # a serving frontend runs one process per replica group.
        if mesh is not None:
            if jax.process_count() > 1:
                raise ValueError("SamplerService is single-host only")
            n_data = mesh.shape["data"]
            if int(max_batch) % n_data:
                raise ValueError(
                    f"max_batch={max_batch} must be divisible by the mesh "
                    f"data axis ({n_data}) so every bucket shards evenly"
                )
            rep = replicated(mesh)
            params_q = jax.device_put(params_q, rep)
            params_g = jax.device_put(params_g, rep)
            if params_e is not None:
                params_e = jax.device_put(params_e, rep)

        def _jit(fn, n_in: int, n_out: int):
            if mesh is None:
                return jax.jit(fn)
            bs = batch_sharding(mesh)
            return jax.jit(
                fn,
                in_shardings=(bs,) * n_in,
                out_shardings=bs if n_out == 1 else (bs,) * n_out,
            )

        fns = {
            path: _jit(fn, n_in, n_out)
            for path, (fn, n_in, n_out) in build_serving_fns(
                models, params_q, params_g, params_e, cfg,
                recon_langevin_steps, fused=fused,
                fused_interpret=fused_interpret, mesh=mesh,
            ).items()
        }
        image_shape = (
            cfg.model.image_size, cfg.model.image_size, cfg.model.nc
        )
        self._setup(
            fns, image_shape, cfg=cfg, max_batch=max_batch,
            window_ms=window_ms, request_timeout_s=request_timeout_s,
            deterministic=deterministic, mesh=mesh,
        )

    @classmethod
    def from_artifact(
        cls,
        artifact_dir,
        window_ms: float = 3.0,
        request_timeout_s: float = 300.0,
    ) -> "SamplerService":
        """Serve from an AOT artifact (`damc_tpu.artifact`): deserialized
        pre-lowered programs with the params baked in — no model code, no
        checkpoint, no trace at startup. Artifacts carry exactly one
        compiled batch size, so the service runs in deterministic
        (single-bucket) mode with max_batch = the exported batch size."""
        from .artifact import load_serving_artifact

        fns, meta = load_serving_artifact(artifact_dir)
        svc = cls.__new__(cls)
        svc._setup(
            fns,
            tuple(meta["image_shape"]),
            cfg=None,
            max_batch=int(meta["batch_size"]),
            window_ms=window_ms,
            request_timeout_s=request_timeout_s,
            deterministic=True,
            mesh=None,
        )
        svc.artifact_meta = meta
        return svc

    def _setup(
        self,
        fns: Dict[str, Callable],
        image_shape: Tuple[int, int, int],
        cfg: Optional[Config],
        max_batch: int,
        window_ms: float,
        request_timeout_s: float,
        deterministic: bool,
        mesh: Optional[Mesh],
    ) -> None:
        self.cfg = cfg
        self.fused = getattr(self, "fused", False)
        self.max_batch = int(max_batch)
        self.deterministic = bool(deterministic)
        self.request_timeout_s = float(request_timeout_s)
        self.mesh = mesh
        self.image_shape = tuple(image_shape)
        self.artifact_meta: Optional[Dict[str, Any]] = None
        self._fns = fns
        self.stats: Dict[str, BatchStats] = {p: BatchStats() for p in fns}
        self._batchers = {
            p: MicroBatcher(
                self._make_runner(p),
                max_batch=self.max_batch,
                window_ms=window_ms,
                stats=self.stats[p],
            )
            for p in fns
        }

    @property
    def paths(self) -> Tuple[str, ...]:
        return tuple(self._fns)

    def _bucket_for(self, n: int) -> int:
        if self.deterministic:
            return self.max_batch
        if self.mesh is None:
            return bucket_size(n, self.max_batch)
        # Bucketed + mesh: buckets are multiples of the data axis so every
        # dispatch shards evenly (max_batch divisibility checked at init).
        n_data = self.mesh.shape["data"]
        return min(self.max_batch, -(-n // n_data) * n_data)

    def _make_runner(self, path: str):
        fn = self._fns[path]

        def run(items: List[Any]) -> List[Any]:
            n = len(items)
            b = self._bucket_for(n)
            pad = b - n
            # items are tuples of per-item arrays; stack each column padded
            # with copies of the last item (results of pad rows discarded).
            padded = items + [items[-1]] * pad
            stacked = tuple(
                jnp.stack([it[c] for it in padded])
                for c in range(len(items[0]))
            )
            out = fn(*stacked)
            if not isinstance(out, tuple):
                out = (out,)
            host = tuple(np.asarray(o) for o in out)
            self.stats[path].record_batch(n, pad)
            return [tuple(h[i] for h in host) for i in range(n)]

        return run

    def warmup(self, buckets: Sequence[int] = (1,)) -> None:
        """Pre-compile the given buckets (plus max_batch) for every path so
        first requests don't pay the trace+compile wall. In deterministic
        mode there is exactly one bucket (max_batch)."""
        if self.deterministic:
            sizes = [self.max_batch]
        else:
            sizes = sorted({self._bucket_for(b) for b in buckets}
                           | {self.max_batch})
        key = jax.random.PRNGKey(0)
        x = jnp.zeros(self.image_shape, jnp.float32)
        for b in sizes:
            keys = jnp.stack([key] * b)
            for path, fn in self._fns.items():
                if path == "recon":
                    jax.block_until_ready(fn(keys, jnp.stack([x] * b)))
                else:
                    jax.block_until_ready(fn(keys))

    def _item_keys(self, seed: int, n: int) -> List[jax.Array]:
        base = jax.random.PRNGKey(int(seed))
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(n))
        return [keys[i] for i in range(n)]

    def sample(
        self, n: int = 1, prior: str = "damc", seed: int = 0
    ) -> np.ndarray:
        """Draw n images (float32 [-1, 1] NHWC). Item i is a pure function
        of (seed, i): resubmitting the same request reproduces it exactly,
        regardless of what else is in flight."""
        if prior not in self._fns or prior == "recon":
            raise ValueError(
                f"unknown prior {prior!r}; available: "
                f"{sorted(p for p in self._fns if p != 'recon')}"
            )
        if not 1 <= n <= 1024:
            raise ValueError(f"n must be in [1, 1024], got {n}")
        t0 = time.monotonic()
        futs = [
            self._batchers[prior].submit((k,)) for k in self._item_keys(seed, n)
        ]
        out = np.stack([f.result(self.request_timeout_s)[0] for f in futs])
        self.stats[prior].record_request((time.monotonic() - t0) * 1e3)
        return out

    def reconstruct(
        self, images: np.ndarray, seed: int = 0
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Posterior-reconstruct a (B, H, W, C) or (H, W, C) batch in
        [-1, 1]. Returns (x_hat, z), leading dim matching the input."""
        x = np.asarray(images, np.float32)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        if x.shape[1:] != self.image_shape:
            raise ValueError(
                f"expected images shaped (B,)+{self.image_shape}, got {x.shape}"
            )
        t0 = time.monotonic()
        keys = self._item_keys(seed, len(x))
        futs = [
            self._batchers["recon"].submit((k, jnp.asarray(xi)))
            for k, xi in zip(keys, x)
        ]
        results = [f.result(self.request_timeout_s) for f in futs]
        x_hat = np.stack([r[0] for r in results])
        z = np.stack([r[1] for r in results])
        self.stats["recon"].record_request((time.monotonic() - t0) * 1e3)
        return (x_hat[0], z[0]) if squeeze else (x_hat, z)

    def stats_snapshot(self) -> Dict[str, Any]:
        return {p: s.snapshot() for p, s in self.stats.items()}

    def close(self) -> None:
        for b in self._batchers.values():
            b.close()


# --------------------------------------------------------------------------
# HTTP front (stdlib-only)
# --------------------------------------------------------------------------


def _encode_array(a: np.ndarray, encoding: str) -> Dict[str, Any]:
    if encoding == "b64":
        return {
            "shape": list(a.shape),
            "dtype": "float32",
            "data_b64": base64.b64encode(
                np.ascontiguousarray(a, np.float32).tobytes()
            ).decode("ascii"),
        }
    return {"shape": list(a.shape), "data": a.tolist()}


def _decode_image(payload: Dict[str, Any]) -> np.ndarray:
    if "image_b64" in payload:
        shape = payload.get("shape")
        if not shape:
            raise ValueError("image_b64 requires a 'shape' field")
        raw = base64.b64decode(payload["image_b64"])
        return np.frombuffer(raw, np.float32).reshape(shape).copy()
    if "image" in payload:
        return np.asarray(payload["image"], np.float32)
    raise ValueError("reconstruct wants 'image' (nested list) or 'image_b64'")


def make_http_server(
    service: SamplerService, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Bind a threading HTTP server over `service` (port 0 = ephemeral).

    Endpoints:
      GET  /healthz      {"status": "ok", "backend", "paths", "image_shape"}
      GET  /stats        per-path coalescing counters + latency percentiles
      POST /sample       {"n": 4, "prior": "damc"|"ebm", "seed": 0,
                          "encoding": "list"|"b64"}
      POST /reconstruct  {"image": [[...]] | "image_b64"+"shape", "seed": 0,
                          "encoding": "list"|"b64"}
    Call `serve_forever()` on the returned server (e.g. in a thread);
    `shutdown()` + `service.close()` to stop.
    """

    class Handler(BaseHTTPRequestHandler):
        # Quiet by default: serving logs belong to the driver, not stderr.
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _reply(self, code: int, obj: Dict[str, Any]) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                self._reply(
                    200,
                    {
                        "status": "ok",
                        "backend": jax.default_backend(),
                        "source": (
                            "artifact" if service.artifact_meta else "live"
                        ),
                        "paths": list(service.paths),
                        "image_shape": list(service.image_shape),
                        "max_batch": service.max_batch,
                        "fused": service.fused,
                    },
                )
            elif self.path == "/stats":
                self._reply(200, service.stats_snapshot())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
                encoding = payload.get("encoding", "list")
                if encoding not in ("list", "b64"):
                    raise ValueError(f"unknown encoding {encoding!r}")
                if self.path == "/sample":
                    imgs = service.sample(
                        n=int(payload.get("n", 1)),
                        prior=payload.get("prior", "damc"),
                        seed=int(payload.get("seed", 0)),
                    )
                    self._reply(
                        200, {"images": _encode_array(imgs, encoding)}
                    )
                elif self.path == "/reconstruct":
                    x = _decode_image(payload)
                    x_hat, z = service.reconstruct(
                        x, seed=int(payload.get("seed", 0))
                    )
                    self._reply(
                        200,
                        {
                            "x_hat": _encode_array(x_hat, encoding),
                            "z": _encode_array(z, encoding),
                            "mse": float(np.mean((x_hat - x) ** 2)),
                        },
                    )
                else:
                    self._reply(404, {"error": f"unknown path {self.path}"})
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # device-side failure: 500, keep serving
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)
