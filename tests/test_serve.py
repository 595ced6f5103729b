"""Serving runtime: micro-batching, per-request determinism, HTTP front.

Covers damc_tpu/serve.py — the dynamic-batching serving path (the
reference has no serving surface; SURVEY §2 lists none, so these are
greenfield-contract tests like the parallel layer's)."""

from __future__ import annotations

import dataclasses
import json
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest

from damc_tpu.serve import (
    BatchStats,
    MicroBatcher,
    SamplerService,
    bucket_size,
    make_http_server,
)
from damc_tpu.train.state import create_state
from damc_tpu.utils.config import preset


def tiny_cfg():
    cfg = preset("svhn")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=8
        ),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
    )


@pytest.fixture(scope="module")
def service():
    cfg = tiny_cfg()
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    svc = SamplerService(
        state, models, cfg, max_batch=4, window_ms=30.0,
        recon_langevin_steps=2,
    )
    svc.warmup()
    yield svc
    svc.close()


def test_bucket_size():
    assert [bucket_size(n, 16) for n in (1, 2, 3, 4, 5, 9, 16, 40)] == [
        1, 2, 4, 4, 8, 16, 16, 16,
    ]


def test_microbatcher_coalesces_and_matches_serial():
    calls = []

    def run(items):
        calls.append(len(items))
        return [x * 2 for x in items]

    mb = MicroBatcher(run, max_batch=8, window_ms=100.0)
    try:
        futs = [mb.submit(i) for i in range(8)]
        assert [f.result(10.0) for f in futs] == [2 * i for i in range(8)]
        # All 8 were in flight within one window: strictly fewer device
        # calls than items proves coalescing happened.
        assert sum(calls) == 8 and len(calls) < 8
    finally:
        mb.close()


def test_microbatcher_batch_failure_isolated():
    def run(items):
        if any(x < 0 for x in items):
            raise ValueError("bad batch")
        return items

    mb = MicroBatcher(run, max_batch=2, window_ms=1.0)
    try:
        bad = mb.submit(-1)
        with pytest.raises(ValueError, match="bad batch"):
            bad.result(10.0)
        # The worker survives a failed batch.
        assert mb.submit(5).result(10.0) == 5
    finally:
        mb.close()


def test_microbatcher_close_fails_straggler():
    mb = MicroBatcher(lambda items: items, max_batch=2, window_ms=1.0)
    assert mb.submit(1).result(10.0) == 1
    mb.close()
    with pytest.raises(RuntimeError):
        mb.submit(2)


def test_sample_shapes_and_range(service):
    imgs = service.sample(n=3, prior="damc", seed=1)
    assert imgs.shape == (3,) + service.image_shape
    assert np.all(np.abs(imgs) <= 1.0)  # generator ends in tanh
    ebm = service.sample(n=2, prior="ebm", seed=1)
    assert ebm.shape == (2,) + service.image_shape


def test_sample_deterministic_vs_coalescing(service):
    """Item i of a seed-s request is identical no matter how requests are
    batched together — the serving-correctness contract that justifies the
    vmap-of-singles design (damc_tpu/serve.py module docstring)."""
    alone = service.sample(n=1, prior="damc", seed=42)

    # The same (seed=42, i=0) item submitted concurrently with strangers.
    out = {}

    def hit(name, seed, n):
        out[name] = service.sample(n=n, prior="damc", seed=seed)

    threads = [
        threading.Thread(target=hit, args=("a", 42, 1)),
        threading.Thread(target=hit, args=("b", 7, 3)),
        threading.Thread(target=hit, args=("c", 99, 2)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    np.testing.assert_array_equal(out["a"], alone)
    # A multi-item request's item i equals a fresh request's item i.
    np.testing.assert_array_equal(
        service.sample(n=3, prior="damc", seed=7), out["b"]
    )


def test_reconstruct_roundtrip(service):
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2,) + service.image_shape).astype(np.float32)
    x_hat, z = service.reconstruct(x, seed=3)
    assert x_hat.shape == x.shape
    assert z.shape == (2, service.cfg.model.nz)
    # Single-image convenience shape.
    x1_hat, z1 = service.reconstruct(x[0], seed=3)
    np.testing.assert_array_equal(x1_hat, x_hat[0])
    np.testing.assert_array_equal(z1, z[0])


def test_sample_validates_inputs(service):
    with pytest.raises(ValueError, match="unknown prior"):
        service.sample(n=1, prior="recon")
    with pytest.raises(ValueError, match="n must be"):
        service.sample(n=0)
    with pytest.raises(ValueError, match="expected images"):
        service.reconstruct(np.zeros((2, 3, 3, 1), np.float32))


def test_stats_counters(service):
    service.sample(n=4, prior="damc", seed=5)
    snap = service.stats_snapshot()
    assert snap["damc"]["items"] >= 4
    assert snap["damc"]["batches"] >= 1
    assert snap["damc"]["latency_p50_ms"] is not None


@pytest.fixture(scope="module")
def http_endpoint(service):
    server = make_http_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}"
    server.shutdown()
    thread.join(timeout=10)


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_healthz_and_stats(http_endpoint):
    with urllib.request.urlopen(http_endpoint + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert "damc" in health["paths"] and "recon" in health["paths"]
    with urllib.request.urlopen(http_endpoint + "/stats", timeout=30) as r:
        assert "damc" in json.loads(r.read())


def test_http_sample_list_and_b64_agree(http_endpoint, service):
    code, body = _post(
        http_endpoint + "/sample", {"n": 2, "prior": "damc", "seed": 11}
    )
    assert code == 200
    imgs = np.asarray(body["images"]["data"], np.float32)
    assert imgs.shape == (2,) + service.image_shape

    code, body64 = _post(
        http_endpoint + "/sample",
        {"n": 2, "prior": "damc", "seed": 11, "encoding": "b64"},
    )
    assert code == 200
    import base64

    raw = np.frombuffer(
        base64.b64decode(body64["images"]["data_b64"]), np.float32
    ).reshape(body64["images"]["shape"])
    np.testing.assert_array_equal(raw, imgs)
    # And the HTTP path returns exactly what the in-process API returns.
    np.testing.assert_array_equal(
        imgs, service.sample(n=2, prior="damc", seed=11)
    )


def test_http_reconstruct_and_errors(http_endpoint, service):
    x = np.zeros(service.image_shape, np.float32)
    code, body = _post(
        http_endpoint + "/reconstruct", {"image": x.tolist(), "seed": 2}
    )
    assert code == 200
    assert np.asarray(body["x_hat"]["data"]).shape == service.image_shape
    assert isinstance(body["mse"], float)

    code, body = _post(http_endpoint + "/sample", {"prior": "nope"})
    assert code == 400 and "unknown prior" in body["error"]
    code, body = _post(http_endpoint + "/reconstruct", {"seed": 1})
    assert code == 400
    code, body = _post(http_endpoint + "/nope", {})
    assert code == 404


def test_bucketed_mode_shapes_close_to_deterministic(service):
    """deterministic=False trades bit-exactness for smaller padded
    dispatches; results still agree to float tolerance with the
    deterministic service (same math, different XLA programs)."""
    cfg = tiny_cfg()
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    svc = SamplerService(
        state, models, cfg, max_batch=4, window_ms=1.0,
        recon_langevin_steps=2, deterministic=False,
    )
    try:
        got = svc.sample(n=3, prior="damc", seed=42)
        want = service.sample(n=3, prior="damc", seed=42)
        np.testing.assert_allclose(got, want, atol=1e-5)
        # The n=3 request padded to bucket 4: one batch, one padded row.
        snap = svc.stats_snapshot()["damc"]
        assert snap["items"] == 3 and snap["padded_items"] == 1
    finally:
        svc.close()


def test_mesh_sharded_service(service):
    """DP serving: batch rows shard over the 8-virtual-device data axis;
    results agree with the unmeshed service to float tolerance (different
    XLA partitioning => ulp-level variation), and the meshed service is
    itself deterministic across coalescing (one fixed bucket program)."""
    from damc_tpu.parallel import make_mesh

    cfg = tiny_cfg()
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh()
    svc = SamplerService(
        state, models, cfg, max_batch=8, window_ms=5.0,
        recon_langevin_steps=2, mesh=mesh,
    )
    try:
        got = svc.sample(n=5, prior="damc", seed=42)
        assert got.shape == (5,) + svc.image_shape
        np.testing.assert_allclose(
            got[:1], service.sample(n=1, prior="damc", seed=42), atol=1e-5
        )
        np.testing.assert_array_equal(
            got, svc.sample(n=5, prior="damc", seed=42)
        )
        x = np.zeros((3,) + svc.image_shape, np.float32)
        x_hat, z = svc.reconstruct(x, seed=1)
        assert x_hat.shape == x.shape and z.shape == (3, cfg.model.nz)
    finally:
        svc.close()

    with pytest.raises(ValueError, match="divisible"):
        SamplerService(state, models, cfg, max_batch=6, mesh=mesh)


@pytest.fixture(scope="module")
def fused_service():
    """The fused-Pallas serving implementation (per-row counter noise),
    forced on CPU through the plain Pallas interpreter — the EXACT per-item
    programs a TPU deployment runs (round-5; VERDICT r4 #3)."""
    cfg = tiny_cfg()
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    svc = SamplerService(
        state, models, cfg, max_batch=4, window_ms=30.0,
        recon_langevin_steps=2, fused=True, fused_interpret="plain",
    )
    svc.warmup()
    yield svc
    svc.close()


def test_fused_auto_is_off_on_cpu():
    """serving_fused_auto requires the TPU backend — on CPU the default
    service must transparently select the scan implementation."""
    cfg = tiny_cfg()
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    svc = SamplerService(
        state, models, cfg, max_batch=2, recon_langevin_steps=2
    )
    try:
        assert svc.fused is False
    finally:
        svc.close()


def test_fused_service_paths_and_shapes(fused_service):
    assert fused_service.fused is True
    imgs = fused_service.sample(n=3, prior="damc", seed=1)
    assert imgs.shape == (3,) + fused_service.image_shape
    assert np.all(np.abs(imgs) <= 1.0)
    ebm = fused_service.sample(n=2, prior="ebm", seed=1)
    assert ebm.shape == (2,) + fused_service.image_shape
    assert np.all(np.isfinite(ebm))


def test_fused_sample_deterministic_vs_coalescing(fused_service):
    """The determinism contract with the fused kernels ON: item (seed, i)
    is bit-identical alone vs coalesced with strangers — the counter-noise
    mode makes a row's noise a pure function of its own seed."""
    alone = fused_service.sample(n=1, prior="damc", seed=42)

    out = {}

    def hit(name, seed, n, prior="damc"):
        out[name] = fused_service.sample(n=n, prior=prior, seed=seed)

    threads = [
        threading.Thread(target=hit, args=("a", 42, 1)),
        threading.Thread(target=hit, args=("b", 7, 3)),
        threading.Thread(target=hit, args=("c", 99, 2, "ebm")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    np.testing.assert_array_equal(out["a"], alone)
    np.testing.assert_array_equal(
        fused_service.sample(n=3, prior="damc", seed=7), out["b"]
    )
    np.testing.assert_array_equal(
        fused_service.sample(n=2, prior="ebm", seed=99), out["c"]
    )


def test_fused_reconstruct_deterministic(fused_service):
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2,) + fused_service.image_shape).astype(np.float32)
    x_hat, z = fused_service.reconstruct(x, seed=3)
    assert x_hat.shape == x.shape and np.all(np.isfinite(x_hat))
    x_hat2, z2 = fused_service.reconstruct(x, seed=3)
    np.testing.assert_array_equal(x_hat, x_hat2)
    np.testing.assert_array_equal(z, z2)


def test_serving_fused_auto_gate_logic(monkeypatch):
    """serving_fused_auto must reject exactly the configurations the fused
    kernels cannot serve: non-TPU backends, VMEM-overflowing denoiser
    families, and non-standard EBM param layouts."""
    import jax

    import damc_tpu.serve as serve_mod

    cfg = tiny_cfg()
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    pq, pe = state.params_q, state.params_e

    # CPU backend: off.
    assert serve_mod.serving_fused_auto(models, pq, pe, cfg) is False

    # Pretend-TPU: the compact family passes every remaining check.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert serve_mod.serving_fused_auto(models, pq, pe, cfg) is True

    # Non-standard EBM layout (extra layer name): off.
    bad_pe = {"params": dict(pe["params"], Dense_9=list(pe["params"].values())[0])}
    assert serve_mod.serving_fused_auto(models, pq, bad_pe, cfg) is False

    # VMEM overflow: force the fit check to fail.
    import damc_tpu.ops.pallas.fused_qsweep as qs

    monkeypatch.setattr(qs, "fits_vmem", lambda *a, **k: False)
    assert serve_mod.serving_fused_auto(models, pq, pe, cfg) is False


def test_batchstats_ring_bounded():
    s = BatchStats()
    for i in range(5000):
        s.record_request(1.0)
    assert len(s.latency_ms) <= 4096
    assert s.snapshot()["requests"] == 5000
