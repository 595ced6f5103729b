"""AOT serving artifacts (damc_tpu/artifact.py): export/load roundtrip,
parity with the live service, meta validation, CLI wiring.

Greenfield contract (the reference deploys by re-running model code on a
.pth.tar, `eval_gen_recon.py:28-60`; jax.export artifacts are the TPU-native
deployment unit)."""

from __future__ import annotations

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from damc_tpu.artifact import (
    export_serving_artifact,
    load_serving_artifact,
)
from damc_tpu.serve import SamplerService, make_http_server
from damc_tpu.train.state import create_state

from test_serve import tiny_cfg


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = tiny_cfg()
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    live = SamplerService(
        state, models, cfg, max_batch=4, window_ms=5.0,
        recon_langevin_steps=2,
    )
    art_dir = tmp_path_factory.mktemp("artifact") / "svhn_tiny"
    meta = export_serving_artifact(
        state, models, cfg, art_dir, batch_size=4,
        recon_langevin_steps=2, platforms=("cpu",),
    )
    yield cfg, state, models, live, art_dir, meta
    live.close()


def test_export_writes_selfcontained_dir(setup):
    _, _, _, _, art_dir, meta = setup
    assert (art_dir / "meta.json").is_file()
    for path in meta["paths"]:
        assert (art_dir / meta["files"][path]).stat().st_size > 0
    assert sorted(meta["paths"]) == ["damc", "ebm", "recon"]
    assert meta["batch_size"] == 4 and meta["format_version"] == 1


def test_artifact_matches_live_service_bitwise(setup):
    """The exported program IS the live program: same platform, same HLO,
    bit-identical outputs (per-request determinism carries over)."""
    _, _, _, live, art_dir, _ = setup
    svc = SamplerService.from_artifact(art_dir, window_ms=5.0)
    try:
        assert sorted(svc.paths) == sorted(live.paths)
        assert svc.image_shape == live.image_shape
        assert svc.max_batch == 4 and svc.deterministic
        for prior in ("damc", "ebm"):
            np.testing.assert_array_equal(
                svc.sample(n=3, prior=prior, seed=42),
                live.sample(n=3, prior=prior, seed=42),
            )
        rng = np.random.RandomState(0)
        x = rng.uniform(-1, 1, (2,) + live.image_shape).astype(np.float32)
        got_x, got_z = svc.reconstruct(x, seed=3)
        want_x, want_z = live.reconstruct(x, seed=3)
        np.testing.assert_array_equal(got_x, want_x)
        np.testing.assert_array_equal(got_z, want_z)
    finally:
        svc.close()


def test_artifact_service_deterministic_across_coalescing(setup):
    _, _, _, _, art_dir, _ = setup
    svc = SamplerService.from_artifact(art_dir, window_ms=30.0)
    try:
        alone = svc.sample(n=1, prior="damc", seed=42)
        out = {}

        def hit(name, seed, n):
            out[name] = svc.sample(n=n, prior="damc", seed=seed)

        threads = [
            threading.Thread(target=hit, args=("a", 42, 1)),
            threading.Thread(target=hit, args=("b", 7, 3)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        np.testing.assert_array_equal(out["a"], alone)
        np.testing.assert_array_equal(
            svc.sample(n=3, prior="damc", seed=7), out["b"]
        )
    finally:
        svc.close()


def test_meta_validation(setup, tmp_path):
    cfg, state, models, _, art_dir, _ = setup
    with pytest.raises(ValueError, match="no meta.json"):
        load_serving_artifact(tmp_path)

    # Unsupported format version.
    bad = tmp_path / "bad"
    bad.mkdir()
    meta = json.loads((art_dir / "meta.json").read_text())
    meta["format_version"] = 999
    (bad / "meta.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="format_version"):
        load_serving_artifact(bad)

    # Missing program file.
    meta = json.loads((art_dir / "meta.json").read_text())
    partial = tmp_path / "partial"
    partial.mkdir()
    (partial / "meta.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="missing program file"):
        load_serving_artifact(partial)

    # Platform mismatch: an artifact exported only for TPU refuses to load
    # on the CPU backend (cross-platform lowering works from any host).
    tpu_only = tmp_path / "tpu_only"
    export_serving_artifact(
        state, models, cfg, tpu_only, batch_size=2,
        recon_langevin_steps=2, platforms=("tpu",),
    )
    with pytest.raises(ValueError, match="platforms"):
        load_serving_artifact(tpu_only)

    # Backend alias: default_backend() says 'gpu' but export platform names
    # are cuda/rocm — a cpu,cuda artifact must not be rejected on GPU.
    meta = json.loads((art_dir / "meta.json").read_text())
    assert meta["key_shape"] == [2] and meta["key_dtype"] == "uint32"
    from unittest import mock

    import damc_tpu.artifact as artifact_mod

    gpu_meta = dict(meta, platforms=["cpu", "cuda"])
    gpu_dir = tmp_path / "gpu_alias"
    gpu_dir.mkdir()
    (gpu_dir / "meta.json").write_text(json.dumps(gpu_meta))
    for f in meta["files"].values():
        (gpu_dir / f).write_bytes((art_dir / f).read_bytes())
    with mock.patch.object(
        artifact_mod.jax, "default_backend", return_value="gpu"
    ):
        # Passes the platform gate; deserialized programs themselves were
        # lowered for cpu only, so calling them elsewhere would still fail.
        fns, _ = load_serving_artifact(gpu_dir)
    assert sorted(fns) == sorted(meta["paths"])

    # PRNG key-layout mismatch (e.g. rbg-impl serving box) fails loudly
    # with a clear message instead of an opaque spec shape error.
    rbg = tmp_path / "rbg"
    rbg.mkdir()
    rbg_meta = dict(meta, prng_impl="rbg", key_shape=[4])
    (rbg / "meta.json").write_text(json.dumps(rbg_meta))
    with pytest.raises(ValueError, match="PRNG impl"):
        load_serving_artifact(rbg)


def test_cli_export_then_http_serve_from_artifact(setup, tmp_path):
    """End-to-end: cli/serve --export_artifact writes a dir; an HTTP server
    over from_artifact() answers /healthz with source=artifact and serves
    /sample."""
    from damc_tpu.cli.serve import main as serve_main

    art = tmp_path / "cli_art"
    serve_main([
        "--dataset", "svhn", "--nz", "8", "--ngf", "8", "--nif", "8",
        "--nxemb", "16", "--ntemb", "16", "--n_interval", "2",
        "--g_l_steps", "2", "--e_l_steps", "2",
        "--max_batch", "2", "--recon_langevin_steps", "2",
        "--artifact_platforms", "cpu",
        "--export_artifact", str(art),
    ])
    svc = SamplerService.from_artifact(art, window_ms=5.0)
    server = make_http_server(svc, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    try:
        with urllib.request.urlopen(
            f"http://{host}:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["source"] == "artifact"
        req = urllib.request.Request(
            f"http://{host}:{port}/sample",
            data=json.dumps({"n": 2, "prior": "damc", "seed": 1}).encode(),
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        assert np.asarray(body["images"]["data"]).shape == (
            (2,) + svc.image_shape
        )
    finally:
        server.shutdown()
        thread.join(timeout=10)
        svc.close()


def test_export_artifact_and_artifact_flags_exclusive():
    from damc_tpu.cli.serve import main as serve_main

    with pytest.raises(SystemExit, match="exclusive"):
        serve_main([
            "--artifact", "x", "--export_artifact", "y",
        ])
