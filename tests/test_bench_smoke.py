"""bench.py smoke test: the driver's gate artifact must not rot.

The driver runs `python bench.py` on real TPU at the end of every round and
records the JSON it prints; nothing else in the suite imports bench.py, so
an import error or a broken field would only surface there. This smoke test
runs the full `collect()` pipeline on CPU with a tiny config and dialed-down
timing repeats and asserts the JSON contract (keys present, values finite
and positive). Throughput NUMBERS are meaningless on CPU — only structure is
asserted.

Round-4 output protocol (the r03 bench timed out before printing anything,
rc=124): bench.py now prints the primary JSON line immediately after the
first measurement and re-prints a cumulative superset line after every
completed section, time-boxing sections against DAMC_BENCH_BUDGET_S. The
tests below pin all three properties: every printed line is valid JSON
carrying the primary fields, the last line is the full record, and an
exhausted budget skips sections with a note instead of running over.
"""

import dataclasses
import json
import os
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PRIMARY_FIELDS = ("metric", "value", "unit", "vs_baseline", "backend")


def tiny_cfg():
    from damc_tpu.utils.config import preset

    cfg = preset("cifar10")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, nz=16, ngf=8, nif=8, ndf=32, nxemb=24, ntemb=8
        ),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=6),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=3, e_l_steps=4),
    )


def dial_down(monkeypatch, bench):
    monkeypatch.setattr(bench, "TRAIN_CHAINS", 16)
    monkeypatch.setattr(bench, "TRAIN_STEPS", 5)
    monkeypatch.setattr(bench, "ROUNDS", 2)
    monkeypatch.setattr(bench, "TIMED_ITERS", 1)
    monkeypatch.setattr(bench, "KERNEL_TIMED_ITERS", 1)
    monkeypatch.setattr(bench, "REPEATS", 1)
    monkeypatch.setattr(bench, "LATENCY_ITERS", 2)


def test_bench_collect_contract(monkeypatch):
    import bench

    dial_down(monkeypatch, bench)
    cfg = tiny_cfg()
    from damc_tpu.train import create_state

    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    emitted = []
    payload = bench.collect(
        cfg, state, models, B=8, fid_samples=1000, fid_batch=100,
        emit=emitted.append,
    )

    json.dumps(payload)  # must be serializable
    required = [
        *PRIMARY_FIELDS,
        "kernel_impl",
        "kernel_scan_chain_steps_per_sec",
        "kernel_pallas_chain_steps_per_sec",
        "reverse_sweep_denoiser_evals_per_sec",
        "sampling_phase_chain_steps_per_sec",
        "sampling_phase_vs_baseline",
        "sampling_phase_analytic_flops",
        "sampling_phase_wall_s",
        "sampling_phase_achieved_tflops",
        "fid_gen_1k_damc_prior_wall_s",
        "fid_gen_damc_prior_samples_per_sec",
        "fid_gen_1k_ebm_prior_wall_s",
        "fid_gen_ebm_prior_samples_per_sec",
        "serving_damc_sample_b1_p50_ms",
        "serving_damc_sample_b1_p99_ms",
        "serving_recon_b1_p50_ms",
        "serving_recon_b1_p99_ms",
    ]
    for k in required:
        assert k in payload, f"bench JSON lost field {k!r}"
    assert payload["metric"] == "prior_langevin_chain_steps_per_sec"
    numeric = [
        k for k in required
        if k not in ("metric", "unit", "backend", "kernel_impl")
    ]
    for k in numeric:
        v = payload[k]
        assert np.isfinite(v), f"field {k!r} = {v!r}"
        if "vs_baseline" not in k:
            # Ratios vs the TPU-scale A6000 floors legitimately round to
            # 0.00 on the CPU backend; absolute fields must be positive.
            assert v > 0, f"field {k!r} = {v!r}"
    # mfu field exists; it is None off-TPU (unknown peak) and float on TPU.
    assert "sampling_phase_mfu_vs_bf16_peak" in payload
    # With no budget, nothing is skipped and every section ran.
    assert payload["sections_skipped"] == []
    assert set(payload["section_walls_s"]) == {
        "kernel_scan", "phase", "kernel_pallas", "sweep", "fid_gen",
        "serving",
    }
    # Cumulative emission: primary line first, superset lines after, the
    # primary fields never change across emissions.
    assert len(emitted) == 6
    for line in emitted:
        for k in PRIMARY_FIELDS:
            assert line[k] == payload[k]


def test_bench_budget_exhausted_still_emits_primary(monkeypatch):
    """A budget too small for any secondary section must still produce the
    primary metric immediately, and list every skipped section — this is
    the exact guarantee that makes the driver's capture kill-proof."""
    import bench

    dial_down(monkeypatch, bench)
    cfg = tiny_cfg()
    from damc_tpu.train import create_state

    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    emitted = []
    import time

    payload = bench.collect(
        cfg, state, models, B=8, fid_samples=1000, fid_batch=100,
        budget_s=0.0, t_start=time.monotonic(), emit=emitted.append,
    )
    for k in PRIMARY_FIELDS:
        assert k in payload
    assert payload["value"] > 0
    # phase is required (MFU fields are round-gate material) and runs even
    # with the budget exhausted; everything after it skips with a note.
    assert "sampling_phase_mfu_vs_bf16_peak" in payload
    skipped = {s["section"] for s in payload["sections_skipped"]}
    assert skipped == {"kernel_pallas", "sweep", "fid_gen", "serving"}
    for s in payload["sections_skipped"]:
        assert "budget" in s["reason"]
    # The very first emission (what survives a mid-run kill) already
    # carries the gate metric.
    assert emitted[0]["metric"] == "prior_langevin_chain_steps_per_sec"
    assert emitted[0]["value"] == payload["value"]


@pytest.mark.slow
def test_bench_main_prints_parseable_json_lines(tmp_path, monkeypatch):
    """main() end-to-end — exactly what the driver invokes, minus the TPU
    backend. Full CIFAR sizes are minutes-per-program on a 1-core CPU, so
    the preset is patched down; main's own wiring (compile cache, budget
    env, state construction, cumulative printing) runs unmodified."""
    import bench

    # main() calls enable_compile_cache(), which jax.config.update()s the
    # cache dir to ~/.cache/damc and the min-compile-time floor to 2.0s —
    # with no restore, that would defeat the repo-local .jax_cache (0.0s
    # floor) conftest set up for every test compiled after this one.
    import damc_tpu.cli.common as cli_common

    monkeypatch.setattr(cli_common, "enable_compile_cache", lambda: None)
    # The budget assertion below reads the real environment through
    # bench.main(); an exported DAMC_BENCH_BUDGET_S (the documented driver
    # knob) would fail it spuriously (r4 advisor finding).
    monkeypatch.delenv("DAMC_BENCH_BUDGET_S", raising=False)
    dial_down(monkeypatch, bench)
    monkeypatch.setattr(bench, "preset", lambda name: tiny_cfg())
    orig_collect = bench.collect
    monkeypatch.setattr(
        bench, "collect",
        lambda cfg, state, models, **kw: orig_collect(
            cfg, state, models, B=8, fid_samples=1000, fid_batch=100, **kw
        ),
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().strip().splitlines() if ln.strip()]
    assert len(lines) >= 2, f"expected primary + cumulative lines, got {lines}"
    payloads = [json.loads(ln) for ln in lines]  # every line must parse
    for p in payloads:
        assert p["metric"] == "prior_langevin_chain_steps_per_sec"
        assert p["value"] > 0
    # The last (richest) line has the serving fields; the first has the
    # budget read from the env (driver default).
    assert payloads[0]["budget_s"] == bench.DEFAULT_BUDGET_S
    assert "serving_recon_b1_p50_ms" in payloads[-1]
