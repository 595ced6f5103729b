"""Headline benchmark: Langevin-chain throughput per chip (the BASELINE gate).

PRIMARY metric — `prior_langevin_chain_steps_per_sec`: the jitted
prior-Langevin kernel measured AS DEPLOYED — the training-config chains
(2B=256, full EBM energy, with noise) running ROUNDS x e_l_steps = 1200
steps inside ONE kernel dispatch, so per-call dispatch overhead (~1.3 ms
on this tunnel) is amortized the same way the fused train step amortizes
it (the step also dispatches the kernel once per program).

DRIVER-PROOF OUTPUT PROTOCOL (round-4 redesign after the r03 rc=124
timeout recorded NO perf number):

  1. The primary metric is measured FIRST on the exact-parity `lax.scan`
     kernel — a plain-XLA program that compiles in seconds even through a
     cold remote-compile tunnel — and the primary JSON line prints
     immediately (flushed).
  2. The REQUIRED `phase` section (its MFU fields are round-gate material)
     runs next, also on scan-path implementations (phase FLOPs are ~95%
     posterior-Langevin convolutions, so its MFU is implementation-
     insensitive; the r03 value used the Pallas dispatches and differed
     by ~4%).
  3. The fused Pallas kernel — the implementation that actually dispatches
     inside the deployed train step on TPU, ~1.4x the scan — then
     UPGRADES the primary value in a re-emitted line (`kernel_impl`
     records which implementation the current value reflects). Mosaic
     kernel compiles are the expensive ones on this platform (measured
     767 s cold in the r04 calibration runs vs <10 s for the scan
     program), which is exactly why they come after the gate metric is
     already on stdout.
  4. Every remaining section (reverse sweep, FID-generation walls, serving
     latency) is time-boxed against `DAMC_BENCH_BUDGET_S` (default 1500 s;
     the r03 driver kill came at ~30 min): a section whose conservative
     cost estimate exceeds the remaining budget is skipped with a note in
     `sections_skipped` instead of running the clock out.

  After EVERY completed section the full cumulative JSON line is
  re-printed — whether the harness parses the first JSON line or the
  last, and whether the process finishes or is killed mid-section, the
  captured line always carries the gate metric. Estimates switch from
  cold to warm values when the first Pallas section's wall shows the
  persistent compile cache is hitting (cache keys embed source
  locations, so only a byte-identical bench.py warms it — run the
  committed file once on the chip and the next run is minutes faster).

BASELINE (vs_baseline): the PyTorch reference's `sample_langevin_prior_z`
(`src/MCMC.py:27-46`) executes, per step, ~25 CUDA kernel launches (MLP
forward + autograd backward + update + randn) plus TWO unconditional
`.item()` device syncs (the diagnostics string at `MCMC.py:40-44` is built
every step) plus Python autograd-graph construction. A deliberately GENEROUS
floor for an RTX A6000 is 100 us/step (launch overhead alone is ~125 us at
5 us/launch; realistic wall is 300-500 us/step) => at 256 chains:
256 / 100e-6 = 2.56M chain-steps/s. The repo publishes no hardware numbers
(BASELINE.md), so this documented floor is the anchor; vs_baseline computed
against it UNDERSTATES the true ratio.

Secondary fields (cumulative JSON line):
  * `sampling_phase_chain_steps_per_sec` — the full per-iteration sampling
    phase of CIFAR-10 gen_recon at reference hyperparameters (100-step
    amortized reverse sweep + 30-step posterior Langevin + 60-step prior
    Langevin over 2B chains, B=128, full model sizes) in one jit, with an
    ANALYTIC FLOPs model (utils/flops.py), achieved TFLOP/s, and MFU vs
    the chip's dense bf16 peak.
  * `kernel_pallas_chain_steps_per_sec` — the fused Pallas kernel
    (ops/pallas/fused_langevin.py: weights+chains+activations
    VMEM-resident, on-core Box-Muller PRNG, hand-derived MLP backward).
  * `reverse_sweep_denoiser_evals_per_sec` — the deployed 100-step
    amortized DAMC sampler (fused Pallas kernel on TPU).
  * `fid_gen_50k_*_wall_s` — the reference's 50k-sample FID generation
    sweep, MEASURED over the actual 100-dispatch loop (not extrapolated
    from one batch — round-4 fix).
  * `serving_{damc_sample,recon}_b1_p{50,99}_ms` — single-request (batch-1)
    online-serving latency, each request fenced to completion (see
    bench_serving_latency).

All timings use a true device fence (`force_sync`): `block_until_ready`
alone can return early on this platform.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


from damc_tpu.models.amortizer import sample_q
from damc_tpu.ops.langevin import (
    langevin_sample,
    posterior_energy,
    prior_langevin_auto,
)
from damc_tpu.train.state import create_state_host_init
from damc_tpu.utils import preset
from damc_tpu.utils.profiling import force_sync

# Documented-floor estimates for the reference on an RTX A6000 (see module
# docstring for the derivation; both are generous to the reference).
A6000_KERNEL_FLOOR_CHAIN_STEPS_PER_SEC = 2_560_000.0  # 256 chains / 100us-step
A6000_PHASE_CHAIN_STEPS_PER_SEC = 82_000.0  # full sampling phase, B=128

TRAIN_CHAINS = 256  # 2B prior chains at B=128 (`train_gen_recon.py:206-209`)
TRAIN_STEPS = 60  # e_l_steps
ROUNDS = 20  # back-to-back 60-step rounds per dispatch
# Timing repeats (module-level so the CPU smoke test, tests/test_bench_smoke.py,
# can dial them down; the numbers below are the deployed TPU protocol).
TIMED_ITERS = 20
# The kernel programs run ~2-5 ms/call: at 20 iters the timing window is
# tens of ms, inside this shared-tenancy tunnel's jitter band (the r04
# probes saw 40% swings on the same code). 200 iters => ~0.5-1 s windows;
# kernels additionally take best-of-REPEATS to shed transient contention
# (standard peak-rate protocol; the A6000 floor they are compared against
# is equally idealized).
KERNEL_TIMED_ITERS = 200
REPEATS = 3
LATENCY_ITERS = 50

# Total wall budget for the whole script (driver kill-safety margin).
BUDGET_ENV = "DAMC_BENCH_BUDGET_S"
DEFAULT_BUDGET_S = 1500.0

# Conservative per-section wall estimates, (cold persistent-cache, warm)
# seconds, round-4 measurements: a Mosaic/Pallas kernel compile through
# this remote-compile tunnel runs 700-900 s cold (r04 calibration: 767 s)
# but seconds when the cache hits; plain-XLA scan programs compile in
# <10 s either way. A skippable section only starts if its estimate fits
# the remaining budget.
SECTION_EST_S = {
    "phase": (60.0, 30.0),  # scan impls: cheap compile + 20 x ~0.12 s calls
    "kernel_pallas": (900.0, 60.0),
    "sweep": (900.0, 60.0),
    "fid_gen": (950.0, 120.0),
    "serving": (950.0, 120.0),
}
REQUIRED_SECTIONS = ("phase",)  # MFU fields are round-gate material


def timed(fn, args, iters):
    out = fn(*args)
    force_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_sync(out)
    return (time.perf_counter() - t0) / iters


def bench_kernel(models, state, cfg, pallas: bool) -> float:
    """Training-config prior chains (2B=256), ROUNDS x e_l_steps = 1200
    steps in ONE dispatch. `pallas=False` pins the exact-parity lax.scan
    implementation (fast compile — measured first as the gate's floor);
    `pallas=True` lets the deployed auto-dispatch pick the fused kernel on
    TPU (the upgrade measurement).

    Round-4 protocol note: rounds used to be a 20-trip `lax.scan` over the
    60-step kernel with a fresh Gaussian init per trip; wrapping the fused
    Pallas kernel in an outer scan multiplied remote compile time brutally
    (767 s in the r04 calibration run), so the rounds now run back-to-back
    inside the kernel's own step loop — same chain-steps/sec definition,
    same per-call work, seconds-scale compile."""
    mc = cfg.mcmc
    nz = cfg.model.nz
    z0 = jax.random.normal(jax.random.PRNGKey(3), (TRAIN_CHAINS, nz))

    @jax.jit
    def run(key, z):
        zf, en = prior_langevin_auto(
            key, z, models.ebm, state.params_e,
            TRAIN_STEPS * ROUNDS, mc.e_l_step_size, mc.e_l_with_noise,
            use_pallas=pallas and cfg.train.use_pallas,
            dots_dtype=cfg.train.pallas_dots_dtype,
        )
        return zf, jnp.sum(en)

    dt = min(
        timed(run, (jax.random.PRNGKey(4), z0), iters=KERNEL_TIMED_ITERS)
        for _ in range(REPEATS)
    )
    return TRAIN_CHAINS * TRAIN_STEPS * ROUNDS / dt


def bench_reverse_sweep(models, state, cfg, B=128) -> dict:
    """The deployed 100-step amortized sampler (fused Pallas kernel on TPU,
    ops/pallas/fused_qsweep.py) — denoiser evals/sec."""
    x = jax.random.uniform(
        jax.random.PRNGKey(7), (B, 32, 32, 3), minval=-1.0, maxval=1.0
    )

    @jax.jit
    def run(params_q, xx, key):
        return sample_q(params_q, models.amortizer, key, x=xx)

    dt = min(
        timed(run, (state.params_q, x, jax.random.PRNGKey(8)),
              iters=KERNEL_TIMED_ITERS)
        for _ in range(REPEATS)
    )
    return {
        "reverse_sweep_denoiser_evals_per_sec": round(
            B * cfg.diffusion.n_interval / dt, 1
        )
    }


def make_sampling_phase(models, cfg, pallas: bool = True):
    """The flagship gen_recon sampling phase (100-step amortized Q sweep +
    posterior Langevin + 2B-chain prior Langevin) as ONE jitted program —
    shared with tools/phase_batch_scaling.py so the batch-scaling artifact
    measures the exact program the MFU evidence cites. `pallas=False`
    forces the scan-path sweep + prior (identical math/FLOPs; see the
    module docstring on why bench.py measures that variant).
    Signature: (params_q_ema, params_g, params_e, x, key)."""
    mc = cfg.mcmc

    @jax.jit
    def sampling_phase(params_q_ema, params_g, params_e, x, key):
        sg = jax.lax.stop_gradient
        k_q, k_post, k_neg, k_prior = jax.random.split(key, 4)
        z0 = sample_q(
            sg(params_q_ema), models.amortizer, k_q, x=x,
            fused=None if pallas else False,
        )
        gen_fn = lambda z: models.generator.apply(sg(params_g), z)
        ebm_fn = lambda z: models.ebm.apply(sg(params_e), z)
        zk_pos, _ = langevin_sample(
            k_post, z0,
            posterior_energy(gen_fn, ebm_fn, x, mc.g_llhd_sigma),
            mc.g_l_steps, mc.g_l_step_size, mc.g_l_with_noise,
        )
        z_neg_init = jnp.concatenate(
            [z0, jax.random.normal(k_neg, z0.shape, z0.dtype)], axis=0
        )
        zk_neg, _ = prior_langevin_auto(
            k_prior, z_neg_init, models.ebm, params_e,
            mc.e_l_steps, mc.e_l_step_size, mc.e_l_with_noise,
            use_pallas=pallas and cfg.train.use_pallas,
            dots_dtype=cfg.train.pallas_dots_dtype,
        )
        return zk_pos, zk_neg

    return sampling_phase


def phase_chain_steps(cfg, B):
    """Chain-steps per sampling-phase call: B sweep chains x n_interval +
    B posterior x g_l_steps + 2B prior x e_l_steps."""
    return B * (cfg.diffusion.n_interval + cfg.mcmc.g_l_steps + 2 * cfg.mcmc.e_l_steps)


def bench_sampling_phase(models, state, cfg, B=128, pallas: bool = False) -> dict:
    """Full gen_recon sampling phase (Q sweep + posterior + prior) in one
    jit — chain-steps/sec plus the MFU evidence fields."""
    sampling_phase = make_sampling_phase(models, cfg, pallas=pallas)

    x = jax.random.uniform(
        jax.random.PRNGKey(1), (B, 32, 32, 3), minval=-1.0, maxval=1.0
    )
    args = (state.params_q_ema, state.params_g, state.params_e, x, jax.random.PRNGKey(2))
    dt = timed(sampling_phase, args, iters=TIMED_ITERS)
    chain_steps = phase_chain_steps(cfg, B)

    # MFU evidence (round-3): analytic FLOPs model (utils/flops.py — exact
    # MAC counts from the same layer specs the models are built from,
    # validated vs XLA cost_analysis on UN-scanned applies in
    # tests/test_flops_model.py) over the amortized wall. NOTE: XLA's
    # cost_analysis counts a lax.scan body ONCE, not x trip-count, so it
    # under-reports this 190-serial-step phase ~30x — it is recorded here
    # only as that cautionary cross-check. Resolution of round 2's
    # "73% roofline vs +4% bf16" tension: BOTH are right — TPU executes
    # f32 matmuls at the one-pass-bf16 MXU rate by default (measured
    # 148 vs 178 TFLOP/s, artifacts/mfu_probe.json), so an fp32-path
    # program near the roofline gains little from bf16 operands.
    from damc_tpu.utils.flops import (
        peak_bf16_flops, sampling_phase_flops, xla_cost_flops,
    )

    model = sampling_phase_flops(cfg, B)
    flops = model["total"]
    xla_flops = xla_cost_flops(sampling_phase, args)
    peak = peak_bf16_flops(jax.devices()[0].device_kind)
    return {
        "sampling_phase_impl": "pallas" if pallas else "xla_scan",
        "sampling_phase_chain_steps_per_sec": round(chain_steps / dt, 1),
        "sampling_phase_vs_baseline": round(
            chain_steps / dt / A6000_PHASE_CHAIN_STEPS_PER_SEC, 2
        ),
        "sampling_phase_analytic_flops": flops,
        "sampling_phase_flops_breakdown": {
            k: round(model[k] / 1e9, 2) for k in ("sweep", "posterior", "prior")
        },
        "sampling_phase_xla_cost_flops_scan_body_once": xla_flops,
        "sampling_phase_wall_s": round(dt, 6),
        # 4 significant digits, NOT fixed decimals: the CPU smoke test's
        # tiny config runs at <1e-3 TFLOP/s, which fixed-decimal rounding
        # would collapse to exactly 0.0 (breaking the >0 contract check).
        "sampling_phase_achieved_tflops": float(f"{flops / dt / 1e12:.4g}"),
        "sampling_phase_mfu_vs_bf16_peak": (
            round(flops / dt / peak, 5) if peak else None
        ),
    }


def bench_fid_generation(models, state, cfg, n_samples=50_000, batch=500) -> dict:
    """Wall seconds for the reference's 50k-sample FID generation sweeps
    (`train_gen_recon.py:296-322`: n_fid_samples=50000 at bs=500, via the
    DAMC prior `MCMC.py:146-150` and via the EBM-prior Langevin
    `MCMC.py:119-128`) — generation only (feature extraction is the FID
    model's cost, not the sampler's), MEASURED over the actual
    100-dispatch Python loop the driver runs (train/gen_recon.py::
    evaluate_fid), each batch fenced like the feature extractor that
    consumes it. Round-4 change: previously timed one batch and multiplied
    by the round count; now the whole sweep is timed once. No vs_baseline
    is claimed for this field: the reference publishes no wall numbers for
    its FID loop, so we report raw seconds + samples/s only."""
    from damc_tpu.train.sampling import gen_samples_damc_prior, gen_samples_ebm_prior

    # evaluate_fid's own guard (train/gen_recon.py): n < batch still runs
    # one batch — a 0-round sweep would report an impossible 0.0s wall.
    rounds = max(n_samples // batch, 1)
    walls = {}
    for name, fn in (("damc", gen_samples_damc_prior), ("ebm", gen_samples_ebm_prior)):
        # One jitted per-batch program dispatched `rounds` times — exactly
        # how evaluate_fid deploys it (Python loop over bs=500 batches;
        # per-call dispatch overhead is part of the protocol). NOT one
        # giant scanned program: a 100-trip scan over the fused B=500
        # sweep kernel produced a 9-minute remote compile and tunnel
        # flakes on this platform for zero deployment realism.
        run = jax.jit(
            lambda key, fn=fn: fn(key, state, models, cfg, batch)
        )
        key = jax.random.PRNGKey(5)
        force_sync(run(key))  # compile + warm outside the timed window
        t0 = time.perf_counter()
        for i in range(rounds):
            force_sync(run(jax.random.fold_in(key, i)))
        wall = time.perf_counter() - t0
        walls[f"fid_gen_{n_samples // 1000}k_{name}_prior_wall_s"] = round(wall, 3)
        walls[f"fid_gen_{name}_prior_samples_per_sec"] = round(
            rounds * batch / wall, 1
        )
    return walls


def bench_serving_latency(models, state, cfg) -> dict:
    """Single-request (batch-1) serving latency for the two online paths a
    deployment exposes: draw one sample via the DAMC prior (100-step
    amortized sweep + G decode, `MCMC.py:146-150`) and reconstruct one
    image (Q(x) init + 10-step noiseless posterior Langevin + decode,
    `train_gen_recon.py:324-348`). Unlike the throughput fields, every
    request here is fenced to completion before the next is issued —
    p50/p99 over LATENCY_ITERS requests is the request->response wall a
    serving frontend would observe, INCLUDING per-call dispatch and the
    device fence (~ms-scale on this tunnel), not just device time."""
    from damc_tpu.train.sampling import gen_samples_damc_prior, reconstruct

    x1 = jax.random.uniform(
        jax.random.PRNGKey(11), (1, 32, 32, 3), minval=-1.0, maxval=1.0
    )
    sample_fn = jax.jit(
        lambda k: gen_samples_damc_prior(k, state, models, cfg, 1)[0]
    )
    recon_fn = jax.jit(
        lambda k, xx: reconstruct(k, state, models, cfg, xx, langevin_steps=10)[0]
    )
    keys = jax.random.split(jax.random.PRNGKey(12), LATENCY_ITERS)
    out = {}
    for name, fn, args in (
        ("serving_damc_sample_b1", sample_fn, lambda i: (keys[i],)),
        ("serving_recon_b1", recon_fn, lambda i: (keys[i], x1)),
    ):
        force_sync(fn(*args(0)))  # compile + warm outside the timed window
        samples = []
        for i in range(LATENCY_ITERS):
            t0 = time.perf_counter()
            force_sync(fn(*args(i)))
            samples.append(time.perf_counter() - t0)
        out[f"{name}_p50_ms"] = round(float(np.percentile(samples, 50)) * 1e3, 3)
        out[f"{name}_p99_ms"] = round(float(np.percentile(samples, 99)) * 1e3, 3)
    return out


def _emit(payload):
    print(json.dumps(payload), flush=True)


def collect(
    cfg, state, models, B=128, fid_samples=50_000, fid_batch=500,
    budget_s=None, t_start=None, emit=None,
) -> dict:
    """All bench fields as one cumulative dict.

    Measures the PRIMARY kernel metric first on the fast-compiling scan
    implementation and emits it immediately (if `emit` is given), then runs
    each section in priority order, time-boxed against `budget_s` total
    wall since `t_start` (None = unlimited, the CPU smoke-test mode),
    re-emitting the cumulative payload after every section. Returns the
    final payload."""
    t_start = time.monotonic() if t_start is None else t_start
    emit = emit or (lambda payload: None)

    t_sec = time.monotonic()
    kernel_scan = bench_kernel(models, state, cfg, pallas=False)
    kernel_wall = time.monotonic() - t_sec

    payload = {
        "metric": "prior_langevin_chain_steps_per_sec",
        "value": round(kernel_scan, 1),
        "unit": "chain-steps/sec",
        "vs_baseline": round(
            kernel_scan / A6000_KERNEL_FLOOR_CHAIN_STEPS_PER_SEC, 2
        ),
        # Measurement-protocol version (r4 advisor finding: the r3->r4
        # protocol change — single 1200-step dispatch, 200-iter windows,
        # best-of-3 — moved the headline number while vs_baseline kept the
        # same floor; tag the payload so historical values are not compared
        # as like-for-like). Bump when the timing protocol changes.
        "bench_protocol": "r4-best-of-3",
        "kernel_impl": "xla_scan",
        "baseline_note": (
            "A6000 floor 2.56M chain-steps/s = 256 chains / 100us-step"
            " (generous; see bench.py docstring)"
        ),
        "config": (
            f"{TRAIN_CHAINS} chains x {TRAIN_STEPS * ROUNDS} steps "
            f"({ROUNDS} back-to-back {TRAIN_STEPS}-step rounds) per dispatch"
        ),
        "backend": jax.default_backend(),
        "budget_s": budget_s,
        # Wall from process start to the first (gate-carrying) print:
        # includes imports, create_state, and the primary compile — the
        # driver-proofness of the whole protocol rests on this staying far
        # under the driver's kill budget.
        "time_to_primary_s": round(time.monotonic() - t_start, 1),
        "kernel_scan_chain_steps_per_sec": round(kernel_scan, 1),
        "section_walls_s": {"kernel_scan": round(kernel_wall, 1)},
        "sections_skipped": [],
    }
    emit(payload)

    def kernel_pallas_section():
        v = bench_kernel(models, state, cfg, pallas=True)
        fields = {"kernel_pallas_chain_steps_per_sec": round(v, 1)}
        if v > payload["value"]:
            fields.update(
                value=round(v, 1),
                vs_baseline=round(v / A6000_KERNEL_FLOOR_CHAIN_STEPS_PER_SEC, 2),
                kernel_impl="pallas",
            )
        return fields

    sections = [
        ("phase", lambda: bench_sampling_phase(
            models, state, cfg, B=B, pallas=False
        )),
        ("kernel_pallas", kernel_pallas_section),
        ("sweep", lambda: bench_reverse_sweep(models, state, cfg, B=B)),
        ("fid_gen", lambda: bench_fid_generation(
            models, state, cfg, n_samples=fid_samples, batch=fid_batch
        )),
        ("serving", lambda: bench_serving_latency(models, state, cfg)),
    ]
    # Warm persistent compile cache => Pallas sections compile in seconds,
    # not minutes; detected from the first Pallas compile's wall at run
    # time is too late for its own skip decision, so the cold column
    # applies until a Pallas section has completed fast.
    est_col = 0
    for name, fn in sections:
        est = SECTION_EST_S[name][est_col]
        elapsed = time.monotonic() - t_start
        if (
            name not in REQUIRED_SECTIONS
            and budget_s is not None
            and elapsed + est > budget_s
        ):
            payload["sections_skipped"].append(
                {
                    "section": name,
                    "reason": (
                        f"estimated {est:.0f}s would exceed budget "
                        f"({elapsed:.0f}s elapsed of {budget_s:.0f}s)"
                    ),
                }
            )
            emit(payload)
            continue
        t_sec = time.monotonic()
        payload.update(fn())
        wall = time.monotonic() - t_sec
        payload["section_walls_s"][name] = round(wall, 1)
        if name == "kernel_pallas" and wall < 0.5 * SECTION_EST_S[name][0]:
            est_col = 1  # cache is hitting — use warm estimates from here
        emit(payload)
    return payload


def main():
    from damc_tpu.cli.common import enable_compile_cache

    t_start = time.monotonic()
    enable_compile_cache()
    budget_s = float(os.environ.get(BUDGET_ENV, DEFAULT_BUDGET_S))
    cfg = preset("cifar10")
    # Host-CPU init + one transfer (~24 s vs ~143 s through the remote-
    # compile tunnel): everything before the first emit risks the driver's
    # budget.
    state, models, _ = create_state_host_init(jax.random.PRNGKey(0), cfg)
    collect(
        cfg, state, models, budget_s=budget_s, t_start=t_start, emit=_emit
    )


if __name__ == "__main__":
    main()
