"""One-command acceptance scoreboard: every BASELINE.md gate, one JSON.

Round-5 (VERDICT r4 next #6). Runs each build-target gate of BASELINE.md
end-to-end in one invocation, skipping cleanly (with the reason recorded in
the JSON) where this image lacks the required inputs (real datasets,
InceptionV3 weights, a TPU backend in-process), and writes ONE scoreboard
artifact: artifacts/acceptance.json. README's acceptance table is generated
from the markdown this tool prints at the end.

Gates (BASELINE.md build-targets table):
  toy_posterior_parity     MMD^2 / recon-loss vs the reference toy loop and
                           the 1000-step long-run Langevin ground truth
                           (tools/trajectory_parity_toy.py)
  anomaly_auprc_parity     AUPRC vs the reference anomaly loop
                           (tools/trajectory_parity_anomaly.py)
  gen_recon_parity         g_loss trajectory + eval recon-MSE vs the
                           reference gen_recon loop (tools/trajectory_parity.py)
  ckpt_conversion_parity   recon-MSE parity of a CONVERTED reference
                           checkpoint (tools/eval_converted_reference_ckpt.py)
  stylegan_inversion_parity  Adam-refinement + full-pipeline parity vs the
                           reference inversion loop
                           (tools/trajectory_parity_inversion.py)
  kernel_throughput_10x    >= 10x the documented A6000 chain-steps/s floor
                           (bench.py kernel; TPU-only, skipped on CPU — the
                           driver's BENCH_r0N.json is the recorded evidence)
  real_fid_readiness       real-InceptionV3 FID conversion+parity
                           (tools/validate_real_inception.py; skips until
                           weights exist)
  real_dataset_fid_5pct    FID within 5% of the reference on real
                           SVHN/CIFAR (skips: no real datasets in image)

Usage:
  python tools/acceptance.py                      # all gates
  python tools/acceptance.py --gates toy_posterior_parity,anomaly_auprc_parity
  python tools/acceptance.py --quick              # reduced iteration counts
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/workspace"
sys.path.insert(0, REPO)


def _run_tool(cmd, timeout):
    proc = subprocess.run(
        [sys.executable] + cmd, capture_output=True, text=True,
        timeout=timeout, cwd=REPO,
    )
    return proc


def _tail(s, n=12):
    return "\n".join(s.strip().splitlines()[-n:])


def _need_reference(row):
    if not os.path.isdir(REF):
        row.update(
            status="skip",
            reason="reference torch oracle not available at " + REF,
        )
        return True
    return False


def gate_toy(iters, timeout):
    row = {"target": "toy 2-D posterior parity vs long-run Langevin ground "
                     "truth (BASELINE.md: KL/MMD gate)"}
    if _need_reference(row):
        return row
    with tempfile.NamedTemporaryFile(suffix=".json") as f:
        proc = _run_tool(
            ["tools/trajectory_parity_toy.py", "--iters", str(iters),
             "--out", f.name], timeout,
        )
        if proc.returncode != 0:
            return {**row, "status": "fail", "reason": _tail(proc.stdout + proc.stderr)}
        s = json.load(open(f.name))["summary"]
    fe = s["final_eval"]
    # Sides-MMD bound is convergence-rate-honest: mid-window (BASELINE.md's
    # 300-3000 iter range) the two sides' clouds may legitimately sit as
    # far from each other as each sits from the ground truth; fully
    # converged (3000 iters) the bound tightens to the absolute 0.02
    # (recorded 0.0042 there, trajectory_parity_toy_3000.json).
    sides_bound = max(
        0.02, 2.0 * max(fe["mmd2_q_vs_gt_ref"], fe["mmd2_q_vs_gt_damc"])
    )
    ok = (
        fe["mmd2_q_ref_vs_q_damc"] < sides_bound
        and fe["mmd2_q_vs_gt_damc"] < 2.0 * fe["mmd2_q_vs_gt_ref"] + 0.01
        and abs(fe["g_loss_q"]["rel_diff"]) < 0.15
    )
    row.update(
        status="pass" if ok else "fail",
        iters=iters,
        values={
            "mmd2_q_ref_vs_q_damc": fe["mmd2_q_ref_vs_q_damc"],
            "mmd2_q_vs_gt_ref": fe["mmd2_q_vs_gt_ref"],
            "mmd2_q_vs_gt_damc": fe["mmd2_q_vs_gt_damc"],
            "g_loss_q_rel_diff": fe["g_loss_q"]["rel_diff"],
        },
        criteria="mmd2(sides) < max(0.02, 2x either side's GT-MMD); "
                 "mmd2_vs_gt(damc) < 2x ref + 0.01; g_loss_q rel diff < 15%",
    )
    return row


def gate_anomaly(iters, timeout):
    row = {"target": "MNIST anomaly AUPRC parity (BASELINE.md)"}
    if _need_reference(row):
        return row
    with tempfile.NamedTemporaryFile(suffix=".json") as f:
        proc = _run_tool(
            ["tools/trajectory_parity_anomaly.py", "--iters", str(iters),
             "--out", f.name], timeout,
        )
        if proc.returncode != 0:
            return {**row, "status": "fail", "reason": _tail(proc.stdout + proc.stderr)}
        s = json.load(open(f.name))["summary"]
    au = s["final_auprc"]
    ok = abs(au["abs_diff"]) < 0.03
    row.update(
        status="pass" if ok else "fail", iters=iters,
        values={"auprc_ref": au["ref"], "auprc_damc": au["damc"],
                "abs_diff": au["abs_diff"]},
        criteria="|AUPRC(damc) - AUPRC(ref)| < 0.03 on the same tiny run",
    )
    return row


def gate_gen_recon(iters, timeout):
    row = {"target": "gen_recon trajectory + recon-MSE parity "
                     "(BASELINE.md FID/recon pipeline gate, torch-oracle leg)"}
    if _need_reference(row):
        return row
    with tempfile.NamedTemporaryFile(suffix=".json") as f:
        proc = _run_tool(
            ["tools/trajectory_parity.py", "--iters", str(iters),
             "--out", f.name], timeout,
        )
        if proc.returncode != 0:
            return {**row, "status": "fail", "reason": _tail(proc.stdout + proc.stderr)}
        s = json.load(open(f.name))["summary"]
    ok = (
        abs(s["g_loss"]["rel_diff"]) < 0.10
        and abs(s["final_eval_mse"]["rel_diff"]) < 0.10
    )
    row.update(
        status="pass" if ok else "fail", iters=iters,
        values={
            "g_loss_rel_diff": s["g_loss"]["rel_diff"],
            "eval_mse_rel_diff": s["final_eval_mse"]["rel_diff"],
        },
        criteria="tail g_loss rel diff < 10%; eval recon-MSE rel diff < 10%",
    )
    return row


def gate_ckpt_conversion(timeout, n=128, batch=64):
    row = {"target": "recon-MSE parity on a CONVERTED reference checkpoint "
                     "(bidirectional migration gate)"}
    if _need_reference(row):
        return row
    proc = _run_tool(
        ["tools/eval_converted_reference_ckpt.py", "--n", str(n),
         "--batch", str(batch)], timeout,
    )
    ok = proc.returncode == 0 and "EVAL-PARITY OK" in proc.stdout
    m = re.search(r"rel diff ([0-9.]+)%", proc.stdout)
    row.update(
        status="pass" if ok else "fail",
        values={"recon_mse_rel_diff_pct": float(m.group(1)) if m else None},
        criteria="rel diff < 5% on identical (converted) weights",
    )
    if not ok:
        row["reason"] = _tail(proc.stdout + proc.stderr)
    return row


def gate_inversion(timeout):
    row = {"target": "StyleGAN inversion parity (recon MSE / Adam "
                     "refinement vs the reference loop, BASELINE.md)"}
    if _need_reference(row):
        return row
    with tempfile.NamedTemporaryFile(suffix=".json") as f:
        proc = _run_tool(
            ["tools/trajectory_parity_inversion.py", "--out", f.name],
            timeout,
        )
        if proc.returncode != 0:
            return {**row, "status": "fail", "reason": _tail(proc.stdout + proc.stderr)}
        d = json.load(open(f.name))
    leg_a = d["leg_a_adam_refine"]
    ok = leg_a["z_rel_l2"] < 0.05 and bool(leg_a["loss_decreased"])
    row.update(
        status="pass" if ok else "fail",
        values={
            "adam_refine_z_rel_l2": leg_a["z_rel_l2"],
            "recon_mse": leg_a["recon_mse"],
        },
        criteria="refined-z rel L2 vs torch Adam loop < 5%; loss decreases",
    )
    return row


def gate_kernel_throughput(timeout):
    row = {"target": ">= 10x A6000 Langevin chain-steps/s floor on one chip "
                     "(BASELINE.md throughput gate)"}
    import jax

    if jax.default_backend() != "tpu":
        row.update(
            status="skip",
            reason=(
                "no TPU backend in this process; the gate's recorded "
                "evidence is the driver-captured BENCH_r0N.json "
                "(r4: 80.4x the floor)"
            ),
        )
        return row
    import bench
    from damc_tpu.train.state import create_state_host_init
    from damc_tpu.utils import preset

    cfg = preset("cifar10")
    state, models, _ = create_state_host_init(jax.random.PRNGKey(0), cfg)
    v_scan = bench.bench_kernel(models, state, cfg, pallas=False)
    v_pallas = bench.bench_kernel(models, state, cfg, pallas=True)
    v = max(v_scan, v_pallas)
    ratio = v / bench.A6000_KERNEL_FLOOR_CHAIN_STEPS_PER_SEC
    row.update(
        status="pass" if ratio >= 10.0 else "fail",
        values={
            "chain_steps_per_sec": round(v, 1),
            "kernel_impl": "pallas" if v_pallas >= v_scan else "xla_scan",
            "vs_a6000_floor": round(ratio, 2),
        },
        criteria=">= 10x the documented 2.56M chain-steps/s floor",
    )
    return row


def gate_real_fid_readiness(timeout):
    row = {"target": "real-InceptionV3 FID conversion + parity "
                     "(quantitative FID gate unblocks when weights exist)"}
    proc = _run_tool(["tools/validate_real_inception.py"], timeout)
    if proc.returncode == 2:
        row.update(
            status="skip",
            reason="no pt_inception-2015-12-05-6726825d.pth in this image; "
                   "recorded quality numbers use the labeled frechet_rand "
                   "fallback (tool unblocks the moment weights exist)",
        )
        return row
    if proc.returncode != 0:
        return {**row, "status": "fail", "reason": _tail(proc.stdout + proc.stderr)}
    verdict = json.loads(proc.stdout.strip().splitlines()[-1])
    row.update(status="pass" if verdict.get("ok") else "fail", values=verdict)
    return row


def gate_real_dataset_fid():
    return {
        "target": "SVHN/CIFAR-10 FID within 5% of the reference "
                  "(BASELINE.md headline quality gate)",
        "status": "skip",
        "reason": "no real SVHN/CIFAR/CelebA datasets in this image and no "
                  "InceptionV3 weights; loaders are format-exact and the "
                  "pipeline is oracle-parity-tested (gen_recon_parity + "
                  "ckpt_conversion gates above) — run "
                  "cli.eval_gen_recon on real data to close this gate",
    }


GATES = {
    "toy_posterior_parity": lambda a: gate_toy(a.toy_iters, a.timeout),
    "anomaly_auprc_parity": lambda a: gate_anomaly(a.anomaly_iters, a.timeout),
    "gen_recon_parity": lambda a: gate_gen_recon(a.gen_recon_iters, a.timeout),
    "ckpt_conversion_parity": lambda a: gate_ckpt_conversion(a.timeout),
    "stylegan_inversion_parity": lambda a: gate_inversion(a.timeout),
    "kernel_throughput_10x": lambda a: gate_kernel_throughput(a.timeout),
    "real_fid_readiness": lambda a: gate_real_fid_readiness(a.timeout),
    "real_dataset_fid_5pct": lambda a: gate_real_dataset_fid(),
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gates", default=",".join(GATES))
    ap.add_argument("--out", default="artifacts/acceptance.json")
    ap.add_argument("--toy_iters", type=int, default=300)
    ap.add_argument("--anomaly_iters", type=int, default=100)
    ap.add_argument("--gen_recon_iters", type=int, default=60)
    ap.add_argument("--timeout", type=float, default=3600.0)
    ap.add_argument(
        "--quick", action="store_true",
        help="reduced iteration counts (smoke of the harness itself)",
    )
    args = ap.parse_args(argv)
    if args.quick:
        args.toy_iters, args.anomaly_iters, args.gen_recon_iters = 20, 10, 10

    result = {
        "what": "BASELINE.md acceptance scoreboard (one command, one JSON)",
        "tool": "tools/acceptance.py",
        "date": time.strftime("%Y-%m-%d"),
        "quick": args.quick,
        "gates": {},
    }
    # Merge semantics: a partial re-run (--gates x,y) updates those rows in
    # an existing scoreboard instead of discarding the others.
    if os.path.exists(args.out):
        try:
            prior = json.load(open(args.out))
            if isinstance(prior.get("gates"), dict):
                result["gates"].update(prior["gates"])
        except (json.JSONDecodeError, OSError):
            pass
    import jax

    result["backend"] = jax.default_backend()
    for name in args.gates.split(","):
        name = name.strip()
        if name not in GATES:
            raise SystemExit(f"unknown gate {name!r}; have {sorted(GATES)}")
        print(f"[acceptance] {name} ...", flush=True)
        t0 = time.time()
        try:
            row = GATES[name](args)
        except subprocess.TimeoutExpired:
            row = {"status": "fail", "reason": f"timed out after {args.timeout}s"}
        row["wall_s"] = round(time.time() - t0, 1)
        result["gates"][name] = row
        print(f"[acceptance] {name}: {row['status']} ({row['wall_s']}s)",
              flush=True)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)

    statuses = [g["status"] for g in result["gates"].values()]
    result["summary"] = {
        "pass": statuses.count("pass"),
        "fail": statuses.count("fail"),
        "skip": statuses.count("skip"),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)

    # README-ready markdown table
    print("\n| Gate | Status | Key values |")
    print("|---|---|---|")
    for name, g in result["gates"].items():
        vals = g.get("values")
        vals_s = (
            "; ".join(f"{k}={v}" for k, v in vals.items())
            if isinstance(vals, dict) else (g.get("reason", "") or "")[:90]
        )
        print(f"| {name} | {g['status']} | {vals_s} |")
    print(f"\nsummary: {result['summary']}  -> {args.out}", flush=True)
    return 0 if result["summary"]["fail"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
