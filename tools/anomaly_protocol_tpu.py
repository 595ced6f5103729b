"""Anomaly-detection protocol run at the REFERENCE cadence (round-3 item).

The reference trains MNIST anomaly detection per held-out digit with
AUPRC evaluated every 500 iterations and best-checkpoint gating
(`train_anomaly_det.py:206-248`). Round 2 confirmed learning on a tiny
split; this tool runs the full protocol on the real TPU at realistic MNIST
scale (60k/10k/10k synthetic npz via `data/datasets.py::synthetic_mnist_npz`
— the environment ships no real data) for held-out digits {1, 9}:

  * mnist_anomaly preset untouched (eval_every=500, reference mcmc/optim),
  * --iters 5000 default => 10 AUPRC evaluations per digit,
  * records the full AUPRC trajectory + best per digit to artifacts/.

AUPRC here is against synthetic digits (blocky signatures), so the VALUE is
not comparable to the paper's table — what this validates is the protocol:
convergence to a stable best under the reference cadence with best-ckpt
gating behaving (best is monotone, final close to best).
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--digits", type=int, nargs="+", default=[1, 9])
    # TOTAL images across the three npz splits; 70000 = the real MNIST
    # 50k train / 10k test / 10k valid (the anomaly split concatenates all
    # three before its own 80/20 re-split, `data/datasets.py:59-76`).
    ap.add_argument("--n_train", type=int, default=70000)
    ap.add_argument("--out", default="artifacts/anomaly_protocol.json")
    args = ap.parse_args()

    import jax

    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.data.datasets import load_mnist_anomaly, synthetic_mnist_npz
    from damc_tpu.train.anomaly import train_anomaly
    from damc_tpu.utils import preset

    enable_compile_cache()

    root = tempfile.mkdtemp(prefix="mnist_anom_")
    synthetic_mnist_npz(
        os.path.join(root, "mnist.npz"),
        n_per_split=(args.n_train - 20000, 10000, 10000),
    )
    cfg = preset("mnist_anomaly")

    results = {}
    for digit in args.digits:
        train_x, _ = load_mnist_anomaly(root, digit, "train")
        test_x, test_y = load_mnist_anomaly(root, digit, "test")
        log_dir = os.path.join(root, f"run_{digit}")
        print(f"digit {digit}: train {train_x.shape} test {test_x.shape} "
              f"(anomaly frac {test_y.mean():.3f}) -> {log_dir}", flush=True)
        t0 = time.perf_counter()
        _, best = train_anomaly(
            cfg, train_x, test_images=test_x, test_labels=test_y,
            iterations=args.iters, log_dir=log_dir, seed=digit,
        )
        wall = time.perf_counter() - t0
        evals = [
            json.loads(l) for l in open(os.path.join(log_dir, "metrics.jsonl"))
            if '"eval"' in l
        ]
        traj = [(r["step"], round(r["auprc"], 4)) for r in evals]
        results[str(digit)] = {
            "auprc_trajectory": traj,
            "best": round(best, 4),
            "final": traj[-1][1] if traj else None,
            "wall_s": round(wall, 1),
        }
        print(f"digit {digit}: best {best:.4f} traj {traj}", flush=True)

    summary = {
        "protocol": f"eval_every=500, iters={args.iters}, reference mnist_anomaly preset",
        "n_images_total_npz": args.n_train,
        "digits": results,
        "note": "synthetic MNIST (no real data in env); validates protocol "
                "convergence + best-ckpt gating, not the paper AUPRC value",
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)
    print(f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()
