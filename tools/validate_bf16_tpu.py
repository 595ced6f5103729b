"""bf16 compute-dtype learning validation on TPU (synthetic MNIST anomaly).

Trains the anomaly workload twice at reference-scale model sizes — once with
compute_dtype='float32', once with 'bfloat16' (conv generator + encoder in
bf16; params, diffusion/Langevin math stay fp32) — and compares best AUPRC
and wall-clock. Outcome recorded in COMPONENTS.md: on v5e the bf16 path is
numerically on-par but only ~4% faster (the posterior-Langevin convs are
already near the bf16 MXU roofline through XLA), so fp32 stays the default.

Usage:  python tools/validate_bf16_tpu.py
"""

import dataclasses
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.data.datasets import load_mnist_anomaly, synthetic_mnist_npz
    from damc_tpu.train.anomaly import train_anomaly
    from damc_tpu.utils import preset

    enable_compile_cache()
    assert jax.devices()[0].platform != "cpu", "needs a real TPU"

    root = tempfile.mkdtemp(prefix="damc_bf16_")
    synthetic_mnist_npz(f"{root}/mnist.npz", n_per_split=(4000, 600, 600))
    train_x, _ = load_mnist_anomaly(root, heldout=1, split="train")
    test_x, test_y = load_mnist_anomaly(root, heldout=1, split="test")
    print(f"train {train_x.shape} test {test_x.shape} anomaly rate {test_y.mean():.3f}", flush=True)

    results = {}
    for dtype in ("float32", "bfloat16"):
        cfg = preset("mnist_anomaly")
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, compute_dtype=dtype),
            train=dataclasses.replace(
                cfg.train, batch_size=128, eval_every=100, print_every=100
            ),
        )
        t0 = time.perf_counter()
        state, auc_best = train_anomaly(
            cfg, train_x, test_images=test_x, test_labels=test_y,
            iterations=301, log_dir=None, seed=0,
        )
        dt = time.perf_counter() - t0
        results[dtype] = (auc_best, dt)
        print(f"{dtype}: best AUPRC {auc_best:.4f} in {dt:.1f}s (301 iters)", flush=True)

    a32, a16 = results["float32"][0], results["bfloat16"][0]
    assert a16 > 0.8 * a32, f"bf16 learning degraded: {a16} vs {a32}"
    print(f"bf16/fp32 AUPRC ratio {a16/a32:.3f} | "
          f"speed ratio {results['float32'][1]/results['bfloat16'][1]:.3f}", flush=True)
    print("BF16 PARITY OK", flush=True)


if __name__ == "__main__":
    main()
