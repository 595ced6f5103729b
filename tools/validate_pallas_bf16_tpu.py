"""Learning validation of bf16 MXU dots in the fused prior-Langevin kernel.

Trains the MNIST-anomaly workload (synthetic digits, reference-scale model
sizes) twice — pallas_dots_dtype='float32' vs 'bfloat16' — and compares best
AUPRC. The EBM's contrastive-divergence update consumes zk_neg directly from
the kernel, so a broken negative-chain distribution shows up immediately as
AUPRC loss. The bf16 path keeps fp32 accumulation/state/noise; only the MXU
operands are bf16 (the precision class the torch reference gets by default
from TF32 on Ampere).

Usage:  python tools/validate_pallas_bf16_tpu.py
"""

import dataclasses
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    import jax

    from damc_tpu.cli.common import enable_compile_cache
    from damc_tpu.data.datasets import load_mnist_anomaly, synthetic_mnist_npz
    from damc_tpu.train.anomaly import train_anomaly
    from damc_tpu.utils import preset

    enable_compile_cache()
    assert jax.devices()[0].platform != "cpu", "needs a real TPU"

    root = tempfile.mkdtemp(prefix="damc_pallas_bf16_")
    synthetic_mnist_npz(f"{root}/mnist.npz", n_per_split=(4000, 600, 600))
    train_x, _ = load_mnist_anomaly(root, heldout=1, split="train")
    test_x, test_y = load_mnist_anomaly(root, heldout=1, split="test")
    print(
        f"train {train_x.shape} test {test_x.shape} "
        f"anomaly rate {test_y.mean():.3f}",
        flush=True,
    )

    results = {}
    for dots in ("float32", "bfloat16"):
        cfg = preset("mnist_anomaly")
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train, batch_size=128, eval_every=100, print_every=100,
                pallas_dots_dtype=dots,
            ),
        )
        t0 = time.perf_counter()
        state, auc_best = train_anomaly(
            cfg, train_x, test_images=test_x, test_labels=test_y,
            iterations=301, log_dir=None, seed=0,
        )
        dt = time.perf_counter() - t0
        results[dots] = (auc_best, dt)
        print(f"dots={dots}: best AUPRC {auc_best:.4f} in {dt:.1f}s (301 iters)", flush=True)

    a32, a16 = results["float32"][0], results["bfloat16"][0]
    assert a16 > 0.9 * a32, f"bf16-dots learning degraded: {a16} vs {a32}"
    print("PALLAS BF16-DOTS LEARNING VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main()
