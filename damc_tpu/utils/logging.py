"""Structured logging + image/KDE artifact savers.

Replaces the reference's stdout prints and torchvision grid dumps
(`train_gen_recon.py:263-280`, `toy_example/toy_example.py:158-177`) with a
JSONL metrics stream (machine-readable for dashboards) alongside human prints,
a PIL-based image-grid saver, and the KDE density plot for the toy workload.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    """JSONL metrics writer + optional stdout echo."""

    def __init__(self, log_dir: Optional[str] = None, echo: bool = True):
        self.echo = echo
        self.path = None
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            self.path = os.path.join(log_dir, "metrics.jsonl")
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "train") -> None:
        record = {
            "step": int(step),
            "wall_s": round(time.time() - self._t0, 3),
            "phase": prefix,
            **{k: float(v) for k, v in metrics.items()},
        }
        if self.path is not None:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self.echo:
            kv = " ".join(f"{k} {record[k]:.6g}" for k in metrics)
            print(f"[{prefix}] iter {step} time {record['wall_s']:.1f}s {kv}", flush=True)


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8) -> None:
    """Save a grid PNG of NHWC images in [-1, 1] or [0, 1]
    (torchvision `save_image(normalize=True)` equivalent)."""
    from PIL import Image

    images = np.asarray(images)
    lo, hi = images.min(), images.max()
    images = (images - lo) / max(hi - lo, 1e-8)
    n, h, w, c = images.shape
    ncol = nrow
    nrows = -(-n // ncol)
    grid = np.ones((nrows * (h + 2) + 2, ncol * (w + 2) + 2, c), np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[
            r * (h + 2) + 2 : r * (h + 2) + 2 + h,
            col * (w + 2) + 2 : col * (w + 2) + 2 + w,
        ] = images[i]
    arr = (grid * 255).astype(np.uint8)
    if c == 1:
        arr = arr[..., 0]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(arr).save(path)


def save_kde_plot(
    samples: np.ndarray,
    path: str,
    low: float = -4.0,
    high: float = 4.0,
    kde_bw: float = 0.15,
) -> None:
    """KDE density heatmap of 2-D samples (`toy_example.py:158-177`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy.stats import gaussian_kde

    kernel = gaussian_kde(samples.T, bw_method=kde_bw)
    xs, ys = np.mgrid[low:high:100j, low:high:100j]
    zs = np.reshape(kernel(np.vstack([xs.ravel(), ys.ravel()])).T, xs.shape)

    plt.figure(figsize=(8, 8))
    plt.xlim([low, high])
    plt.ylim([low, high])
    plt.imshow(zs, cmap="viridis", extent=[low, high, low, high])
    plt.axis("off")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    plt.savefig(path, bbox_inches="tight", pad_inches=0, dpi=100)
    plt.close()
