"""Precision-recall AUC (AUPRC) — replaces the sklearn pipeline of
`train_anomaly_det.py:232-233` (`precision_recall_curve` + `auc`).

Host-side NumPy (this is a once-per-eval metric over a few thousand scalars,
not a device hot path). Matches sklearn's convention exactly: distinct
descending thresholds, curve closed at (recall=0, precision=1), trapezoidal
integral over recall — verified against sklearn in tests.
"""

from __future__ import annotations

import numpy as np


def auprc(scores, labels) -> float:
    """Area under the precision-recall curve.

    Args:
      scores: (N,) real-valued scores, higher = predicted positive.
      labels: (N,) binary {0, 1} ground truth.
    """
    scores = np.asarray(scores, dtype=np.float64).ravel()
    labels = np.asarray(labels, dtype=np.float64).ravel()
    order = np.argsort(-scores, kind="mergesort")
    s, y = scores[order], labels[order]

    # Evaluate at the last index of each distinct-threshold run.
    distinct = np.where(np.diff(s))[0]
    idxs = np.r_[distinct, s.size - 1]

    tp = np.cumsum(y)[idxs]
    fp = np.cumsum(1.0 - y)[idxs]
    precision = tp / np.maximum(tp + fp, 1e-300)
    if tp[-1] == 0:
        return 0.0
    recall = tp / tp[-1]

    precision = np.r_[1.0, precision]
    recall = np.r_[0.0, recall]
    trapezoid = getattr(np, "trapezoid", None) or np.trapz  # numpy<2
    return float(trapezoid(precision, recall))
