"""Metrics: FID (Frechet + stats), AUPRC, MMD parity gate."""

from .fid import (
    RunningStats,
    compute_stats,
    fid_from_samples,
    frechet_distance,
    make_random_feature_fn,
)
from .mmd import median_heuristic_bandwidth, mmd2_rbf
from .prauc import auprc

__all__ = [
    "RunningStats",
    "compute_stats",
    "fid_from_samples",
    "frechet_distance",
    "make_random_feature_fn",
    "median_heuristic_bandwidth",
    "mmd2_rbf",
    "auprc",
]
