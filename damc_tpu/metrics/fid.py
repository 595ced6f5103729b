"""Frechet Inception Distance: feature statistics + Frechet distance.

TPU-native replacement for the `pytorch_fid_wrapper` pipeline the reference
leans on (`/root/reference/workspace/src/MCMC.py:130-144`,
`train_gen_recon.py:114-126`): features come from a pluggable extractor (the
JAX InceptionV3 in `inception.py` once weights are available, or any callable
mapping images -> (N, D) features), stats accumulate in a streaming Welford
form so the 50k-sample FID sweep never materializes the feature matrix, and
the Frechet distance uses `scipy.linalg.sqrtm` exactly like pytorch-fid.

Images are expected in [0, 1] (the reference clamps [-1,1] -> [0,1] first,
`MCMC.py:138` — see `train/sampling.py:to_unit_range`).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FeatureFn = Callable[[jax.Array], jax.Array]  # images (B,H,W,C) -> (B, D)


class RunningStats:
    """Streaming mean/covariance accumulator (host-side, float64)."""

    def __init__(self, dim: int):
        self.n = 0
        self.sum = np.zeros((dim,), np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray) -> None:
        feats = np.asarray(feats, np.float64)
        self.n += feats.shape[0]
        self.sum += feats.sum(axis=0)
        self.outer += feats.T @ feats

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (mu, sigma) with the unbiased covariance (np.cov ddof=1,
        matching pytorch-fid)."""
        assert self.n >= 2, "need at least 2 samples for covariance"
        mu = self.sum / self.n
        cov = (self.outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov


def images_to_unit(images: np.ndarray) -> np.ndarray:
    """Host images -> [0, 1] floats for feature extraction: uint8 [0,255]
    storage divides by 255; float arrays are assumed [-1, 1] (the pipeline
    convention) and are affinely mapped. Mixing these up silently corrupts
    FID statistics, so every stats call site routes through here."""
    if images.dtype == np.uint8:
        return images.astype(np.float32) / 255.0
    return (np.asarray(images, np.float32) + 1.0) / 2.0


def compute_stats(
    feature_fn: FeatureFn,
    batches: Iterable[np.ndarray],
) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of extractor features over an iterable of image batches."""
    stats: Optional[RunningStats] = None
    for batch in batches:
        feats = np.asarray(feature_fn(jnp.asarray(batch)))
        if stats is None:
            stats = RunningStats(feats.shape[-1])
        stats.update(feats)
    assert stats is not None, "no batches provided"
    return stats.finalize()


def make_stats_accumulator(feature_fn: FeatureFn, mesh=None):
    """Jitted device-side stats accumulator: carry = (n, sum, outer).

    With a mesh, image batches are sharded over the `data` axis and the
    carry is replicated — XLA inserts the cross-device (ICI) and cross-host
    (DCN) reductions, which is the multi-host FID-statistics psum of
    SURVEY.md §2.6 (the reference computes FID on one GPU only,
    `MCMC.py:139`). Accumulation is fp32 on device; callers must bound the
    f32 sum depth by periodically folding the carry into float64 host
    totals (`compute_stats_sharded` folds every `fold_every` batches) —
    a 50k-sample f32 outer-product sum alone would lose ~1e-5 relative,
    amplified by the `outer - n*mu*mu^T` cancellation in finalize, enough
    to shift FID between --use_mesh and single-device runs.

    Returns (init_fn(dim) -> carry, accumulate_fn(carry, batch) -> carry).
    """
    from functools import partial

    if mesh is not None:
        from ..parallel import batch_sharding, replicated

        jitted = partial(
            jax.jit,
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=replicated(mesh),
        )
    else:
        jitted = jax.jit

    @jitted
    def accumulate(carry, batch):
        n, s, outer = carry
        f = feature_fn(batch).astype(jnp.float32)
        return (n + f.shape[0], s + f.sum(axis=0), outer + f.T @ f)

    def init(dim: int):
        return (
            jnp.zeros((), jnp.int32),
            jnp.zeros((dim,), jnp.float32),
            jnp.zeros((dim, dim), jnp.float32),
        )

    return init, accumulate


def finalize_stats(carry) -> Tuple[np.ndarray, np.ndarray]:
    """(n, sum, outer) -> (mu, unbiased sigma), float64 on host."""
    n = int(carry[0])
    assert n >= 2, "need at least 2 samples for covariance"
    s = np.asarray(carry[1], np.float64)
    outer = np.asarray(carry[2], np.float64)
    mu = s / n
    cov = (outer - n * np.outer(mu, mu)) / (n - 1)
    return mu, cov


def compute_stats_sharded(
    feature_fn: FeatureFn,
    batches: Iterable,
    mesh,
    dim: int,
    fold_every: int = 16,
) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh-parallel `compute_stats`: batches may be host arrays (device_put
    sharded here) or already-sharded device arrays (e.g. straight from a
    sharded generation program — no host round-trip).

    Matches the host path's float64 accuracy: the f32 device carry is
    folded into float64 host totals every `fold_every` batches (bounding
    the f32 sum depth to ~fold_every*batch rows, ~1e-6 relative) instead of
    accumulating all 50k samples in f32 — per-batch host pulls would move
    16 MB of outer-product per batch for nothing."""
    from ..parallel import shard_batch

    init, accumulate = make_stats_accumulator(feature_fn, mesh)
    n64, s64, outer64 = 0, np.zeros((dim,), np.float64), np.zeros((dim, dim), np.float64)
    carry = init(dim)
    since_fold = 0

    def fold(carry):
        nonlocal n64, s64, outer64
        n64 += int(carry[0])
        s64 += np.asarray(carry[1], np.float64)
        outer64 += np.asarray(carry[2], np.float64)
        return init(dim)

    for batch in batches:
        if isinstance(batch, np.ndarray):
            batch = shard_batch(mesh, batch)
        carry = accumulate(carry, batch)
        since_fold += 1
        if since_fold >= fold_every:
            carry = fold(carry)
            since_fold = 0
    if since_fold:
        fold(carry)
    assert n64 >= 2, "need at least 2 samples for covariance"
    mu = s64 / n64
    cov = (outer64 - n64 * np.outer(mu, mu)) / (n64 - 1)
    return mu, cov


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray, eps: float = 1e-6
) -> float:
    """d^2 = ||mu1 - mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)).

    Mirrors pytorch-fid's calculate_frechet_distance numerics (sqrtm with an
    eps*I retry on singular products, imaginary-part check).
    """
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"sqrtm produced large imaginary component {m}")
        covmean = covmean.real

    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def fid_from_samples(
    feature_fn: FeatureFn,
    sample_batches: Iterable[np.ndarray],
    real_mu: np.ndarray,
    real_sigma: np.ndarray,
) -> float:
    """FID of generated batches against precomputed real stats
    (the reference's `pfw.fid(..., real_m, real_s)` path)."""
    mu, sigma = compute_stats(feature_fn, sample_batches)
    return frechet_distance(mu, sigma, real_mu, real_sigma)


def make_random_feature_fn(
    key: jax.Array, image_shape: Tuple[int, int, int], dim: int = 192
) -> FeatureFn:
    """Deterministic random-projection conv feature extractor.

    Weight-free stand-in used by tests and by environments without the
    InceptionV3 checkpoint: a fixed random strided conv + pooling pyramid.
    NOT comparable to Inception-FID numbers, but a valid Frechet metric
    (distinguishes distributions, zero for identical ones).
    """
    h, w, c = image_shape
    k1, k2 = jax.random.split(key)
    w1 = jax.random.normal(k1, (4, 4, c, 64)) / np.sqrt(16 * c)
    w2 = jax.random.normal(k2, (4, 4, 64, dim)) / np.sqrt(16 * 64)

    @jax.jit
    def feature_fn(x: jax.Array) -> jax.Array:
        x = x.astype(jnp.float32) * 2.0 - 1.0
        y = jax.lax.conv_general_dilated(
            x, w1, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(
            y, w2, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.mean(y, axis=(1, 2))

    return feature_fn
