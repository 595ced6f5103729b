"""Kernel two-sample statistics for distribution parity (toy 2-D gate).

The reference validates DAMC-vs-long-run-Langevin agreement only by eye (KDE
plots, `toy_example/toy_example.py:158-177,294-302`) plus a recon-loss print.
We make this an automated gate: RBF-kernel MMD^2 between the amortized and
ground-truth posterior samples (SURVEY.md §4 "exceed this").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    aa = jnp.sum(a * a, axis=-1)[:, None]
    bb = jnp.sum(b * b, axis=-1)[None, :]
    return jnp.maximum(aa + bb - 2.0 * a @ b.T, 0.0)


def median_heuristic_bandwidth(x: jax.Array, y: jax.Array) -> jax.Array:
    """sigma^2 = median of pooled pairwise squared distances / 2."""
    z = jnp.concatenate([x, y], axis=0)
    d = _sq_dists(z, z)
    n = z.shape[0]
    off_diag = d[jnp.triu_indices(n, k=1)]
    return jnp.median(off_diag) / 2.0


def mmd2_rbf(x: jax.Array, y: jax.Array, sigma2: jax.Array | None = None) -> jax.Array:
    """Unbiased MMD^2 estimate with an RBF kernel.

    Args:
      x: (n, d) samples from P; y: (m, d) samples from Q.
      sigma2: kernel bandwidth (squared); median heuristic if None.
    """
    if sigma2 is None:
        sigma2 = median_heuristic_bandwidth(x, y)
    gamma = 1.0 / (2.0 * sigma2)
    n, m = x.shape[0], y.shape[0]

    kxx = jnp.exp(-gamma * _sq_dists(x, x))
    kyy = jnp.exp(-gamma * _sq_dists(y, y))
    kxy = jnp.exp(-gamma * _sq_dists(x, y))

    sum_xx = (jnp.sum(kxx) - n) / (n * (n - 1))
    sum_yy = (jnp.sum(kyy) - m) / (m * (m - 1))
    sum_xy = jnp.mean(kxy)
    return sum_xx + sum_yy - 2.0 * sum_xy
