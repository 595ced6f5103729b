"""Device-resident training-data sampler: batches are produced IN HBM.

TPU-first replacement for the host feed path (Loader/NativeLoader →
`jax.device_put` per batch; the reference streams every batch through the
host, `train_gen_recon.py:109-111,180-185`). `DeviceDataset` transfers the
whole store to device memory ONCE and makes each batch with a tiny jitted
program (dynamic-slice of a per-epoch permutation + gather + optional
horizontal flip + uint8→[-1,1] normalization), so the per-iteration host
cost is one async dispatch (~1 ms) and zero bulk transfer. A CIFAR-scale
uint8 store is 150 MB — noise next to the 16 GB+ of HBM per chip;
`fits_device` gates the auto-dispatch for stores that genuinely don't fit
(lazy LSUN/ImageFolder datasets keep the host pipeline).

Measured value (tools/ab_data_placement.py, alternating-block A/B on the
real chip, artifacts/ab_data_placement.json): on an IDLE host at CIFAR
scale the win is small — 7.78 vs 7.72 iters/s (+0.7%) — because the fused
train step (0.136 s, artifacts/train_step_profile.json) dominates and the
host feed pipelines behind it. (The endurance run's `time_s/data` ≈
0.05–0.19 s that originally motivated this module was async-dispatch wait
MISATTRIBUTED to the data phase — the host-side `device_put` blocks behind
the in-flight step; see StepTimer's attribution caveat.) The real wins:
(1) per-batch transfer volume scales with image area — at 256²
(celebaHQ preset, batch 128 = 100 MB float32 per iteration) the host path
is bandwidth-bound on the device link and the device feed measured
**7.76× end-to-end** (0.835 vs 0.108 iters/s,
artifacts/ab_data_placement_256.json): the difference between a
transfer-bound and a compute-bound training loop at the reference's
CelebA-HQ scale; (2) the feed needs zero host CPU, insulating throughput
from host contention on shared boxes (measured small at CIFAR scale —
+1.0% under 2 CPU hogs — because the native engine absorbs it, but the
device path cannot regress no matter what the host runs).

Semantics match `Loader(shuffle=True, drop_last=True)` exactly at the
invariant level: every epoch is a fresh uniform permutation, each image is
visited at most once per epoch (the `n % batch_size` tail of the epoch's
permutation is dropped, like drop_last), flips are per-sample
Bernoulli(0.5). The permutation stream is `jax.random` rather than
`np.random.RandomState`, so the visit ORDER differs from the host loaders
for the same seed — training semantics depend only on the invariants, not
on the order (the host loaders themselves already differ from the torch
reference's global-RNG order).

Sharding: with a mesh, the store is replicated across local devices once
at construction and every batch comes out sharded over the `data` axis —
the same placement `put_batch` produces, with no host round-trip.
Multi-host runs keep the host path (each host feeds its addressable
shard; see `driver_utils.put_batch`), enforced by the factory.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import Mesh, batch_sharding, replicated

# Stores larger than this stay on the host path. Sized so CelebA-HQ-256
# (30k images ≈ 5.9 GB uint8 — the reference's largest gen_recon store,
# and the regime where the device feed measured 7.8×) qualifies under
# `auto` while still leaving half of a 16 GB chip for model/optimizer
# state and Langevin chains; override per-run with
# TrainConfig.data_device_budget_gb.
DEFAULT_DEVICE_BUDGET_BYTES = 8 << 30


def fits_device(images, budget_bytes: int = DEFAULT_DEVICE_BUDGET_BYTES) -> bool:
    """Can `images` take the device-resident path? Requires a materialized
    uint8/float32 (N, H, W, C) ndarray under the byte budget (lazy
    batch-indexable datasets like LSUNImages cannot be bulk-transferred)."""
    return (
        isinstance(images, np.ndarray)
        and images.ndim == 4
        and images.dtype in (np.uint8, np.float32)
        and images.nbytes <= budget_bytes
    )


class DeviceDataset:
    """Epoch-shuffled, drop_last batch sampler living entirely on device.

    API-compatible with `Loader`: `stream()` yields `(batch, indices)`
    forever, batch float32 [-1, 1] NHWC — but both are committed
    `jax.Array`s (batch already carries the mesh `data` sharding), so the
    training loop feeds them straight into the jitted step with no
    `device_put`.
    """

    # Batches come out already transferred/sharded; the driver must not
    # wrap this in a host Prefetcher or call put_batch on its output.
    device_resident = True

    def __init__(
        self,
        images: np.ndarray,
        batch_size: int = 128,
        shuffle: bool = True,
        drop_last: bool = True,
        augment_flip: bool = False,
        seed: int = 0,
        mesh: Optional[Mesh] = None,
    ):
        if not (
            isinstance(images, np.ndarray)
            and images.ndim == 4
            and images.dtype in (np.uint8, np.float32)
        ):
            raise ValueError(
                "DeviceDataset wants a uint8/float32 (N, H, W, C) ndarray, "
                f"got {getattr(images, 'dtype', type(images))} "
                f"ndim={getattr(images, 'ndim', '?')}"
            )
        if not drop_last:
            raise ValueError(
                "DeviceDataset implements drop_last epochs only (all "
                "training feeds use drop_last; pad-tail eval sweeps use the "
                "host loaders)"
            )
        n = len(images)
        self.batch_size = int(batch_size)
        self.n_batches = n // self.batch_size
        if self.n_batches == 0:
            raise ValueError(
                f"DeviceDataset yields no batches: {n} images < batch_size "
                f"{batch_size} with drop_last"
            )
        if mesh is not None and jax.process_count() > 1:
            raise ValueError(
                "DeviceDataset is single-host only (multi-host runs feed "
                "per-host shards through put_batch/make_global_batch)"
            )
        self.n = n
        self.shuffle = shuffle
        self._key = jax.random.PRNGKey(seed)
        store = np.ascontiguousarray(images)
        self.data = jax.device_put(
            store, replicated(mesh) if mesh is not None else None
        )
        is_u8 = store.dtype == np.uint8
        out_sharding = batch_sharding(mesh) if mesh is not None else None
        bs = self.batch_size

        def fetch(data, perm, start, key):
            idx = jax.lax.dynamic_slice_in_dim(perm, start, bs)
            batch = jnp.take(data, idx, axis=0).astype(jnp.float32)
            if is_u8:
                # XLA lowers the division to a reciprocal multiply, which
                # puts 255 at 1.0000001; clamp (fused, free) so the range
                # invariant [-1, 1] holds bit-exactly like the host path.
                batch = jnp.clip(batch / 255.0 * 2.0 - 1.0, -1.0, 1.0)
            if augment_flip:
                flip = jax.random.bernoulli(key, 0.5, (bs,))
                batch = jnp.where(
                    flip[:, None, None, None], batch[:, :, ::-1, :], batch
                )
            return batch, idx

        # Indices replicate (they are bookkeeping, occasionally read back);
        # only the batch itself shards over `data`.
        self._fetch = jax.jit(
            fetch,
            out_shardings=(out_sharding, replicated(mesh))
            if mesh is not None
            else None,
        )
        self._perm = jax.jit(lambda k: jax.random.permutation(k, n))
        self._iota = jnp.arange(n) if not shuffle else None

    def __len__(self) -> int:
        return self.n_batches

    def stream(self) -> Iterator[Tuple[jax.Array, jax.Array]]:
        """Infinite epoch-cycling stream of device-resident batches.

        Each `next()` enqueues one small XLA program and returns without
        waiting for it — the async-dispatch queue overlaps batch
        construction with the in-flight train step for free.
        """
        epoch = 0
        while True:
            k_epoch = jax.random.fold_in(self._key, epoch)
            perm = self._perm(k_epoch) if self.shuffle else self._iota
            for b in range(self.n_batches):
                yield self._fetch(
                    self.data,
                    perm,
                    np.int32(b * self.batch_size),
                    jax.random.fold_in(k_epoch, b + 1),
                )
            epoch += 1
