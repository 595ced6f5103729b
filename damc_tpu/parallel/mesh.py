"""Device mesh + sharding helpers (the reference has NO distributed layer).

Greenfield per SURVEY.md §2.6: data parallelism over TPU chips via a
(`data`, `model`) mesh; Langevin/diffusion chains are a batch axis that
shards over `data`, params are replicated, and XLA inserts the gradient
psum over ICI. The `model` axis is kept for future model-sharding of the
large StyleGAN synthesis stack (N/A for the core nets, documented in
SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis — chain parallelism is the
    dominant parallel structure in DAMC (B posterior + 2B prior chains).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_model != 0:
            # Silently building a smaller mesh would leave chips idle with
            # every throughput number quietly wrong for the assumed topology.
            raise ValueError(
                f"make_mesh: n_model={n_model} does not divide the "
                f"{len(devices)} available devices; pass n_data explicitly "
                "to intentionally use a subset"
            )
        n_data = len(devices) // n_model
    mesh_devices = mesh_utils.create_device_mesh(
        (n_data, n_model), devices=devices[: n_data * n_model]
    )
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (chain/batch) axis over `data`."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the leading axis sharded over `data`."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh.

    On a multi-host mesh a plain device_put would target non-addressable
    devices; instead each process contributes its (identical, same-seed)
    local copy via make_array_from_process_local_data — for a fully
    replicated spec the local data IS the global array."""
    sh = replicated(mesh)
    if any(d.process_index != jax.process_index() for d in mesh.devices.flat):
        import numpy as np

        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree,
        )
    return jax.device_put(tree, sh)
