"""Multi-host (DCN) support: process initialization + global mesh.

The reference is strictly single-process/single-GPU (SURVEY.md §2.6); this is
the greenfield TPU-native equivalent: `jax.distributed.initialize` across
hosts, a global (data, model) mesh spanning all processes, per-host data
feeding with `make_global_batch`, and metric reduction via replicated-output
pjit (XLA psum over ICI within a slice, DCN across slices).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, make_mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-op in single-process settings.

    On TPU pods the arguments are auto-detected from the environment
    (`jax.distributed.initialize()` with no args); pass them explicitly for
    manual setups.
    """
    # NOTE: do NOT probe jax.process_count()/jax.devices() here — any backend
    # query initializes XLA, after which jax.distributed.initialize refuses
    # to run. jax.distributed.is_initialized() is the public, equally lazy
    # check (fall back to the private client state on older jax).
    if hasattr(jax.distributed, "is_initialized"):
        if jax.distributed.is_initialized():
            return
    else:  # pragma: no cover - older jax
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return
    explicit = coordinator_address is not None or num_processes is not None
    try:
        if explicit:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
    except (ValueError, RuntimeError) as e:
        if explicit:
            # An explicitly requested pod setup that fails is a real
            # misconfiguration — do not mask it as "single process".
            raise
        import logging

        logging.getLogger(__name__).info(
            "jax.distributed not initialized (single-process environment "
            "assumed): %s", e,
        )


def global_mesh(n_model: int = 1) -> Mesh:
    """(data, model) mesh over ALL devices of ALL processes."""
    return make_mesh(n_model=n_model, devices=jax.devices())


def make_global_batch(mesh: Mesh, host_batch: np.ndarray) -> jax.Array:
    """Assemble a global, data-sharded array from per-host shards.

    Each process passes its LOCAL slice of the global batch (global batch
    size = local * process_count); rows land on that process's devices.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    global_shape = (host_batch.shape[0] * jax.process_count(), *host_batch.shape[1:])
    return jax.make_array_from_process_local_data(sharding, host_batch, global_shape)
