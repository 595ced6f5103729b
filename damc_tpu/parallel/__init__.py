"""Mesh / sharding helpers for multi-chip data-parallel chains."""

from .distributed import global_mesh, initialize_distributed, make_global_batch
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "global_mesh",
    "initialize_distributed",
    "make_global_batch",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "pad_to_multiple",
    "replicate",
    "replicated",
    "shard_batch",
]
