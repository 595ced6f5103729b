"""Mesh / sharding helpers for multi-chip data-parallel chains."""

from .distributed import global_mesh, initialize_distributed, make_global_batch
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .tp import channel_sharding_spec, channel_sharding_tree, shard_params_channelwise

__all__ = [
    "channel_sharding_spec",
    "channel_sharding_tree",
    "shard_params_channelwise",
    "global_mesh",
    "initialize_distributed",
    "make_global_batch",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
