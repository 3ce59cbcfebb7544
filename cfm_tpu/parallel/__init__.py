"""Distributed execution: meshes, multihost init, sharded training."""

from .mesh import (
    data_parallel_sharding,
    initialize_distributed,
    make_mesh,
    replicated_sharding,
    shard_batch_per_host,
)

__all__ = [
    "data_parallel_sharding",
    "initialize_distributed",
    "make_mesh",
    "replicated_sharding",
    "shard_batch_per_host",
]
