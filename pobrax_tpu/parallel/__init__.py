"""Distribution layer: device meshes, shardings, multi-host bring-up."""

from pobrax_tpu.parallel.mesh import (
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "data_sharding",
    "initialize_distributed",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
