from efficientsam3_tpu.parallel.sharding import (
    frame_parallel,
    make_mesh,
    object_parallel,
    replicate,
    shard_batch,
)

__all__ = [
    "frame_parallel",
    "make_mesh",
    "object_parallel",
    "replicate",
    "shard_batch",
]
