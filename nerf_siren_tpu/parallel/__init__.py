from nerf_siren_tpu.parallel.mesh import (
    make_mesh,
    shard_rays,
    replicate,
    data_sharding,
    replicated_sharding,
)

__all__ = [
    "make_mesh",
    "shard_rays",
    "replicate",
    "data_sharding",
    "replicated_sharding",
]
