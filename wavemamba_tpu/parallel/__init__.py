from wavemamba_tpu.parallel.dist import get_dist_info, initialize, is_master, master_only
from wavemamba_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "initialize",
    "get_dist_info",
    "is_master",
    "master_only",
]
