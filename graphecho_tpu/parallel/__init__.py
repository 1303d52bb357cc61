from graphecho_tpu.parallel.mesh import (
    create_mesh,
    shard_batch,
    replicate,
    initialize_distributed,
)

__all__ = ["create_mesh", "shard_batch", "replicate", "initialize_distributed"]
