from dvmatcher_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding"]

# point-axis (sequence-parallel) extensions — imported lazily by users:
#   parallel.sharded_search    — sharded correspondence search/projection
#   parallel.sharded_attention — collective attention primitives
#   parallel.sharded_backbone  — full backbone forward, points sharded
