from deeptreeattention_tpu.parallel.mesh import (
    make_mesh,
    resolve_mesh,
    shard_batch,
    replicate,
    prefetch_to_device,
    data_sharding,
)
