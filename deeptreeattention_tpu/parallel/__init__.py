from deeptreeattention_tpu.parallel.mesh import (
    make_mesh,
    resolve_mesh,
    shard_batch,
    replicate,
    prefetch_to_device,
    data_sharding,
    spans_processes,
    gather_to_host,
)
