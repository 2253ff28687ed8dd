"""Subprocess body for the two-process jax.distributed smoke test.

Usage: python tests/distributed_worker.py <process_id> <num_processes> <port>
Prints "DISTOK <total>" where total is a cross-process all-reduce result.
"""
import sys


def main():
    process_id, num_processes, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from deeptreeattention_tpu.parallel import distributed as D

    assert D.initialize(
        coordinator_address="localhost:{}".format(port),
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    mesh = D.make_pod_mesh()
    assert mesh.devices.size == 2 * num_processes, mesh.devices.shape

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    sharding = NamedSharding(mesh, P(("slice", "data")))
    # each process contributes its local shards of [0, 1, ..., n)
    arr = jax.make_array_from_callback(
        (n,), sharding, lambda idx: np.arange(n, dtype=np.float32)[idx]
    )
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    # device->host read forces the cross-process reduction
    total = float(np.asarray(jax.device_get(total)))
    sl = D.local_batch_slice(8)
    assert sl == slice(4 * process_id, 4 * process_id + 4), sl
    print("DISTOK {:.1f}".format(total), flush=True)


if __name__ == "__main__":
    main()
