from deeptreeattention_tpu.cluster.pool import start, LocalClient, Future
