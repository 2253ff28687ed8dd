"""Host-side work pool — the dask.distributed/SLURMCluster replacement.

The reference fans IO-bound ETL out to dask workers provisioned by SLURM
(reference src/start_cluster.py:49-101 and the client.submit call sites in
src/data.py:180-203, src/generate.py:205-225,325-345). On a TPU host the
equivalent is a local process/thread pool with the same client surface
(submit/map/wait/result/exception), so every call site is pool-agnostic; a
SLURM launcher script (SLURM/ in this repo) provisions multiple hosts, each
running the same entry point over a shard of the tile list — work division by
contract (idempotent per-tile outputs) instead of a central scheduler.
"""
import concurrent.futures
import multiprocessing
import os
import socket

from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)


class Future:
    """Thin wrapper with a dask-like surface over concurrent.futures."""

    def __init__(self, inner):
        self._inner = inner

    def result(self, timeout=None):
        return self._inner.result(timeout=timeout)

    def exception(self, timeout=None):
        return self._inner.exception(timeout=timeout)

    def done(self):
        return self._inner.done()


class LocalClient:
    """submit/map/wait/close over a thread or process pool.

    Threads are the default: the ETL workloads are numpy/IO dominated and
    release the GIL; threads also share the raster tile cache. Use
    processes=True for CPU-bound pure-Python stages.
    """

    def __init__(self, workers=None, processes=False):
        workers = workers or max(multiprocessing.cpu_count() - 1, 1)
        if processes:
            self._pool = concurrent.futures.ProcessPoolExecutor(max_workers=workers)
        else:
            self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=workers)
        self.workers = workers

    def submit(self, fn, *args, **kwargs):
        return Future(self._pool.submit(fn, *args, **kwargs))

    def map(self, fn, iterable, **kwargs):
        return [self.submit(fn, item, **kwargs) for item in iterable]

    @staticmethod
    def wait(futures, timeout=None):
        concurrent.futures.wait([f._inner for f in futures], timeout=timeout)
        return futures

    def gather(self, futures, skip_errors=False):
        """dask semantics by default: a failed task raises (len(out) ==
        len(futures) is guaranteed); skip_errors=True opts into the
        reference pipeline's log-and-continue behavior."""
        self.wait(futures)
        out = []
        for f in futures:
            if f.exception() is not None:
                if skip_errors:
                    log.warning("task failed: %s", f.exception())
                    continue
                raise f.exception()
            out.append(f.result())
        return out

    def close(self):
        self._pool.shutdown(wait=True)

    def run_on_scheduler(self, fn, *args, **kwargs):
        return fn(*args, **kwargs)


def wait(futures, timeout=None):
    return LocalClient.wait(futures, timeout=timeout)


def start(cpus=0, gpus=0, mem_size=None, processes=False):
    """Start a work pool. `cpus`/`gpus`/`mem_size` keep the reference's
    signature; locally they size the pool."""
    workers = max(int(cpus) or int(gpus) or 1, 1)
    log.info("starting local pool with %d workers on %s", workers, socket.gethostname())
    return LocalClient(workers=workers, processes=processes)


def start_tunnel():
    """Print how to reach this host (the dashboard-tunnel helper analogue)."""
    host = socket.gethostname()
    print("host: {} (pid {})".format(host, os.getpid()))
