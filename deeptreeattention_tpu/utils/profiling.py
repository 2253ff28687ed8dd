"""Tracing / profiling as a first-class module.

The reference profiles with Lightning's simple profiler + whole-run cProfile
(reference train.py:98, SLURM/predict.sh:21). TPU-native equivalents here:

  * `trace(logdir)`            — jax.profiler device trace (view in
                                 TensorBoard or xprof).
  * `annotate(name)`           — named trace region (shows in the trace).
  * `StageTimer`               — per-pipeline-stage wall-clock aggregation,
                                 logged through any experiment object.
  * `cprofile_to(path)`        — host-side cProfile context for ETL stages.
"""
import contextlib
import cProfile
import pstats
import time
from collections import defaultdict

from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)


@contextlib.contextmanager
def trace(logdir="results/jax_trace"):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        log.info("jax trace written to %s", logdir)


def annotate(name):
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def cprofile_to(path):
    prof = cProfile.Profile()
    prof.enable()
    try:
        yield prof
    finally:
        prof.disable()
        prof.dump_stats(path)
        stats = pstats.Stats(path).sort_stats("cumulative")
        log.info("cProfile written to %s (top entries below)", path)
        stats.print_stats(10)


class StageTimer:
    """Accumulates wall-clock per named stage; `with timer.stage("crops"):`."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self):
        return {
            name: {"total_s": round(self.totals[name], 3), "calls": self.counts[name]}
            for name in sorted(self.totals)
        }

    def log(self, experiment=None):
        for name, info in self.summary().items():
            log.info("stage %-24s %8.2fs over %d calls", name, info["total_s"], info["calls"])
            if experiment:
                experiment.log_metric("stage_{}_seconds".format(name), info["total_s"])
        return self.summary()
