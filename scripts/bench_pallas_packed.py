"""Measure the round-2 packed Pallas kernel vs the XLA spectral forward on
the real chip. Methodology identical to bench.py (scan-chained iterations,
device->host read forces execution).

Usage: python scripts/bench_pallas_packed.py [batch_tile ...]
"""
import sys
import time

import numpy as np


def main():
    import jax

    from deeptreeattention_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from deeptreeattention_tpu.models.hang2020 import SpectralNetwork
    from deeptreeattention_tpu.ops import pallas_packed as pp

    BANDS, CLASSES, BATCH, ITERS = 349, 20, 4096, 8
    tiles = [int(a) for a in sys.argv[1:]] or [8, 16]

    model = SpectralNetwork(bands=BANDS, classes=CLASSES, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 11, 11, BANDS), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 11, 11, BANDS), jnp.float32))

    def timed(fn, label):
        @jax.jit
        def bench(variables, x):
            def body(carry, _):
                out = fn(variables, x + carry)
                return jnp.mean(out) * 1e-9, None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        float(bench(variables, x))
        float(bench(variables, x))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(bench(variables, x))
            times.append(time.perf_counter() - t0)
        rate = BATCH * ITERS / min(times)
        print("{}: {:,.0f} patches/s".format(label, rate), flush=True)
        return rate

    xla_rate = timed(
        lambda v, xx: model.apply(v, xx, train=False)[-1], "XLA spectral forward"
    )
    for bt in tiles:
        try:
            timed(
                lambda v, xx, bt=bt: pp.spectral_infer_packed(v, xx, batch_tile=bt),
                "packed pallas bt={}".format(bt),
            )
        except Exception as e:
            print("packed bt={} FAILED: {}".format(bt, str(e)[-500:]), flush=True)
    print("xla baseline {:,.0f}".format(xla_rate))


if __name__ == "__main__":
    main()
