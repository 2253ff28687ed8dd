"""On-device crown detection: the whole-tile detection pipeline as one XLA
program.

The reference delegates crown detection to DeepForest's RetinaNet on 400-px
windows swept in a host loop (reference src/generate.py:17-60,
src/predict.py:112-138). This module is the TPU redesign of the in-house
classical detector (data/detection.py): gaussian smoothing is a separable
conv, local-maxima extraction is a max-pool equality, peak selection is a
top-k, and box growth is a vmapped directional profile scan — all static
shapes, so a 10k x 10k tile surface runs as a single jit call instead of a
host-serial patch sweep.

Semantics match the scipy implementation (reflect-padded gaussian with
truncate=4, maximum-filter equality peaks, greedy growth to the first pixel
below edge_fraction x peak) so the two backends are interchangeable.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel(sigma, truncate=4.0):
    """1-D gaussian weights, scipy.ndimage.gaussian_filter parity."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    w = np.exp(-0.5 * (x / sigma) ** 2)
    return (w / w.sum()).astype(np.float32)


def smooth_surface(surface, kernel):
    """Separable gaussian smoothing of a [H, W] surface.

    Border mode is "symmetric" — scipy.ndimage.gaussian_filter's default
    'reflect' is numpy's SYMMETRIC (edge pixel repeated), not numpy's
    'reflect'; using the wrong one shifts every smoothed value within a
    kernel radius of the tile edge. Pad width clamps to the surface size so
    tiny patches degrade instead of crashing."""
    k = jnp.asarray(kernel)
    r = (k.shape[0] - 1) // 2
    h, w = surface.shape
    rh, rw = min(r, h), min(r, w)
    x = jnp.pad(surface, ((rh, rh), (rw, rw)), mode="symmetric")
    if rh < r or rw < r:
        # surface smaller than the kernel radius: top up with edge values
        x = jnp.pad(x, ((r - rh, r - rh), (r - rw, r - rw)), mode="edge")
    # rows then cols; conv via correlate (gaussian is symmetric)
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(x)
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1, out_axes=1)(x)
    return x


def _local_max(smoothed, min_distance):
    win = 2 * min_distance + 1
    return jax.lax.reduce_window(
        smoothed, -jnp.inf, jax.lax.max, (win, win), (1, 1), "SAME"
    )


def make_detector(sigma, min_distance, max_size, min_size=2, edge_fraction=0.6,
                  thr_quantile=0.5, budget=512):
    """jit detection fn: surface [H, W] f32 ->
    (boxes_px [budget, 4] xmin/ymin/xmax/ymax, scores [budget], valid [budget]).

    All parameters are static (pixels); one compiled program per tile shape.
    """
    kernel = gaussian_kernel(sigma)
    steps = np.arange(1, max_size + 1, dtype=np.int32)
    dirs = np.asarray([(-1, 0), (1, 0), (0, -1), (0, 1)], np.int32)  # up/down/left/right

    @jax.jit
    def detect(surface):
        sm = smooth_surface(surface.astype(jnp.float32), kernel)
        h, w = sm.shape
        thr = jnp.quantile(sm, thr_quantile)
        is_peak = (sm == _local_max(sm, min_distance)) & (sm > thr)
        flat = jnp.where(is_peak, sm, -jnp.inf).ravel()
        scores, idx = jax.lax.top_k(flat, budget)
        valid = jnp.isfinite(scores)
        rr = idx // w
        cc = idx % w

        def grow_one(r, c, peak_val):
            cutoff = peak_val * edge_fraction
            pr = r[None, None] + dirs[:, :1] * steps[None, :]  # [4, max_size]
            pc = c[None, None] + dirs[:, 1:] * steps[None, :]
            oob = (pr < 0) | (pr >= h) | (pc < 0) | (pc >= w)
            vals = sm[jnp.clip(pr, 0, h - 1), jnp.clip(pc, 0, w - 1)]
            below = oob | (vals < cutoff)
            n = jnp.where(below.any(axis=1), jnp.argmax(below, axis=1), max_size)
            return jnp.maximum(n, min_size)  # [4] up/down/left/right

        grown = jax.vmap(grow_one)(rr, cc, scores)  # [budget, 4]
        up, down, left, right = grown[:, 0], grown[:, 1], grown[:, 2], grown[:, 3]
        boxes = jnp.stack(
            [
                jnp.maximum(cc - left, 0).astype(jnp.float32),
                jnp.maximum(rr - up, 0).astype(jnp.float32),
                jnp.minimum(cc + right, w - 1).astype(jnp.float32),
                jnp.minimum(rr + down, h - 1).astype(jnp.float32),
            ],
            axis=1,
        )
        peak_max = jnp.max(sm)
        conf = jnp.where(valid, jnp.minimum(scores / (peak_max + 1e-9), 1.0), 0.0)
        return boxes, conf, valid

    return detect


@partial(jax.jit, static_argnums=())
def brightness_surface(image):
    """[H, W, C] -> [H, W] mean-band brightness (the detection surface)."""
    return jnp.mean(image.astype(jnp.float32), axis=-1)
