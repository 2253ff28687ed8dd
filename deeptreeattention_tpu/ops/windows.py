"""On-device window extraction from whole tiles.

The reference materializes per-crown crops as files and reloads them
(reference src/generate.py:243-373, src/patches.py:50-83). The TPU-native
fast path streams a tile (or tile slab) into HBM once and gathers every
11x11 window on device — window extraction, preprocessing, and the model
forward fuse into one XLA program, and the window axis shards over the mesh
like any batch axis.

Shapes are static: callers pad the anchor list to a fixed budget and mask.
"""
import jax
import jax.numpy as jnp
import numpy as np

from deeptreeattention_tpu.ops.preprocess import minmax_scale_pixels


def extract_windows(tile, anchors, size=11):
    """Gather [N, size, size, C] windows from a [H, W, C] tile.

    anchors: [N, 2] int32 (row, col) top-left corners, pre-clamped or not —
    they are clamped here so edge windows stay in-bounds (reference uses
    boundless zero-padded reads; clamping keeps real data instead and is
    masked out by the caller when exact parity is required).
    """
    h, w, _ = tile.shape
    anchors = jnp.asarray(anchors, jnp.int32)
    rows = jnp.clip(anchors[:, 0], 0, h - size)
    cols = jnp.clip(anchors[:, 1], 0, w - size)

    def one(r, c):
        return jax.lax.dynamic_slice(tile, (r, c, 0), (size, size, tile.shape[2]))

    return jax.vmap(one)(rows, cols)


def preprocess_windows(windows, clip=10):
    """Band-clip + per-pixel min-max on gathered windows (fused under jit).

    Integer windows (int16 NEON tiles stream to device in their file dtype)
    stay integer through the min/max reductions — see
    ops.preprocess.minmax_scale_pixels."""
    if windows.shape[-1] > 3 and clip:
        windows = windows[..., clip:-clip]
    return minmax_scale_pixels(windows)


def crown_resize_windows(tile, bounds_px, size=11, boundless=False):
    """Per-crown crop + NEAREST resize as one device gather.

    tile: [H, W, C]; bounds_px: [N, 4] int32 (row0, col0, height, width) pixel
    rectangles. Returns [N, size, size, C] — bit-equal to cropping each
    rectangle on host and NEAREST-resizing (ops.preprocess.nearest_resize /
    reference load_image). Out-of-tile source indices are clamped to the
    edge, or zero-filled with boundless=True (rasterio's boundless-read
    semantics, used by the alive/dead window path).
    """
    h, w, _ = tile.shape
    bounds_px = jnp.asarray(bounds_px, jnp.int32)
    r0, c0 = bounds_px[:, 0], bounds_px[:, 1]
    hh = jnp.maximum(bounds_px[:, 2], 1)
    ww = jnp.maximum(bounds_px[:, 3], 1)
    grid = jnp.arange(size)
    rows = r0[:, None] + (grid[None, :] * hh[:, None]) // size  # [N, size]
    cols = c0[:, None] + (grid[None, :] * ww[:, None]) // size
    rows_c = jnp.clip(rows, 0, h - 1)
    cols_c = jnp.clip(cols, 0, w - 1)

    def one(rr, cc):
        return tile[rr[:, None], cc[None, :], :]

    out = jax.vmap(one)(rows_c, cols_c)
    if boundless:
        rv = (rows >= 0) & (rows < h)
        cv = (cols >= 0) & (cols < w)
        valid = rv[:, :, None] & cv[:, None, :]  # [N, size, size]
        out = jnp.where(valid[..., None], out, jnp.zeros((), out.dtype))
    return out


def crown_resize_windows_mm(tile, bounds_px, size=224, slab=256,
                            dtype=jnp.bfloat16):
    """Selection-matmul formulation of crown_resize_windows(boundless=True)
    for LARGE window sizes (the alive/dead 224x224 path).

    The advanced-indexing gather dominates dead scoring on TPU: measured
    2.5k windows/s for gather+normalize alone vs 4.2k/s for the whole
    ResNet-50 forward (scripts/bench_dead_probe.py). Here each crown's
    bounding slab moves with ONE dynamic-slice DMA and the NEAREST resize
    becomes two one-hot matmuls (row-select [size, S] @ slab [S, S, C] @
    col-select [S, size]) — ~60 MFLOP/crown of MXU work instead of a 50k-
    offset gather.

    EXACT-parity with the gather path: one-hot rows are all-zero for
    out-of-tile indices (rasterio boundless zero-fill), uint8 values and
    one-hot weights are exact in bf16, and each output accumulates exactly
    one product in the f32 accumulator.

    slab: static bound on crown height/width in px (round the sweep's max
    rect dimension up; predict_crowns_ondevice does this per call).
    """
    h, w, c = tile.shape
    bounds_px = jnp.asarray(bounds_px, jnp.int32)
    r0, c0 = bounds_px[:, 0], bounds_px[:, 1]
    hh = jnp.maximum(bounds_px[:, 2], 1)
    ww = jnp.maximum(bounds_px[:, 3], 1)
    grid = jnp.arange(size)
    rows = r0[:, None] + (grid[None, :] * hh[:, None]) // size  # [N, size] abs
    cols = c0[:, None] + (grid[None, :] * ww[:, None]) // size

    sr = min(slab, h)
    sc = min(slab, w)
    start_r = jnp.clip(r0, 0, h - sr)
    start_c = jnp.clip(c0, 0, w - sc)
    rel_r = rows - start_r[:, None]
    rel_c = cols - start_c[:, None]
    # in-tile AND inside the slab; everything else zero-fills via an
    # all-zero one-hot row (out-of-slab in-tile rows cannot happen when
    # slab >= the crown dimension — the caller guarantees that)
    ok_r = (rows >= 0) & (rows < h) & (rel_r >= 0) & (rel_r < sr)
    ok_c = (cols >= 0) & (cols < w) & (rel_c >= 0) & (rel_c < sc)
    rsel = ((rel_r[:, :, None] == jnp.arange(sr)[None, None, :]) & ok_r[:, :, None])
    csel = ((rel_c[:, :, None] == jnp.arange(sc)[None, None, :]) & ok_c[:, :, None])

    def one(a, b):
        return jax.lax.dynamic_slice(tile, (a, b, 0), (sr, sc, c))

    slabs = jax.vmap(one)(start_r, start_c).astype(dtype)  # [N, sr, sc, C]
    # rows: [N, size, sr] @ [N, sr, sc*C] -> [N, size, sc, C]
    y = jnp.einsum("nps,nsqc->npqc", rsel.astype(dtype), slabs,
                   preferred_element_type=jnp.float32).astype(dtype)
    # cols: [N, size, sc, C] x [N, size(out), sc] -> [N, size, size, C]
    out = jnp.einsum("npqc,ntq->nptc", y, csel.astype(dtype),
                     preferred_element_type=jnp.float32)
    return out


def crown_pixel_anchors(bounds_list, transform, size=11, budget=None):
    """Host-side: crown UTM bounds -> (anchors [N,2], crown_ids [N]).

    Every pixel whose center lies inside a crown's bounds contributes one
    window anchored at that pixel (reference per-pixel window semantics,
    src/patches.py:50-83). Pixel enumeration uses the same Window.round()
    math as the host path (data/patches.row_col_from_bounds) so both
    backends see identical windows. Returns padded arrays when budget is
    given.
    """
    from deeptreeattention_tpu.geo.affine import window_from_bounds

    anchors = []
    crown_ids = []
    for ci, (left, bottom, right, top) in enumerate(bounds_list):
        win = window_from_bounds(left, bottom, right, top, transform).round()
        for r in range(win.row_off, win.row_off + win.height):
            for c in range(win.col_off, win.col_off + win.width):
                anchors.append((r, c))
                crown_ids.append(ci)
    anchors = np.asarray(anchors, np.int32).reshape(-1, 2)
    crown_ids = np.asarray(crown_ids, np.int32)
    mask = np.ones(len(crown_ids), bool)
    if budget is not None:
        if len(anchors) > budget:
            anchors, crown_ids, mask = anchors[:budget], crown_ids[:budget], mask[:budget]
        else:
            pad = budget - len(anchors)
            anchors = np.concatenate([anchors, np.zeros((pad, 2), np.int32)])
            crown_ids = np.concatenate([crown_ids, np.full(pad, -1, np.int32)])
            mask = np.concatenate([mask, np.zeros(pad, bool)])
    return anchors, crown_ids, mask


def aggregate_crown_scores(probs, crown_ids, n_crowns, mask=None):
    """Mean per-crown softmax over the crown's pixel windows (device-side
    segment mean; the per-pixel -> per-crown reduction of the reference's
    gather_predictions, kept on device)."""
    probs = jnp.asarray(probs)
    if mask is not None:
        probs = probs * mask[:, None].astype(probs.dtype)
        weights = mask.astype(probs.dtype)
    else:
        weights = jnp.ones(probs.shape[0], probs.dtype)
    ids = jnp.clip(crown_ids, 0, n_crowns - 1)
    sums = jax.ops.segment_sum(probs, ids, num_segments=n_crowns)
    counts = jax.ops.segment_sum(weights, ids, num_segments=n_crowns)
    return sums / jnp.maximum(counts[:, None], 1.0)


def make_tile_predictor(apply_fn, size=11, clip=10, mesh=None):
    """jit-compiled: (variables, tile, anchors, crown_ids, mask, n_crowns)
    -> per-crown mean probabilities. One XLA program for the whole
    tile-inference inner loop.

    With a mesh, the window axis shards over it via shard_map (params and
    tile replicated, anchors/probs split) — the SURVEY §5 "batch-shard the
    pixel-window axis over ICI" production path. The anchor budget must be a
    multiple of the mesh size (crown_pixel_anchors pads to any budget)."""

    from functools import partial

    def forward(variables, tile, anchors):
        windows = extract_windows(tile, anchors, size=size)
        x = preprocess_windows(windows, clip=clip)
        logits = apply_fn(variables, x)
        if isinstance(logits, (list, tuple)):
            logits = logits[-1]
        return jax.nn.softmax(logits, axis=-1)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from deeptreeattention_tpu.parallel.inference import _shard_map

        axis = mesh.axis_names[0]
        sharded_forward = _shard_map(
            forward, mesh, in_specs=(P(), P(), P(axis)), out_specs=P(axis)
        )

        @partial(jax.jit, static_argnums=(5,))
        def predict(variables, tile, anchors, crown_ids, mask, n_crowns):
            probs = sharded_forward(variables, tile, anchors)
            return aggregate_crown_scores(probs, crown_ids, n_crowns, mask=mask)

        return predict

    @partial(jax.jit, static_argnums=(5,))
    def predict(variables, tile, anchors, crown_ids, mask, n_crowns):
        probs = forward(variables, tile, anchors)
        return aggregate_crown_scores(probs, crown_ids, n_crowns, mask=mask)

    return predict
