"""Landscape tile prediction pipeline.

Capability parity with reference src/predict.py:29-168: per RGB tile —
detect crowns (find_crowns), CHM-filter, score alive/dead, cut per-year HSI
crops (generate_prediction_crops), run the MultiStage hierarchy over every
crown (predict_species), apply the decision-tree ensemble, mask
high-confidence dead crowns, and write the tile shapefile (predict_tile).
Each stage's output is an idempotent file, so tile sweeps resume.
"""
import glob
import os

import numpy as np

from deeptreeattention_tpu.data import detection
from deeptreeattention_tpu.data.chm import postprocess_CHM
from deeptreeattention_tpu.data.crops import generate_crops
from deeptreeattention_tpu.data.dataset import TreeDataset
from deeptreeattention_tpu.geo import raster, vector
from deeptreeattention_tpu.geo.geometry import Box
from deeptreeattention_tpu.models import dead as dead_mod
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)


def predict_crowns(path, detector=None, config=None):
    """Detect crowns over a whole RGB tile -> UTM crown GeoDataFrame with the
    pipeline's schema columns."""
    detector = detector or detection.load_detector(config)
    boxes = detector.predict_tile(path)
    if boxes is None or boxes.empty:
        return None
    with raster.open_raster(path) as src:
        t = src.transform
        crs = src.crs
    geoms = [
        Box(
            t.a * row.xmin + t.c,
            t.f + t.e * row.ymax,
            t.a * row.xmax + t.c,
            t.f + t.e * row.ymin,
        )
        for row in boxes.itertuples()
    ]
    gdf = vector.GeoDataFrame(
        boxes.drop(columns=["xmin", "ymin", "xmax", "ymax"]), geometry=geoms, crs=crs
    )
    basename = os.path.splitext(os.path.basename(path))[0]
    gdf["individual"] = ["{}_{}".format(i, basename) for i in range(len(gdf))]
    for col in ["plotID", "siteID", "box_id", "taxonID"]:
        gdf[col] = None
    gdf["RGB_tile"] = path
    return gdf


def find_crowns(rgb_path, config, dead_model_path=None, detector=None, dead_model=None):
    """Crown detection + CHM filter + alive/dead scoring for one tile."""
    crowns = predict_crowns(rgb_path, detector=detector, config=config)
    if crowns is None:
        return None
    crowns["tile"] = rgb_path

    if config.get("CHM_pool"):
        chm_pool = glob.glob(config["CHM_pool"], recursive=True)
        crowns = postprocess_CHM(crowns, chm_pool)
        filtered = crowns[crowns.CHM_height.astype(float) > 3]
    else:
        filtered = crowns
    if filtered.empty:
        raise ValueError("No crowns left after CHM filter for {}".format(rgb_path))
    filtered = vector.GeoDataFrame(filtered.reset_index(drop=True),
                                   crs=getattr(crowns, "crs", None))

    if dead_model_path or dead_model is not None:
        label, score = predict_dead(
            crowns=filtered, dead_model_path=dead_model_path, config=config,
            dead_model=dead_model,
        )
        filtered["dead_label"] = label
        filtered["dead_score"] = score
    return filtered


def predict_dead(crowns, dead_model_path=None, config=None, dead_model=None):
    """Alive/dead scores for crown RGB windows.

    Keeps the reference's intentional quirk of scoring with batch (not
    running) statistics at prediction time (reference src/predict.py:156)."""
    if dead_model is None:
        dead_model = dead_mod.AliveDead.load_from_checkpoint(dead_model_path, config=config)
    if config.get("ondevice_dead"):
        # tile-resident scoring: one uint8 tile upload, windows gathered on
        # device (bit-equal to the UTMDataset path; models/dead.py)
        probs = dead_model.predict_crowns_ondevice(
            crowns, batch_size=config["dead"]["batch_size"]
        )
    else:
        ds = dead_mod.UTMDataset(crowns=crowns, config=config)
        probs = dead_model.predict_dataset(ds, batch_size=config["dead"]["batch_size"])
    return np.argmax(probs, 1), np.max(probs, 1)


def generate_prediction_crops(crowns, config, client=None, as_numpy=True):
    """Per-year .npy crops + a sidecar shapefile carrying dead scores."""
    annotations = generate_crops(
        crowns,
        savedir=config["prediction_crop_dir"],
        sensor_glob=config["HSI_sensor_pool"],
        convert_h5=config["convert_h5"],
        rgb_glob=config["rgb_sensor_pool"],
        HSI_tif_dir=config.get("HSI_tif_dir"),
        client=client,
        as_numpy=as_numpy,
    )
    if annotations is None or len(annotations) == 0:
        # no HSI coverage for this tile's geo-index: nothing to crop
        log.warning("no prediction crops generated (no HSI tile coverage?)")
        return None
    rgb_path = annotations.RGB_tile.unique()[0]
    basename = os.path.splitext(os.path.basename(rgb_path))[0]
    annotations = vector.GeoDataFrame(annotations, crs=getattr(crowns, "crs", None))
    cols = [c for c in ["individual", "dead_label", "dead_score"] if c in crowns.columns]
    merged = annotations.merge(crowns[cols], on="individual")
    out = vector.GeoDataFrame(merged, crs=getattr(crowns, "crs", None))
    path = os.path.join(config["prediction_crop_dir"], "{}.shp".format(basename))
    out.to_file(path)
    return path


def predict_species(crowns, m, config):
    """All 5 hierarchy levels over every crown -> gathered + ensembled df."""
    cfg = dict(config)
    cfg["crop_dir"] = config["prediction_crop_dir"]
    ds = TreeDataset(df=crowns, train=False, config=cfg, years=m.years)
    predictions = m.predict(m.predict_dataloader(ds))
    if not predictions:
        return None
    results = m.gather_predictions(predictions)
    results = m.ensemble(results)
    return results.merge(crowns, on="individual")


_YEAR_IMAGES_JIT = None
_PACK_LEVELS_JIT = None


def _pack_levels(level_probs):
    """Concat per-level prob arrays [B, C_l] into one [B, sum(C_l)] device
    array: the landscape sweep reads each chunk back through the relay, and
    one read per chunk beats one per (chunk, level) — measured ~1.1 s RTT
    per read on the axon relay (docs/PERF.md e2e tile section)."""
    global _PACK_LEVELS_JIT
    if _PACK_LEVELS_JIT is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def fn(probs):
            return jnp.concatenate([p.astype(jnp.float32) for p in probs], axis=1)

        _PACK_LEVELS_JIT = fn
    return _PACK_LEVELS_JIT(tuple(level_probs))


def _year_images(tile, rect, size):
    """Module-level jitted window chain (gather + band clip + min-max):
    compiled once per shape for the whole landscape sweep — a per-call jit
    closure would recompile per tile through the slow axon relay."""
    global _YEAR_IMAGES_JIT
    if _YEAR_IMAGES_JIT is None:
        from functools import partial

        import jax

        from deeptreeattention_tpu.ops.preprocess import BAND_CLIP, minmax_scale_pixels
        from deeptreeattention_tpu.ops.windows import crown_resize_windows

        @partial(jax.jit, static_argnums=(2,))
        def fn(tile, rect, size):
            win = crown_resize_windows(tile, rect, size=size)
            if win.shape[-1] > 3:
                win = win[..., BAND_CLIP:-BAND_CLIP]
            return minmax_scale_pixels(win)

        _YEAR_IMAGES_JIT = fn
    return _YEAR_IMAGES_JIT(tile, rect, size)


def predict_species_ondevice(crowns, hsi_tile_paths, m, config, chunk=512, mesh=None,
                             slab_rows=None):
    """Crop-file-free species prediction: stream the per-year HSI tiles to
    HBM, gather every crown window + NEAREST resize + preprocess on device,
    and run all hierarchy levels — the TPU-native fast path that replaces
    generate_prediction_crops + .npy reloading.

    hsi_tile_paths: {tile_year: path} covering the crowns' tile. Years absent
    from m.years are ignored; m.years absent here yield zero images (masked
    out by the year ensemble).

    mesh (default: m.mesh) shards each crown chunk's batch axis over the
    devices, params replicated — the landscape sweep runs data-parallel over
    ICI (SURVEY §5). Chunks are padded to the mesh size and stripped after.

    slab_rows (default: config["ondevice_slab_rows"]) bounds HBM: instead of
    resident whole per-year tiles (~1.5 GB/year for a 1 km^2 369-band f32
    tile), crowns are processed in row-sorted chunks and only a fixed
    slab_rows-tall row slab per year is transferred per chunk — identical
    results to the whole-tile path (windows are self-contained in their
    slab; tested). Transfers are double-buffered: slab k+1 uploads while
    chunk k computes.
    """
    import jax
    import jax.numpy as jnp

    from deeptreeattention_tpu.parallel import data_sharding

    mesh = mesh if mesh is not None else getattr(m, "mesh", None)
    if slab_rows is None:
        slab_rows = config.get("ondevice_slab_rows")

    size = config["image_size"]
    bands = config["bands"]

    # host tiles + pixel bounds per crown per year (transforms can differ)
    hsi_tile_paths = {str(y): p for y, p in hsi_tile_paths.items()}
    host_tiles = {}
    bounds_px = {}
    for year, path in hsi_tile_paths.items():
        with raster.open_raster(path) as src:
            arr = src.read()  # [C, H, W]
            t = src.transform
        # keep the file dtype: NEON reflectance is int16 — half the host RAM
        # and half the host->device transfer of a float32 tile; the window
        # min-max runs exactly on integer input (ops.preprocess)
        host_tiles[year] = np.ascontiguousarray(np.moveaxis(arr, 0, -1))
        from deeptreeattention_tpu.geo.affine import window_from_bounds

        # the SAME Window.round() math as the crop-file path (crops.crop ->
        # read_bounds): floor(rowcol) differences are 1 px smaller per axis
        # for about half of real fractional-bound crowns
        rect = []
        for g in crowns.geometry:
            left, bottom, right, top = g.bounds
            win = window_from_bounds(left, bottom, right, top, t).round()
            rect.append((win.row_off, win.col_off,
                         max(win.height, 1), max(win.width, 1)))
        bounds_px[year] = np.asarray(rect, np.int32)

    def year_images(tile, rect):
        return _year_images(tile, rect, size)

    n = len(crowns)
    order = np.arange(n)
    if slab_rows is not None:
        # row-sort crowns so each chunk's windows live in one short slab
        first = next(iter(bounds_px.values()))
        order = np.argsort(first[:, 0], kind="stable")
        tallest = max(int(rect[:, 2].max()) for rect in bounds_px.values())
        if tallest > slab_rows:
            # a single crown taller than the slab can never fit — bump to the
            # next slab_rows multiple (few distinct compiled slab shapes
            # across a sweep) instead of failing the tile
            bumped = -(-tallest // slab_rows) * slab_rows
            log.warning(
                "slab_rows=%d smaller than the tallest crown (%d px); "
                "using %d for this tile", slab_rows, tallest, bumped,
            )
            slab_rows = bumped
    else:
        # whole tiles resident in HBM (fastest when they fit)
        device_tiles = {
            year: jax.device_put(jnp.asarray(tile))
            for year, tile in host_tiles.items()
        }

    def chunk_images(idx):
        """[k, Y, S, S, C] crown images for crown indices idx (device)."""
        per_year = []
        for year in m.years:
            key = str(year)
            if key not in host_tiles:
                per_year.append(jnp.zeros((len(idx), size, size, bands), jnp.float32))
                continue
            rect = bounds_px[key][idx]
            if slab_rows is None:
                per_year.append(year_images(device_tiles[key], rect))
            else:
                h = host_tiles[key].shape[0]
                eff = min(slab_rows, h)
                start = int(rect[:, 0].min())
                start = max(0, min(start, h - eff))
                # any window ending past the slab would clamp to the slab's
                # last row instead of the rows the whole-tile path reads —
                # unless the slab already reaches the tile bottom, where
                # both paths clamp identically. _split_fitting guarantees
                # every chunk reaching here fits; enforce with a real raise
                # (not assert: must survive python -O) because a regression
                # would produce silently clamped, wrong window reads.
                if not (int((rect[:, 0] + rect[:, 2]).max()) <= start + eff
                        or start + eff >= h):
                    raise ValueError("chunk overspans its slab (bug)")
                slab = jax.device_put(jnp.asarray(host_tiles[key][start:start + eff]))
                local = rect.copy()
                local[:, 0] -= start
                per_year.append(year_images(slab, local))
        return jnp.stack(per_year, axis=1)

    def _chunk_fits(idx):
        """True when every year's windows for these crowns live inside one
        slab (accounting for the bottom-of-tile clamp both paths share)."""
        for key in bounds_px:
            rect = bounds_px[key][idx]
            h = host_tiles[key].shape[0]
            eff = min(slab_rows, h)
            start = max(0, min(int(rect[:, 0].min()), h - eff))
            if int((rect[:, 0] + rect[:, 2]).max()) > start + eff and start + eff < h:
                return False
        return True

    def _split_fitting(idx):
        """Yield sub-chunks that each fit in a slab: a chunk whose row span
        overruns slab_rows is recursively halved (crowns are row-sorted, so
        halves have monotonically shrinking spans; a single crown always
        fits because slab_rows >= the tallest crown). Replaces the old
        hard ValueError, which predict.py's per-tile try/except turned into
        a silently skipped tile."""
        if slab_rows is None or len(idx) <= 1 or _chunk_fits(idx):
            yield idx
            return
        mid = len(idx) // 2
        for sub in (idx[:mid], idx[mid:]):
            for fit in _split_fitting(sub):
                yield fit

    individuals = np.asarray(crowns.individual)
    chunk_idx = [
        sub
        for s in range(0, n, chunk)
        for sub in _split_fitting(order[s:s + chunk])
    ]
    pending = []
    outputs = []

    splits = None

    def drain(one=False):
        while pending and (len(pending) > 1 or not one):
            inds, k, packed = pending.pop(0)
            arr = np.asarray(packed)[:k]  # ONE relay read per chunk
            outputs.append((inds, np.split(arr, splits, axis=1)))
            if one:
                break

    for idx in chunk_idx:
        k = len(idx)
        if k < chunk and len(chunk_idx) > 1:
            # pad the tail chunk to the static chunk size (one compiled
            # program shape; padded rows stripped via k)
            idx = np.concatenate([idx, np.full(chunk - k, idx[-1], idx.dtype)])
        images = chunk_images(idx)
        if mesh is not None:
            nd = mesh.devices.size
            b = images.shape[0]
            target = ((b + nd - 1) // nd) * nd
            if target != b:
                images = jnp.concatenate(
                    [images, jnp.zeros((target - b,) + images.shape[1:], images.dtype)]
                )
            # sharded batch axis + replicated params -> GSPMD partitions the
            # already-compiled eval step over the mesh
            images = jax.device_put(images, data_sharding(mesh))
        if getattr(m, "_eval_all", None) is not None:
            # all levels fused into one program (full MXU lane width)
            level_probs = list(m._eval_all(tuple(m.variables), images))
        else:
            level_probs = [
                m._eval_steps[level](
                    m.variables[level]["params"],
                    m.variables[level].get("batch_stats", {}),
                    images,
                )
                for level in range(m.levels)
            ]
        if splits is None:
            splits = np.cumsum([p.shape[1] for p in level_probs])[:-1]
        pending.append((individuals[idx[:k]], k, _pack_levels(level_probs)))
        # double buffer: block on the oldest chunk once two are in flight,
        # which also frees its slab's HBM before the next upload
        drain(one=True)
    drain()

    results = m.gather_predictions(outputs)
    results = m.ensemble(results)
    return results.merge(crowns, on="individual")


def predict_tile_ondevice(crowns, m, config, savedir, filter_dead=False):
    """Crop-file-free predict_tile: resolve the tile's per-year HSI rasters
    and run predict_species_ondevice, then the same dead-masking/area/write
    steps. Enable in the sweep with config["ondevice_predict"]=True."""
    if isinstance(crowns, str):
        crowns = vector.read_file(crowns)
    img_pool = [
        x for x in glob.glob(config["HSI_sensor_pool"], recursive=True)
        if "point_cloud" not in x and "products" not in x
    ]
    from deeptreeattention_tpu.data import neon_paths

    geo_index = neon_paths.bounds_to_geoindex(crowns.total_bounds)
    paths = neon_paths.find_sensor_path(img_pool, geo_index=geo_index, all_years=True)
    tile_paths = {neon_paths.year_from_tile(p): p for p in paths}
    trees = predict_species_ondevice(crowns, tile_paths, m, config)
    return _finish_tile(trees, crowns, config, savedir, filter_dead)


def predict_tile(crown_annotations, m, config, savedir, filter_dead=False, client=None):
    """One tile end-to-end from the crops sidecar -> predicted .shp."""
    crowns = (
        vector.read_file(crown_annotations)
        if isinstance(crown_annotations, str)
        else crown_annotations
    )
    trees = predict_species(crowns=crowns, m=m, config=config)
    if trees is None:
        return None
    return _finish_tile(trees, crowns, config, savedir, filter_dead)


def _finish_tile(trees, crowns, config, savedir, filter_dead):

    if filter_dead and "dead_label" in trees.columns:
        dead_mask = (trees.dead_label == 1) & (
            trees.dead_score.astype(float) > config["dead_threshold"]
        )
        trees.loc[dead_mask, "ensembleTaxonID"] = "DEAD"
        trees.loc[dead_mask, "ens_label"] = None
        trees.loc[dead_mask, "ens_score"] = None

    trees["crown_area"] = [g.area for g in trees.geometry]
    trees = vector.GeoDataFrame(trees, crs=getattr(crowns, "crs", None))
    log.info("%d trees predicted", len(trees))

    basename = os.path.splitext(os.path.basename(trees.RGB_tile.unique()[0]))[0]
    os.makedirs(savedir, exist_ok=True)
    out_path = os.path.join(savedir, "{}.shp".format(basename))
    trees.to_file(out_path)
    return trees
