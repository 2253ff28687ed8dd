"""Uncertainty-propagated abundance estimation over predicted tiles.

Capability parity with reference src/multinomial.py:11-98: for each predicted
tile shapefile, keep each crown's predicted label with probability ens_score
(binomial draw) or resample it from the model's row-normalized confusion
matrix (multinomial draw); aggregate per-species crown counts across tiles,
fanned out over the futures pool. The per-tile sampling is vectorized numpy.
"""
import glob
import os

import numpy as np
import pandas as pd

from deeptreeattention_tpu.geo import vector
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)


def load_confusion(path):
    """Row-normalized confusion csv (index=predicted) -> taxonID -> row."""
    df = pd.read_csv(path, index_col=0)
    df = df.set_index("predicted")
    return {taxon: df.loc[taxon].values.astype(float) for taxon in df.index}


def format_confusion_json(path):
    """Comet-style confusion .json -> row-normalized DataFrame."""
    j = pd.read_json(path)
    mat = pd.DataFrame(list(j.matrix))
    mat = mat.div(mat.sum(axis=1), axis=0)
    mat.columns = j.labels
    mat["predicted"] = list(j.labels)
    return mat


def sample_binomial(scores, rng):
    """Keep-label draws: P(keep) = ens_score; missing scores always keep."""
    scores = np.asarray(pd.to_numeric(pd.Series(scores), errors="coerce"))
    out = np.ones(len(scores), dtype=np.int64)
    valid = ~np.isnan(scores)
    out[valid] = rng.binomial(1, np.clip(scores[valid], 0, 1))
    return out


def sample_confusion(taxon, confusion, rng):
    if taxon == "DEAD" or taxon not in confusion:
        return taxon
    row = np.asarray(confusion[taxon], float)
    row = row / row.sum() if row.sum() else np.ones_like(row) / len(row)
    return int(np.argmax(rng.multinomial(1, row)))


def _load_tile_arrays(tile, overlay_bounds=None, year=None):
    """(taxa [N] str array, scores [N] or None) for one predicted tile."""
    predicted = vector.read_file(tile)
    if year is not None and "tile_year" in predicted.columns:
        predicted = predicted[predicted.tile_year.astype(str) == str(year)]
    if overlay_bounds:
        boundary = vector.read_file(overlay_bounds)
        if boundary.crs and predicted.crs and boundary.crs != predicted.crs:
            boundary = boundary.to_crs(epsg=predicted.crs)
        predicted = vector.clip(predicted, boundary)
    if predicted.empty:
        return None, None
    taxa_col = "ensembleTaxonID" if "ensembleTaxonID" in predicted.columns else "ensembleTa"
    scores = predicted.get("ens_score")
    return predicted[taxa_col].astype(str).values, (
        None if scores is None else np.asarray(scores)
    )


def _permute(taxa, scores, confusion, rng):
    """One permutation over preloaded tile arrays -> counts Series."""
    label_names = {i: t for i, t in enumerate(confusion.keys())}
    label_names["DEAD"] = "DEAD"
    if scores is None:
        # shapefiles without scores keep every label (a None would yield a
        # length-0 draw and zip-truncate the whole tile to zero counts)
        keep = np.ones(len(taxa), bool)
    else:
        keep = sample_binomial(scores, rng).astype(bool)
    sampled = [
        t if k else label_names.get(sample_confusion(t, confusion, rng), t)
        for t, k in zip(taxa, keep)
    ]
    return pd.Series(sampled).value_counts()


def run(tile, confusion_path, overlay_bounds=None, iteration=0, year=None, seed=None):
    """One tile, one permutation -> per-species crown counts Series."""
    taxa, scores = _load_tile_arrays(tile, overlay_bounds=overlay_bounds, year=year)
    if taxa is None:
        return pd.Series(dtype=float)
    confusion = load_confusion(confusion_path)
    rng = np.random.RandomState(seed if seed is not None else iteration)
    return _permute(taxa, scores, confusion, rng)


def run_tile_permutations(tile, confusion_path, iterations, overlay_bounds=None,
                          year=None, seed0=0):
    """Load the tile ONCE and draw `iterations` permutations — identical
    output to `iterations` calls of run() (same per-iteration seeds) at
    ~1/iterations of the shapefile/CSV IO."""
    taxa, scores = _load_tile_arrays(tile, overlay_bounds=overlay_bounds, year=year)
    if taxa is None:
        return [pd.Series(dtype=float)] * iterations
    confusion = load_confusion(confusion_path)
    return [
        _permute(taxa, scores, confusion, np.random.RandomState(seed0 + it))
        for it in range(iterations)
    ]


def wrapper_all(client, n_permutations, experiment_key, shp_dir, savedir,
                confusion_path, overlay_bounds=None, year=None):
    """All permutations of all tiles, tile-major: each worker loads its tile
    once and draws every permutation in memory, then totals combine per
    iteration. Output files identical to n_permutations wrapper() calls.

    Idempotent at whole-run granularity: if every permutation csv already
    exists the run is skipped (seeded draws make the existing files valid)."""
    out_dir = os.path.join(savedir, experiment_key)
    expected = [
        os.path.join(out_dir, "multinomial_permutation_{}.csv".format(it))
        for it in range(n_permutations)
    ]
    if expected and all(os.path.exists(p) for p in expected):
        log.info("all %d permutation files exist in %s — skipping",
                 n_permutations, out_dir)
        return None
    tiles = glob.glob(os.path.join(shp_dir, experiment_key, "*_image*.shp"))
    if client is not None:
        futures = [
            client.submit(run_tile_permutations, tile=t,
                          confusion_path=confusion_path,
                          iterations=n_permutations,
                          overlay_bounds=overlay_bounds, year=year)
            for t in tiles
        ]
        per_tile = client.gather(futures, skip_errors=True)
    else:
        per_tile = []
        for t in tiles:
            try:
                per_tile.append(run_tile_permutations(
                    tile=t, confusion_path=confusion_path,
                    iterations=n_permutations,
                    overlay_bounds=overlay_bounds, year=year))
            except Exception as e:
                log.warning("tile %s failed: %s", t, e)

    out_dir = os.path.join(savedir, experiment_key)
    os.makedirs(out_dir, exist_ok=True)
    totals = []
    for it in range(n_permutations):
        total = pd.Series(dtype=float)
        for series_list in per_tile:
            total = total.add(series_list[it], fill_value=0)
        total.sort_values().to_csv(
            os.path.join(out_dir, "multinomial_permutation_{}.csv".format(it))
        )
        totals.append(total)
    return totals


def wrapper(client, iteration, experiment_key, shp_dir, savedir,
            confusion_path, overlay_bounds=None, year=None):
    """All tiles of one experiment, one permutation -> total counts csv."""
    tiles = glob.glob(os.path.join(shp_dir, experiment_key, "*_image*.shp"))
    if client is not None:
        futures = [
            client.submit(run, tile=t, confusion_path=confusion_path,
                          overlay_bounds=overlay_bounds, iteration=iteration, year=year)
            for t in tiles
        ]
        client.wait(futures)
        results = [f.result() for f in futures if f.exception() is None]
    else:
        results = []
        for t in tiles:
            try:
                results.append(run(tile=t, confusion_path=confusion_path,
                                   overlay_bounds=overlay_bounds, iteration=iteration,
                                   year=year))
            except Exception as e:
                log.warning("tile %s failed: %s", t, e)

    total = pd.Series(dtype=float)
    for counts in results:
        total = total.add(counts, fill_value=0)
    out_dir = os.path.join(savedir, experiment_key)
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "multinomial_permutation_{}.csv".format(iteration))
    total.sort_values().to_csv(out_path)
    return total
