"""Visualization: crown + stem over RGB, confusion matrices with examples.

Capability parity with reference src/visualize.py:14-73 (index_to_example,
confusion_matrix) without descartes/comet: crowns are drawn with plain
matplotlib patches over windows read by our raster engine, and the confusion
matrix (with optional example images) is logged through any experiment
exposing log_image / log_confusion_matrix (the local Experiment or comet).
"""
import os
import tempfile

import numpy as np

from deeptreeattention_tpu.data import neon_paths
from deeptreeattention_tpu.geo import raster
from deeptreeattention_tpu.train.metrics import confusion_matrix as _cm


def plot_crown(individual, test_crowns, test_points, rgb_pool, savedir=None, pad=10):
    """Render the RGB context window with crown box + stem point -> png path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    savedir = savedir or tempfile.gettempdir()
    geom = test_crowns[test_crowns.individual == individual].geometry.iloc[0]
    left, bottom, right, top = geom.bounds
    img_path = neon_paths.find_sensor_path(lookup_pool=rgb_pool, bounds=geom.bounds)
    with raster.open_raster(img_path) as src:
        img = src.read_bounds(left - pad, bottom - pad, right + pad, top + pad, boundless=True)

    fig, ax = plt.subplots(figsize=(4, 4))
    rgb = np.moveaxis(img[:3], 0, -1)
    if rgb.dtype != np.uint8:
        rng = rgb.max() - rgb.min()
        rgb = ((rgb - rgb.min()) / (rng if rng else 1) * 255).astype(np.uint8)
    extent = (left - pad, right + pad, bottom - pad, top + pad)
    ax.imshow(rgb, extent=extent)
    ax.add_patch(
        Rectangle((left, bottom), right - left, top - bottom,
                  edgecolor="red", facecolor="none", linewidth=1.5)
    )
    stem = test_points[test_points.individual == individual]
    if len(stem):
        pt = stem.geometry.iloc[0].centroid
        ax.plot([pt.x], [pt.y], "b+")
    ax.set_title(str(individual))
    out = os.path.join(savedir, "{}_confusion.png".format(individual))
    fig.savefig(out, dpi=80)
    plt.close(fig)
    return out


def index_to_example(index, test, test_crowns, test_points, rgb_pool, comet_experiment):
    """Plot one test individual and log it (reference src/visualize.py:14-59)."""
    individual = test.loc[index]["individual"]
    image_name = plot_crown(individual, test_crowns, test_points, rgb_pool)
    results = comet_experiment.log_image(image_name, name=str(individual))
    return {"sample": image_name, "assetId": results["imageId"]}


def confusion_matrix(comet_experiment, results, species_label_dict, test=None,
                     test_points=None, test_crowns=None, rgb_pool=None,
                     max_examples=0):
    """Log the label confusion matrix; optionally attach crown example plots."""
    # axis labels ordered by LABEL VALUE: the matrix is indexed by the int
    # labels, and dict insertion order (train_df appearance) need not match
    index_to_label = {v: k for k, v in species_label_dict.items()}
    labels = [index_to_label[i] for i in range(len(index_to_label))]
    out = comet_experiment.log_confusion_matrix(
        results.label.values.astype(int),
        results.pred_label_top1.values.astype(int),
        labels=labels,
    )
    if max_examples and test is not None and rgb_pool:
        for index in list(test.index)[:max_examples]:
            try:
                index_to_example(index, test, test_crowns, test_points, rgb_pool,
                                 comet_experiment)
            except Exception:
                continue
    return out


def confusion_matrix_array(results, num_classes):
    return _cm(results.pred_label_top1.values, results.label.values, num_classes)
