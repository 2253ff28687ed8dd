"""Pixel-window cropping around crowns.

Capability parity with reference src/patches.py:5-83: besides whole-crown
crops (see crops.crop), crowns can be expanded to one 11x11 window per
contained pixel (boundless reads at tile edges). The per-pixel enumeration is
vectorized; for TPU-scale tile inference prefer extracting windows on-device
from a streamed tile (ops/windows) rather than writing per-pixel files.
"""
import numpy as np

from deeptreeattention_tpu.data.crops import crop  # re-export, same surface
from deeptreeattention_tpu.geo import raster
from deeptreeattention_tpu.geo.affine import Window, window_from_bounds

__all__ = ["crop", "row_col_from_bounds", "bounds_to_pixel"]


def row_col_from_bounds(bounds, src):
    """(row, col) index of every pixel whose center falls inside bounds."""
    win = window_from_bounds(*bounds, transform=src.transform).round()
    rows = np.arange(win.row_off, win.row_off + win.height)
    cols = np.arange(win.col_off, win.col_off + win.width)
    rr, cc = np.meshgrid(rows, cols, indexing="ij")
    return list(zip(rr.ravel().tolist(), cc.ravel().tolist()))


def bounds_to_pixel(bounds, img_path, savedir=None, basename=None, width=11, height=11):
    """Crown bounds -> one width x height window per contained pixel.

    Returns [(row, col), window] pairs, or written filenames when savedir is
    given (window files are {basename}_{counter}.tif). Windows are anchored at
    the pixel (reference semantics, src/patches.py:70).
    """
    crops = []
    filenames = []
    with raster.open_raster(img_path) as src:
        for counter, (row, col) in enumerate(row_col_from_bounds(bounds, src)):
            win = Window(col, row, width, height)
            img = src.read(window=win, boundless=True)
            if savedir:
                filename = "{}/{}_{}.tif".format(savedir, basename, counter)
                raster.write_raster(filename, img, crs=src.crs)
                filenames.append(filename)
            else:
                crops.append([(row, col), img])
    return filenames if savedir else crops
