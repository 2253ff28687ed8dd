"""Trainable crown detector: learns to find synthetic crowns and plugs into
the detection protocol."""
import numpy as np
import pytest

from deeptreeattention_tpu.models.detector import (
    LearnedDetector, decode, render_targets,
)


def synth_scene(rng, size=128, n=5):
    """Dark background + bright square 'crowns'; returns (image, boxes)."""
    img = rng.randint(20, 60, size=(size, size, 3)).astype(np.float32)
    boxes = []
    for _ in range(n):
        w = rng.randint(8, 16)
        x0 = rng.randint(0, size - w)
        y0 = rng.randint(0, size - w)
        img[y0 : y0 + w, x0 : x0 + w] += rng.randint(120, 170)
        boxes.append((x0, y0, x0 + w, y0 + w))
    return np.clip(img, 0, 255), np.asarray(boxes, np.float32)


def test_render_targets_shapes():
    heat, size, off, mask = render_targets([np.array([[8, 8, 24, 24]])], (64, 64))
    assert heat.shape == (1, 16, 16)
    assert mask.sum() == 9  # 3x3 supervised neighborhood
    ci, cj = np.unravel_index(np.argmax(heat[0]), heat[0].shape)
    assert (ci, cj) == (4, 4)
    np.testing.assert_allclose(size[0, ci, cj], [4, 4])
    # box center is 16 px = cell 4.0; cell center is 4.5 -> offset -0.5
    np.testing.assert_allclose(off[0, ci, cj], [-0.5, -0.5])


def test_decode_roundtrip():
    heat = np.zeros((16, 16), np.float32)
    heat[5, 7] = 0.9
    size = np.zeros((16, 16, 2), np.float32)
    size[5, 7] = (4, 3)
    boxes = decode(heat, size, threshold=0.5)
    assert len(boxes) == 1
    row = boxes.iloc[0]
    assert abs((row.xmax + row.xmin) / 2 - (7 * 4 + 2)) < 1e-6
    assert abs(row.xmax - row.xmin - 16) < 1e-6


def test_factory_loads_learned_checkpoint(tmp_path):
    from deeptreeattention_tpu.data.detection import CrownDetector, load_detector

    det = LearnedDetector(width=16, patch=64)
    path = str(tmp_path / "det")
    det.save_checkpoint(path)
    loaded = load_detector({"crown_detector": path})
    assert isinstance(loaded, LearnedDetector)
    assert loaded.model.width == 16
    default = load_detector({})
    assert isinstance(default, CrownDetector)
    assert load_detector({"crown_diameter": 4.0}).crown_diameter == 4.0


@pytest.mark.slow
def test_detector_learns_blobs():
    rng = np.random.RandomState(0)
    scenes = [synth_scene(rng) for _ in range(24)]
    images = np.stack([s[0] for s in scenes])
    boxes_list = [s[1] for s in scenes]

    det = LearnedDetector(width=16, patch=128, threshold=0.35)
    losses = det.fit(images, boxes_list, steps=150, batch_size=8)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # recall on a fresh scene: most true crowns matched by a detection center
    img, truth = synth_scene(rng)
    pred = det.predict_image(img)
    assert pred is not None and len(pred) > 0
    hits = 0
    for (x0, y0, x1, y1) in truth:
        cx = (pred.xmin + pred.xmax) / 2
        cy = (pred.ymin + pred.ymax) / 2
        if (((cx > x0 - 3) & (cx < x1 + 3) & (cy > y0 - 3) & (cy < y1 + 3)).any()):
            hits += 1
    assert hits >= len(truth) - 1, "recall too low: {}/{}".format(hits, len(truth))


def test_learned_detector_batched_tile_sweep(tmp_path):
    """predict_tile batches the patch grid through one jit forward and
    matches the per-patch predict_image path."""
    from deeptreeattention_tpu.geo import raster
    from deeptreeattention_tpu.geo.affine import from_origin

    rng = np.random.RandomState(0)
    img, _ = synth_scene(rng, size=128, n=4)
    img2, _ = synth_scene(rng, size=128, n=3)
    # a 256x256 tile = exact 2x2 grid of 128-px patches
    tile = np.zeros((3, 256, 256), np.uint8)
    tile[:, :128, :128] = np.moveaxis(img, -1, 0).astype(np.uint8)
    tile[:, 128:, 128:] = np.moveaxis(img2, -1, 0).astype(np.uint8)
    path = str(tmp_path / "tile.tif")
    raster.write_raster(path, tile, transform=from_origin(0, 256, 1, 1), crs=32617)

    det = LearnedDetector(width=16, patch=128, threshold=0.0)
    out = det.predict_tile(path, batch=3)  # 4 patches -> a padded final group
    assert out is not None and len(out) > 0
    assert {"xmin", "ymin", "xmax", "ymax", "score"} <= set(out.columns)
    assert (out.xmax <= 255).all() and (out.ymax <= 255).all()
    # batched sweep == serial base-class sweep (same patches, same decode)
    from deeptreeattention_tpu.data.detection import Detector

    serial = Detector.predict_tile(det, path, patch_size=128)
    pd_sorted = lambda d: d.sort_values(["xmin", "ymin"]).reset_index(drop=True)
    a, b = pd_sorted(out), pd_sorted(serial)
    assert len(a) == len(b)
    np.testing.assert_allclose(
        a[["xmin", "ymin", "xmax", "ymax"]].values,
        b[["xmin", "ymin", "xmax", "ymax"]].values, atol=1e-4,
    )

    # partial edge patches: runs, stays in bounds (zero-padding makes exact
    # per-patch equality unattainable at threshold 0 — border activations
    # differ; the real-crown recall is what matters and is tested above)
    tile2 = np.zeros((3, 192, 250), np.uint8)
    tile2[:, :128, :128] = np.moveaxis(img, -1, 0).astype(np.uint8)
    path2 = str(tmp_path / "tile2.tif")
    raster.write_raster(path2, tile2, transform=from_origin(0, 192, 1, 1), crs=32617)
    out2 = det.predict_tile(path2)
    assert out2 is not None
    assert (out2.xmax <= 249).all() and (out2.ymax <= 191).all()


def test_decode_offset_refinement():
    """The offset head shifts the decoded center by off*stride — sub-stride
    localization the cell-center convention cannot reach."""
    heat = np.zeros((16, 16), np.float32)
    heat[5, 7] = 0.9
    size = np.zeros((16, 16, 2), np.float32)
    size[5, 7] = (4, 4)
    off = np.zeros((16, 16, 2), np.float32)
    off[5, 7] = (0.25, -0.5)
    boxes = decode(heat, size, off, threshold=0.5)
    row = boxes.iloc[0]
    assert abs((row.xmax + row.xmin) / 2 - (7 * 4 + 2 + 1.0)) < 1e-6
    assert abs((row.ymax + row.ymin) / 2 - (5 * 4 + 2 - 2.0)) < 1e-6


def test_checkpoint_without_offset_head_loads(tmp_path):
    """Round-3 checkpoints predate the offset head; they reload with zero
    offsets (bit-identical to the old cell-center decode)."""
    from deeptreeattention_tpu.train import checkpoints as ckpt_mod

    det = LearnedDetector(width=8, patch=32, threshold=0.5)
    tree = {
        "params": {k: v for k, v in det.variables["params"].items()
                   if k != "offset"},
        "batch_stats": det.variables["batch_stats"],
    }
    path = ckpt_mod.save_checkpoint(str(tmp_path / "old_det"), tree, {"width": 8})
    loaded = LearnedDetector.load_from_checkpoint(path)
    assert float(np.abs(np.asarray(
        loaded.variables["params"]["offset"]["kernel"])).max()) == 0.0
    img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32) * 255
    loaded.predict_image(img)  # forward smoke with injected zeros
