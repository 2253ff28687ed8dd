"""Detection quality on a synthetic 120-crown benchmark: precision AND
recall AND F1, for both the classical CrownDetector and the trained
CenterNet (VERDICT round-2 item 4 — the 2-crown reference pin in
test_detection_quality.py measures recall only; this measures false
positives against a ground truth large enough to mean something)."""
import numpy as np
import pytest

from deeptreeattention_tpu.data.detection import CrownDetector
from deeptreeattention_tpu.data.synthetic import (
    box_iou_matrix,
    detection_prf,
    make_forest_scene,
)

RES = 0.5  # m/px; crown diameters 3-10 m -> 6-20 px


def test_scene_generator_properties():
    img, gt = make_forest_scene(n_crowns=120, size=512, res=RES, seed=0)
    assert img.shape == (512, 512, 3) and img.dtype == np.float32
    assert len(gt) >= 100, "scene saturated below the 100-crown benchmark bar"
    # varied diameters (meters)
    d = (gt[:, 2] - gt[:, 0]) * RES
    assert d.min() < 4.5 and d.max() > 8.0
    # ground truth is unambiguous: no two crowns overlap above 0.5 IoU
    iou = box_iou_matrix(gt, gt)
    np.fill_diagonal(iou, 0.0)
    assert iou.max() < 0.5
    # determinism
    img2, gt2 = make_forest_scene(n_crowns=120, size=512, res=RES, seed=0)
    np.testing.assert_array_equal(gt, gt2)


def test_prf_matching_semantics():
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)
    # one true positive, one duplicate (FP), one stray (FP), one miss (FN)
    pred = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], float)
    m = detection_prf(pred, gt, iou_threshold=0.4, scores=[0.9, 0.8, 0.7])
    assert (m["tp"], m["fp"], m["fn"]) == (1, 2, 1)
    assert m["precision"] == pytest.approx(1 / 3)
    assert m["recall"] == pytest.approx(1 / 2)


def test_crown_detector_prf_on_synthetic_benchmark():
    """Classical detector: P/R/F1 over >= 100 known crowns. Measured values
    ~0.93/0.86/0.89 at crown_diameter=5 (scripts/bench_detection.py);
    asserted with slack."""
    img, gt = make_forest_scene(n_crowns=120, size=512, res=RES, seed=0)
    det = CrownDetector(crown_diameter=5.0)
    boxes = det.predict_array(img, res=RES)
    m = detection_prf(
        boxes[["xmin", "ymin", "xmax", "ymax"]].values, gt,
        scores=boxes.score.values,
    )
    assert m["n_gt"] >= 100
    assert m["precision"] >= 0.85, m
    assert m["recall"] >= 0.75, m
    assert m["f1"] >= 0.80, m


def test_crown_detector_min_score_lifts_precision():
    """The score threshold is what separates crowns from noise peaks:
    without it precision collapses while recall is unchanged."""
    img, gt = make_forest_scene(n_crowns=120, size=512, res=RES, seed=1)
    loose = CrownDetector(crown_diameter=5.0, min_score=0.0).predict_array(img, res=RES)
    tight = CrownDetector(crown_diameter=5.0).predict_array(img, res=RES)
    m_loose = detection_prf(loose[["xmin", "ymin", "xmax", "ymax"]].values, gt,
                            scores=loose.score.values)
    m_tight = detection_prf(tight[["xmin", "ymin", "xmax", "ymax"]].values, gt,
                            scores=tight.score.values)
    assert m_tight["precision"] > m_loose["precision"] + 0.3
    assert m_tight["recall"] >= m_loose["recall"] - 1e-9


def _crops(scene_seeds, patch=96, crops_per_scene=30, seed=0):
    rng = np.random.RandomState(seed)
    scenes, blists = [], []
    for s in scene_seeds:
        img, gt = make_forest_scene(n_crowns=120, size=512, res=RES, seed=s)
        for _ in range(crops_per_scene):
            r0 = rng.randint(0, 512 - patch + 1)
            c0 = rng.randint(0, 512 - patch + 1)
            bs = []
            for (x0, y0, x1, y1) in gt:
                xx0, yy0 = max(x0 - c0, 0), max(y0 - r0, 0)
                xx1, yy1 = min(x1 - c0, patch), min(y1 - r0, patch)
                if xx1 - xx0 > 4 and yy1 - yy0 > 4:
                    bs.append((xx0, yy0, xx1, yy1))
            scenes.append(img[r0:r0 + patch, c0:c0 + patch])
            blists.append(np.asarray(bs, np.float32).reshape(-1, 4))
    return np.stack(scenes), blists


def test_learned_detector_prf_on_held_out_scene():
    """CenterNet trained on a SPLIT of the synthetic benchmark (scenes
    10-13) and evaluated on the held-out scene 0. Measured ~0.95/0.95/0.95
    (scripts/bench_detection.py); asserted with slack."""
    from deeptreeattention_tpu.models.detector import LearnedDetector

    scenes, blists = _crops(range(10, 14))
    det = LearnedDetector(width=16, patch=96, threshold=0.25)
    losses = det.fit(scenes, blists, steps=600, batch_size=8)
    assert losses[-1] < losses[0] / 10

    img, gt = make_forest_scene(n_crowns=120, size=512, res=RES, seed=0)
    boxes = det.predict_image(img)
    m = detection_prf(
        boxes[["xmin", "ymin", "xmax", "ymax"]].values, gt,
        scores=boxes.score.values,
    )
    assert m["n_gt"] >= 100
    assert m["precision"] >= 0.85, m
    assert m["recall"] >= 0.85, m
    assert m["f1"] >= 0.85, m


def test_textured_scene_generator_properties():
    """Out-of-family generator: same contract as make_forest_scene, visibly
    different statistics (color variance across crowns, illumination ramp)."""
    from deeptreeattention_tpu.data.synthetic import (
        make_forest_scene, make_textured_scene)

    img, boxes = make_textured_scene(n_crowns=60, size=256, seed=3)
    assert img.shape == (256, 256, 3) and img.dtype == np.float32
    assert len(boxes) >= 40
    assert (boxes[:, 2] > boxes[:, 0]).all() and (boxes[:, 3] > boxes[:, 1]).all()
    assert boxes.min() >= 0 and boxes.max() <= 256
    # determinism
    img2, boxes2 = make_textured_scene(n_crowns=60, size=256, seed=3)
    np.testing.assert_array_equal(img, img2)
    np.testing.assert_array_equal(boxes, boxes2)
    # color varies across crowns here, not in the base family: compare the
    # per-crown-center R/G ratio spread
    f_img, f_boxes = make_forest_scene(n_crowns=60, size=256, seed=3)

    def rg_spread(im, bs):
        ratios = []
        for (x0, y0, x1, y1) in bs[:40]:
            cx, cy = int((x0 + x1) / 2), int((y0 + y1) / 2)
            px = im[cy, cx]
            if px[1] > 1:
                ratios.append(px[0] / px[1])
        return float(np.std(ratios))

    assert rg_spread(img, boxes) > 3 * rg_spread(f_img, f_boxes)


def test_forest_tile_generator():
    """Windowed large-tile generator: uint8, georeferenceable scale, crowns
    at the requested density, deterministic."""
    from deeptreeattention_tpu.data.synthetic import make_forest_tile

    rgb, boxes = make_forest_tile(size=1500, res=0.1, crowns_per_km2=60000,
                                  seed=4)
    assert rgb.shape == (1500, 1500, 3) and rgb.dtype == np.uint8
    # 1500 px @ 0.1 m = 0.0225 km^2 -> ~1350 crowns
    assert 900 <= len(boxes) <= 1400
    assert (boxes[:, [0, 1]] >= 0).all() and (boxes[:, [2, 3]] <= 1500).all()
    rgb2, boxes2 = make_forest_tile(size=1500, res=0.1, crowns_per_km2=60000,
                                    seed=4)
    np.testing.assert_array_equal(rgb, rgb2)
