"""Synthetic forest scenes with known crown ground truth.

The reference's detection quality is inherited from DeepForest's released
RetinaNet and never measured in-repo (reference src/generate.py:17-60
downloads the weights; its test fixture crown.shp holds 2 boxes). This
module generates scenes with 100+ KNOWN crowns — varied diameters,
brightness, and adjacency — so precision AND recall are measurable numbers
for any Detector implementation (tests/test_detection_benchmark.py,
scripts/bench_detection.py).
"""
import numpy as np


def make_forest_scene(n_crowns=120, size=512, res=0.5, seed=0,
                      diameter_range=(3.0, 10.0), brightness_range=(90.0, 220.0),
                      background=40.0, noise=6.0, cluster_fraction=0.5,
                      min_separation=0.75):
    """Render a forest-like brightness scene and its ground-truth boxes.

    Crowns are radial-falloff blobs on a noisy dark background. A fraction
    grows in clusters (adjacent crowns with touching edges), the rest are
    isolated. Centers keep >= min_separation * mean radius apart so the
    ground truth stays unambiguous.

    Args:
        n_crowns: number of crowns to place (the actual count can be a few
            lower if the scene saturates; the returned boxes are the truth).
        size: scene side in pixels.
        res: meters per pixel (crown diameters are in meters).
        diameter_range: (min, max) crown diameter in meters.
        brightness_range: (min, max) crown peak brightness.
        cluster_fraction: fraction of crowns placed adjacent to an earlier one.
        min_separation: minimum center distance as a multiple of the two
            crowns' mean radius.

    Returns:
        (image [size, size, 3] float32, boxes [N, 4] float32 pixel
        (xmin, ymin, xmax, ymax)).
    """
    rng = np.random.RandomState(seed)
    img = background + rng.randn(size, size).astype(np.float32) * noise
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)

    centers = []   # (cy, cx, r_px)
    boxes = []
    attempts = 0
    while len(centers) < n_crowns and attempts < n_crowns * 60:
        attempts += 1
        d_m = rng.uniform(*diameter_range)
        r = (d_m / res) / 2.0
        if centers and rng.rand() < cluster_fraction:
            # adjacent placement: edge-to-edge next to an existing crown
            base = centers[rng.randint(len(centers))]
            ang = rng.rand() * 2 * np.pi
            dist = (base[2] + r) * rng.uniform(1.0, 1.3)
            cy = base[0] + np.sin(ang) * dist
            cx = base[1] + np.cos(ang) * dist
        else:
            cy = rng.uniform(r, size - r)
            cx = rng.uniform(r, size - r)
        if not (r <= cy <= size - r and r <= cx <= size - r):
            continue
        ok = True
        for (oy, ox, orr) in centers:
            if np.hypot(cy - oy, cx - ox) < min_separation * (r + orr):
                ok = False
                break
        if not ok:
            continue
        peak = rng.uniform(*brightness_range)
        # radial falloff: bright center -> background at the rim, slightly
        # elliptical + lobed so crowns aren't perfect disks
        ey = rng.uniform(0.85, 1.15)
        ex = rng.uniform(0.85, 1.15)
        dist2 = ((yy - cy) * ey) ** 2 + ((xx - cx) * ex) ** 2
        blob = peak * np.exp(-dist2 / (2 * (r / 1.6) ** 2))
        img = np.maximum(img, background + blob.astype(np.float32))
        centers.append((cy, cx, r))
        boxes.append((cx - r, cy - r, cx + r, cy + r))

    img = np.clip(img, 0, 255)
    rgb = np.stack([img * 0.55, img, img * 0.45], axis=-1).astype(np.float32)
    return rgb, np.asarray(boxes, np.float32).reshape(-1, 4)


def box_iou_matrix(a, b):
    """Pairwise IoU between [N, 4] and [M, 4] (xmin, ymin, xmax, ymax)."""
    a = np.asarray(a, float).reshape(-1, 4)
    b = np.asarray(b, float).reshape(-1, 4)
    ix = np.maximum(
        0.0,
        np.minimum(a[:, None, 2], b[None, :, 2]) - np.maximum(a[:, None, 0], b[None, :, 0]),
    )
    iy = np.maximum(
        0.0,
        np.minimum(a[:, None, 3], b[None, :, 3]) - np.maximum(a[:, None, 1], b[None, :, 1]),
    )
    inter = ix * iy
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def detection_prf(pred_boxes, gt_boxes, iou_threshold=0.4, scores=None):
    """Greedy one-to-one matching -> precision / recall / F1 / mean IoU.

    Predictions are matched best-first (by score when given, else by best
    IoU); each ground-truth box matches at most one prediction. A prediction
    without a >= iou_threshold match is a false positive — the quantity the
    round-2 evidence never measured.
    """
    pred = np.asarray(pred_boxes, float).reshape(-1, 4)
    gt = np.asarray(gt_boxes, float).reshape(-1, 4)
    if len(pred) == 0 or len(gt) == 0:
        tp = 0
        matched_ious = []
    else:
        iou = box_iou_matrix(pred, gt)
        if scores is not None:
            order = np.argsort(-np.asarray(scores, float))
        else:
            order = np.argsort(-iou.max(axis=1))
        taken = np.zeros(len(gt), bool)
        matched_ious = []
        for i in order:
            j = int(np.argmax(np.where(taken, -1.0, iou[i])))
            if not taken[j] and iou[i, j] >= iou_threshold:
                taken[j] = True
                matched_ious.append(float(iou[i, j]))
        tp = int(np.sum(taken))
    fp = len(pred) - tp
    fn = len(gt) - tp
    precision = tp / len(pred) if len(pred) else 0.0
    recall = tp / len(gt) if len(gt) else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "n_pred": int(len(pred)),
        "n_gt": int(len(gt)),
        "mean_matched_iou": float(np.mean(matched_ious)) if matched_ious else 0.0,
    }
