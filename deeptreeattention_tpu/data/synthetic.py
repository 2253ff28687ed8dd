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


def make_textured_scene(n_crowns=120, size=512, res=0.5, seed=0,
                        diameter_range=(3.0, 10.0), background=40.0,
                        noise=6.0, cluster_fraction=0.6, min_separation=0.6,
                        shadow_strength=0.45, occlusion_fraction=0.25,
                        n_distractors=25):
    """Second, out-of-family scene generator for cross-domain evaluation.

    Everything make_forest_scene deliberately omits: a directional
    illumination gradient plus per-crown cast shadows, multiplicative
    speckle texture inside crowns (no smooth radial falloff), aggressive
    overlap/partial occlusion (later crowns paint OVER earlier ones),
    per-crown RGB color jitter (green->yellow->brown canopy mix), and
    non-crown understory distractor blobs. A detector trained on
    make_forest_scene sees none of these at train time, so the P/R/F1 gap
    between the two families measures domain sensitivity
    (scripts/bench_detection.py --cross-domain).

    Returns (image [size, size, 3] float32, boxes [N, 4] float32 pixel
    (xmin, ymin, xmax, ymax)) — same contract as make_forest_scene.
    """
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)

    # directional illumination ramp (sun angle)
    ang = rng.rand() * 2 * np.pi
    ramp = (np.cos(ang) * xx + np.sin(ang) * yy) / size
    illum = 1.0 - shadow_strength * (ramp - ramp.min()) / max(
        ramp.max() - ramp.min(), 1e-6)

    base = background + rng.randn(size, size).astype(np.float32) * noise
    # understory clutter: dim, small, irregular blobs that are NOT crowns
    for _ in range(n_distractors):
        dcy, dcx = rng.uniform(0, size, 2)
        dr = rng.uniform(1.0, 2.5) / res / 2
        d2 = (yy - dcy) ** 2 + (xx - dcx) ** 2
        base += (rng.uniform(10, 30) * np.exp(-d2 / (2 * dr ** 2))).astype(
            np.float32)

    rgbw = np.stack([base * 0.55, base, base * 0.45], -1)

    centers, boxes = [], []
    sun_dy, sun_dx = np.sin(ang), np.cos(ang)
    attempts = 0
    while len(centers) < n_crowns and attempts < n_crowns * 60:
        attempts += 1
        d_m = rng.uniform(*diameter_range)
        r = (d_m / res) / 2.0
        occluding = centers and rng.rand() < occlusion_fraction
        if occluding:
            # deliberate partial overlap with an earlier crown
            b = centers[rng.randint(len(centers))]
            a2 = rng.rand() * 2 * np.pi
            dist = (b[2] + r) * rng.uniform(0.55, 0.85)
            cy, cx = b[0] + np.sin(a2) * dist, b[1] + np.cos(a2) * dist
        elif centers and rng.rand() < cluster_fraction:
            b = centers[rng.randint(len(centers))]
            a2 = rng.rand() * 2 * np.pi
            dist = (b[2] + r) * rng.uniform(1.0, 1.25)
            cy, cx = b[0] + np.sin(a2) * dist, b[1] + np.cos(a2) * dist
        else:
            cy, cx = rng.uniform(r, size - r), rng.uniform(r, size - r)
        if not (r <= cy <= size - r and r <= cx <= size - r):
            continue
        if not occluding and any(
            np.hypot(cy - oy, cx - ox) < min_separation * (r + orr)
            for (oy, ox, orr) in centers
        ):
            continue

        dist2 = (yy - cy) ** 2 + (xx - cx) ** 2
        inside = dist2 <= r * r
        if not inside.any():
            continue
        # clumpy multiplicative texture: coarse random field, smoothed by
        # nearest upsampling of a low-res grid
        g = max(2, int(r / 2))
        field = rng.uniform(0.55, 1.45, (g, g)).astype(np.float32)
        rows = (np.clip((yy - (cy - r)) / (2 * r), 0, 0.999) * g).astype(int)
        cols = (np.clip((xx - (cx - r)) / (2 * r), 0, 0.999) * g).astype(int)
        tex = field[rows, cols]
        peak = rng.uniform(110.0, 230.0)
        # hard-edged, textured disk (no radial falloff), rim slightly dim
        rim = np.clip(1.15 - np.sqrt(dist2) / max(r, 1e-6) * 0.35, 0.0, 1.0)
        lum = peak * tex * rim

        # per-crown canopy color: green -> yellow -> brown mix
        t = rng.rand()
        cr = 0.45 + 0.5 * t
        cg = 1.0 - 0.25 * t
        cb = 0.45 - 0.25 * t
        color = np.array([cr, cg, cb], np.float32) * rng.uniform(0.9, 1.1, 3)

        paint = lum[..., None] * color  # [H, W, 3]
        m3 = inside[..., None]
        # occluding crowns OVERWRITE, others blend by max
        rgbw = np.where(m3, paint if occluding else np.maximum(rgbw, paint),
                        rgbw)

        # cast shadow: darken an offset ellipse opposite the sun
        sh_cy, sh_cx = cy + sun_dy * r * 0.9, cx + sun_dx * r * 0.9
        sh2 = ((yy - sh_cy) / (1.3 * r)) ** 2 + ((xx - sh_cx) / (0.9 * r)) ** 2
        shadow = np.clip(1.0 - 0.5 * np.exp(-sh2), 0.55, 1.0)
        outside = ~inside
        rgbw *= np.where(outside, shadow, 1.0)[..., None]

        centers.append((cy, cx, r))
        boxes.append((cx - r, cy - r, cx + r, cy + r))

    rgbw *= illum[..., None]
    rgbw = np.clip(rgbw, 0, 255).astype(np.float32)
    return rgbw, np.asarray(boxes, np.float32).reshape(-1, 4)


def make_forest_tile(size=10000, res=0.1, crowns_per_km2=60000, seed=0,
                     diameter_range=(3.0, 10.0), background=40.0, noise=6.0):
    """Full-size synthetic RGB tile (e.g. 1 km^2 NEON camera mosaic at
    0.1 m = 10000^2 px) with ground-truth crown boxes, in uint8.

    make_forest_scene computes every blob over the full grid — O(size^2)
    PER CROWN, unusable at 10^4 px. Here crowns paint only their local
    window, and placement is grid-jittered (one crown per occupied cell) so
    no pairwise separation checks are needed. ~10^4-10^5 crowns render in
    seconds; this feeds the end-to-end tile wall-clock benchmark
    (scripts/bench_e2e_tile.py), where host decode of the ~300 MB tile is
    part of what's being measured.

    Returns (rgb uint8 [size, size, 3], boxes [N, 4] float32 pixel xyxy).
    """
    rng = np.random.RandomState(seed)
    km2 = (size * res / 1000.0) ** 2
    n_target = int(crowns_per_km2 * km2)
    lum = (background + rng.randn(size, size) * noise).astype(np.float32)

    # grid-jitter placement: cell pitch from target density
    pitch = size / max(np.sqrt(n_target), 1.0)
    n_side = int(size / pitch)
    cells = [(i, j) for i in range(n_side) for j in range(n_side)]
    rng.shuffle(cells)
    boxes = []
    for (ci, cj) in cells[:n_target]:
        d_m = rng.uniform(*diameter_range)
        r = (d_m / res) / 2.0
        cy = (ci + rng.uniform(0.3, 0.7)) * pitch
        cx = (cj + rng.uniform(0.3, 0.7)) * pitch
        if not (r < cy < size - r and r < cx < size - r):
            continue
        y0, y1 = int(cy - r), int(cy + r) + 1
        x0, x1 = int(cx - r), int(cx + r) + 1
        yy, xx = np.mgrid[y0:y1, x0:x1].astype(np.float32)
        ey, ex = rng.uniform(0.85, 1.15, 2)
        dist2 = ((yy - cy) * ey) ** 2 + ((xx - cx) * ex) ** 2
        peak = rng.uniform(90.0, 220.0)
        blob = peak * np.exp(-dist2 / (2 * (r / 1.6) ** 2))
        np.maximum(lum[y0:y1, x0:x1], background + blob.astype(np.float32),
                   out=lum[y0:y1, x0:x1])
        boxes.append((cx - r, cy - r, cx + r, cy + r))

    lum = np.clip(lum, 0, 255)
    rgb = np.empty((size, size, 3), np.uint8)
    rgb[..., 0] = (lum * 0.55).astype(np.uint8)
    rgb[..., 1] = lum.astype(np.uint8)
    rgb[..., 2] = (lum * 0.45).astype(np.uint8)
    return rgb, np.asarray(boxes, np.float32).reshape(-1, 4)
