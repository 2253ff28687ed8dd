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
    heat, size, mask = render_targets([np.array([[8, 8, 24, 24]])], (64, 64))
    assert heat.shape == (1, 16, 16)
    assert mask.sum() == 1
    ci, cj = np.unravel_index(np.argmax(heat[0]), heat[0].shape)
    assert (ci, cj) == (4, 4)
    np.testing.assert_allclose(size[0, ci, cj], [4, 4])


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
