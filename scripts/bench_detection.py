"""Detection-quality benchmark: P/R/F1 over synthetic 120-crown scenes.

Measures the classical CrownDetector and the trained CenterNet
(LearnedDetector) against known ground truth — precision, recall, F1 and
mean matched IoU per seed, plus the aggregate — and writes
BENCH_DETECTION.json at the repo root (driver-parseable, VERDICT round-2
item 5).

    DTA_PLATFORM=cpu python scripts/bench_detection.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeptreeattention_tpu.data.detection import CrownDetector
from deeptreeattention_tpu.data.synthetic import (
    detection_prf, make_forest_scene, make_textured_scene)
from deeptreeattention_tpu.models.detector import LearnedDetector

RES = 0.5
EVAL_SEEDS = (0, 1, 2)
TRAIN_SEEDS = range(10, 14)


def crops(scene_seeds, patch=96, crops_per_scene=30, seed=0,
          scene_fn=make_forest_scene):
    rng = np.random.RandomState(seed)
    scenes, blists = [], []
    for s in scene_seeds:
        img, gt = scene_fn(n_crowns=120, size=512, res=RES, seed=s)
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


def evaluate(predict, name, scene_fn=make_forest_scene):
    per_seed = []
    for seed in EVAL_SEEDS:
        img, gt = scene_fn(n_crowns=120, size=512, res=RES, seed=seed)
        boxes = predict(img)
        m = detection_prf(
            boxes[["xmin", "ymin", "xmax", "ymax"]].values, gt,
            scores=boxes.score.values,
        )
        m["seed"] = seed
        per_seed.append(m)
        print("  seed {}: P {:.3f} R {:.3f} F1 {:.3f} (IoU {:.3f}, {} pred / {} gt)".format(
            seed, m["precision"], m["recall"], m["f1"],
            m["mean_matched_iou"], m["n_pred"], m["n_gt"]))
    agg = {
        "precision": float(np.mean([m["precision"] for m in per_seed])),
        "recall": float(np.mean([m["recall"] for m in per_seed])),
        "f1": float(np.mean([m["f1"] for m in per_seed])),
        "mean_matched_iou": float(np.mean([m["mean_matched_iou"] for m in per_seed])),
        "n_gt_total": int(sum(m["n_gt"] for m in per_seed)),
    }
    print("{}: P {precision:.3f} R {recall:.3f} F1 {f1:.3f} over {n_gt_total} crowns".format(
        name, **agg))
    return {"aggregate": agg, "per_seed": per_seed}


def main():
    results = {"resolution_m": RES, "scene": "make_forest_scene(n_crowns=120, size=512)"}

    print("CrownDetector (classical, crown_diameter=5):")
    det = CrownDetector(crown_diameter=5.0)
    results["crown_detector"] = evaluate(
        lambda img: det.predict_array(img, res=RES), "CrownDetector")
    print("CrownDetector on textured (out-of-family) scenes:")
    results["crown_detector_textured"] = evaluate(
        lambda img: det.predict_array(img, res=RES), "CrownDetector/textured",
        scene_fn=make_textured_scene)

    print("LearnedDetector (CenterNet, trained on forest scenes 10-13):")
    scenes, blists = crops(TRAIN_SEEDS)
    ldet = LearnedDetector(width=16, patch=96, threshold=0.25)
    losses = ldet.fit(scenes, blists, steps=1500, batch_size=8)
    results["learned_detector"] = evaluate(ldet.predict_image, "LearnedDetector")
    results["learned_detector"]["train_loss_first_last"] = [losses[0], losses[-1]]

    # cross-domain: same weights, out-of-family scene family (shadows,
    # crown texture, occlusion, color jitter, understory distractors)
    print("LearnedDetector CROSS-DOMAIN (trained forest -> eval textured):")
    results["learned_detector_cross_domain"] = evaluate(
        ldet.predict_image, "LearnedDetector/forest->textured",
        scene_fn=make_textured_scene)

    # reverse direction: trained on textured, evaluated on both
    print("LearnedDetector (trained on textured scenes 10-13):")
    scenes_t, blists_t = crops(TRAIN_SEEDS, scene_fn=make_textured_scene)
    ldet_t = LearnedDetector(width=16, patch=96, threshold=0.25)
    ldet_t.fit(scenes_t, blists_t, steps=1500, batch_size=8)
    results["learned_detector_textured_infamily"] = evaluate(
        ldet_t.predict_image, "LearnedDetector/textured->textured",
        scene_fn=make_textured_scene)
    print("LearnedDetector CROSS-DOMAIN (trained textured -> eval forest):")
    results["learned_detector_cross_domain_reverse"] = evaluate(
        ldet_t.predict_image, "LearnedDetector/textured->forest")

    # mitigation: train on BOTH families (the production answer to the
    # cross-domain drop measured above)
    print("LearnedDetector (trained on forest+textured mix):")
    scenes_m = np.concatenate([scenes, scenes_t])
    blists_m = blists + blists_t
    ldet_m = LearnedDetector(width=16, patch=96, threshold=0.25)
    ldet_m.fit(scenes_m, blists_m, steps=1500, batch_size=8)
    results["learned_detector_mixed_on_forest"] = evaluate(
        ldet_m.predict_image, "LearnedDetector/mixed->forest")
    results["learned_detector_mixed_on_textured"] = evaluate(
        ldet_m.predict_image, "LearnedDetector/mixed->textured",
        scene_fn=make_textured_scene)

    fwd = results["learned_detector"]["aggregate"]["f1"]
    xd = results["learned_detector_cross_domain"]["aggregate"]["f1"]
    results["cross_domain_f1_drop"] = round(fwd - xd, 4)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_DETECTION.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
