"""RetinaNet-FPN: torchvision/DeepForest state_dict import (structure +
shapes), decode math vs a numpy re-derivation, NMS correctness, and the
Detector-protocol adapter end to end.

The reference's production detector is DeepForest's released RetinaNet
(reference src/generate.py:17-42); these tests make its weight format a
file-drop (train/torch_import.import_retinanet) without needing the
weights themselves (synthesized state_dict, pattern of
tests/test_resnet_import.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeptreeattention_tpu.models import retinanet
from deeptreeattention_tpu.train import torch_import
from tests.test_resnet_import import synth_torchvision_resnet50_state


def synth_retinanet_state(num_classes=1, seed=0, conv_norm_activation=False):
    """torchvision retinanet_resnet50_fpn-format state_dict with random
    weights. conv_norm_activation=True emits the newer `conv.{i}.0.weight`
    head/FPN naming; False the classic `conv.{0,2,4,6}.weight` Sequential."""
    rng = np.random.RandomState(seed)
    state = {}
    body = synth_torchvision_resnet50_state(num_classes=2, seed=seed)
    body.pop("fc.weight"), body.pop("fc.bias")
    state.update({"backbone.body." + k: v for k, v in body.items()})

    def conv(name, o, i, k):
        state[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.02
        state[name + ".bias"] = 0.01 * rng.randn(o).astype(np.float32)

    suffix = ".0" if conv_norm_activation else ""
    for i, cin in enumerate((512, 1024, 2048)):
        conv("backbone.fpn.inner_blocks.{}{}".format(i, suffix), 256, cin, 1)
        conv("backbone.fpn.layer_blocks.{}{}".format(i, suffix), 256, 256, 3)
    conv("backbone.fpn.extra_blocks.p6", 256, 256, 3)
    conv("backbone.fpn.extra_blocks.p7", 256, 256, 3)
    for tower in ("classification_head", "regression_head"):
        for i in range(4):
            idx = "{}.0".format(i) if conv_norm_activation else str(2 * i)
            conv("head.{}.conv.{}".format(tower, idx), 256, 256, 3)
    conv("head.classification_head.cls_logits", 9 * num_classes, 256, 3)
    conv("head.regression_head.bbox_reg", 9 * 4, 256, 3)
    return state


@pytest.mark.parametrize("cna", [False, True])
def test_import_retinanet_structure(cna):
    """Every imported tensor lands on a module the flax init also creates,
    with identical shapes — both torchvision head naming generations."""
    state = synth_retinanet_state(conv_norm_activation=cna)
    imported = torch_import.import_retinanet(state)

    model = retinanet.RetinaNet(num_classes=1)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    imp_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, imported)
    assert ref_shapes["params"] == imp_shapes["params"]
    assert ref_shapes["batch_stats"] == imp_shapes["batch_stats"]


def test_import_retinanet_lightning_prefix():
    state = {"model." + k: v for k, v in synth_retinanet_state().items()}
    imported = torch_import.import_retinanet(state)
    assert "body" in imported["params"] and "fpn" in imported["params"]


def test_decode_boxes_matches_numpy():
    """BoxCoder.decode with (1,1,1,1) weights, dw/dh clamp at log(1000/16)."""
    rng = np.random.RandomState(3)
    anchors = np.abs(rng.rand(20, 2)) * 50
    anchors = np.concatenate([anchors, anchors + 10 + rng.rand(20, 2) * 40],
                             axis=1).astype(np.float32)
    deltas = rng.randn(20, 4).astype(np.float32)
    deltas[0, 2] = 10.0  # exercises the clamp

    out = np.asarray(retinanet.decode_boxes(jnp.asarray(deltas),
                                            jnp.asarray(anchors)))
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + aw / 2
    acy = anchors[:, 1] + ah / 2
    dw = np.minimum(deltas[:, 2], np.log(1000 / 16))
    dh = np.minimum(deltas[:, 3], np.log(1000 / 16))
    cx = acx + deltas[:, 0] * aw
    cy = acy + deltas[:, 1] * ah
    w = aw * np.exp(dw)
    h = ah * np.exp(dh)
    exp = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-3)


def test_nms_mask_matches_greedy_numpy():
    rng = np.random.RandomState(5)
    n = 64
    xy = rng.rand(n, 2) * 80
    wh = 5 + rng.rand(n, 2) * 20
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)

    keep = np.asarray(retinanet.nms_mask(jnp.asarray(boxes),
                                         jnp.asarray(scores), 0.5))

    def iou(a, b):
        ix0 = max(a[0], b[0]); iy0 = max(a[1], b[1])
        ix1 = min(a[2], b[2]); iy1 = min(a[3], b[3])
        inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / max(ua, 1e-9)

    order = np.argsort(-scores)
    expected = np.zeros(n, bool)
    suppressed = set()
    for ii, i in enumerate(order):
        if i in suppressed:
            continue
        expected[i] = True
        for j in order[ii + 1:]:
            if j not in suppressed and iou(boxes[i], boxes[j]) > 0.5:
                suppressed.add(j)
    np.testing.assert_array_equal(keep, expected)


def test_level_anchors_basic():
    a = retinanet.level_anchors(2, 3, stride=8, size=32.0)
    assert a.shape == (2 * 3 * 9, 4)
    # first anchor: scale 1.0, ratio 0.5 -> w=sqrt(1024/0.5)=45.25, h=22.6
    w0 = a[0, 2] - a[0, 0]
    h0 = a[0, 3] - a[0, 1]
    assert abs(w0 - 2 * round(np.sqrt(32 ** 2 / 0.5) / 2)) <= 1.0
    assert h0 < w0
    # grid offset: anchor block 1 is shifted one stride in x
    np.testing.assert_allclose(a[9] - a[0], [8, 0, 8, 0], atol=1e-5)


def test_decoder_clips_to_true_size_before_nms():
    """torchvision postprocess_detections clips to the TRUE image size
    before NMS; a confident box living entirely in the padded band must
    clip to zero area and never reach the output (round-4 review finding)."""
    H = W = 64
    decoder = retinanet.build_decoder((H, W), score_thresh=0.05,
                                      max_detections=10)
    sizes = [int(np.ceil(H / s)) * int(np.ceil(W / s)) * retinanet.NUM_ANCHORS
             for s in retinanet.STRIDES]
    logits = [np.full((int(np.ceil(H / s)), int(np.ceil(W / s)),
                       retinanet.NUM_ANCHORS), -20.0, np.float32)
              for s in retinanet.STRIDES]
    regs = [np.zeros((int(np.ceil(H / s)), int(np.ceil(W / s)),
                      retinanet.NUM_ANCHORS * 4), np.float32)
            for s in retinanet.STRIDES]
    # P3 grid is 8x8 (stride 8). True extent (40, 40): cell (7, 7) sits at
    # x=y=56 — its anchors live past 40 entirely. Cell (1, 1) is real.
    logits[0][7, 7, :] = 8.0   # pad-band box
    logits[0][1, 1, 4] = 8.0   # real box (ratio-1.0 anchor)
    logits = [jnp.asarray(l.reshape(l.shape[0], l.shape[1], -1))
              for l in logits]
    regs = [jnp.asarray(r) for r in regs]

    boxes, scores, labels, valid = decoder(logits, regs,
                                           jnp.asarray([40.0, 40.0]))
    boxes = np.asarray(boxes)[np.asarray(valid)]
    assert len(boxes) >= 1
    assert (boxes[:, 2] <= 40).all() and (boxes[:, 3] <= 40).all()
    # every surviving box has positive area (no pad-band slivers)
    assert ((boxes[:, 2] - boxes[:, 0]) > 0).all()
    assert ((boxes[:, 3] - boxes[:, 1]) > 0).all()
    del sizes


def test_import_retinanet_rejects_v2_groupnorm_head():
    """A retinanet_resnet50_fpn_v2-style head (Conv2dNormActivation with
    GroupNorm) must fail loudly, not import with the norm silently dropped."""
    state = synth_retinanet_state(conv_norm_activation=True)
    state["head.classification_head.conv.0.1.weight"] = np.ones(256, np.float32)
    state["head.classification_head.conv.0.1.bias"] = np.zeros(256, np.float32)
    with pytest.raises(ValueError, match="GroupNorm"):
        torch_import.import_retinanet(state)


def test_preprocess_float_and_uint8_agree():
    """Detector protocol: pixel values are 0..255 whether uint8 or float."""
    det = retinanet.RetinaNetDetector.__new__(retinanet.RetinaNetDetector)
    img8 = (np.random.RandomState(0).rand(33, 41, 3) * 255).astype(np.uint8)
    a, hwa = det._preprocess(img8)
    b, hwb = det._preprocess(img8.astype(np.float32))
    assert hwa == hwb == (64, 64)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_detector_adapter_end_to_end():
    """predict_image on a random-weight model: pads to /32, runs one jit
    program, returns the reference box-frame schema with in-bounds boxes."""
    import pandas as pd

    det = retinanet.RetinaNetDetector(score_thresh=0.0, max_detections=50)
    img = (np.random.RandomState(0).rand(100, 90, 3) * 255).astype(np.uint8)
    boxes = det.predict_image(img)
    if boxes is None:  # random weights may score everything ~0.5 either side
        pytest.skip("random-weight detector produced no boxes")
    assert isinstance(boxes, pd.DataFrame)
    assert {"xmin", "ymin", "xmax", "ymax", "score", "label"} <= set(boxes.columns)
    assert (boxes.xmax <= 90).all() and (boxes.ymax <= 100).all()
    assert (boxes.xmin >= 0).all() and (boxes.ymin >= 0).all()
    assert (boxes.label == "Tree").all()


def test_imported_weights_run_forward():
    state = synth_retinanet_state()
    det = retinanet.RetinaNetDetector.from_torch(state, score_thresh=0.0,
                                                 max_detections=20)
    img = (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
    out = det.predict_image(img)
    assert out is None or len(out) <= 20


def test_predict_tile_batched_matches_patch_grid(tmp_path):
    """The batched tile sweep covers the patch grid and stays in-bounds."""
    from deeptreeattention_tpu.geo import raster
    from deeptreeattention_tpu.geo.affine import Affine

    rng = np.random.RandomState(2)
    img = (rng.rand(3, 200, 180) * 255).astype(np.uint8)
    path = str(tmp_path / "2021_OSBS_5_405000_3286000_image.tif")
    raster.write_raster(path, img, crs=32617,
                        transform=Affine(0.1, 0, 405000, 0, -0.1, 3286000))

    det = retinanet.RetinaNetDetector(score_thresh=0.0, max_detections=10)
    out = det.predict_tile(path, patch_size=96, overlap=0, batch=4)
    if out is None:
        pytest.skip("random weights produced no boxes")
    assert (out.xmin >= 0).all() and (out.xmax <= 180).all()
    assert (out.ymin >= 0).all() and (out.ymax <= 200).all()
    assert (out.image_path == path).all()
    # boxes appear beyond the first patch (grid actually swept)
    assert out[["xmin", "ymin"]].max().max() > 96 or len(out) >= 10


def test_predict_tile_device_normalization_matches_predict_image(tmp_path):
    """The tile sweep uploads RAW uint8 and normalizes on device (4x less
    relay traffic); a single-patch tile must reproduce the host-normalized
    predict_image boxes, including the pad band re-zeroed AFTER
    normalization (torchvision batch_images order)."""
    from deeptreeattention_tpu.geo import raster
    from deeptreeattention_tpu.geo.affine import Affine

    rng = np.random.RandomState(7)
    # 90x96: pads to 96x96 on both paths, and the 6-row pad band would
    # diverge if it were zeroed before normalization instead of after
    img = (rng.rand(3, 90, 96) * 255).astype(np.uint8)
    path = str(tmp_path / "2021_OSBS_5_405000_3286000_image.tif")
    raster.write_raster(path, img, crs=32617,
                        transform=Affine(0.1, 0, 405000, 0, -0.1, 3286000))

    det = retinanet.RetinaNetDetector(score_thresh=0.0, max_detections=10)
    via_tile = det.predict_tile(path, patch_size=96, overlap=0, batch=1)
    via_image = det.predict_image(np.moveaxis(img, 0, -1))
    if via_tile is None or via_image is None:
        pytest.skip("random weights produced no boxes")
    assert len(via_tile) == len(via_image)
    for col in ("xmin", "ymin", "xmax", "ymax", "score"):
        np.testing.assert_allclose(via_tile[col], via_image[col],
                                   rtol=1e-4, atol=1e-3)


def test_predict_tile_bf16_returns_float32_frame(tmp_path):
    """A bfloat16 detector must hand back standard float32 columns: bf16
    numpy columns break pd.concat (NotImplementedError in pandas NA
    handling — hit by scripts/bench_detect_tile.py's wall-clock record)
    and round pixel coordinates once chunk offsets are added."""
    from deeptreeattention_tpu.geo import raster
    from deeptreeattention_tpu.geo.affine import Affine

    rng = np.random.RandomState(4)
    img = (rng.rand(3, 200, 180) * 255).astype(np.uint8)
    path = str(tmp_path / "2021_OSBS_5_405000_3286000_image.tif")
    raster.write_raster(path, img, crs=32617,
                        transform=Affine(0.1, 0, 405000, 0, -0.1, 3286000))

    det = retinanet.RetinaNetDetector(score_thresh=0.0, max_detections=10,
                                      dtype=jnp.bfloat16)
    out = det.predict_tile(path, patch_size=96, overlap=0, batch=4)
    if out is None:
        pytest.skip("random weights produced no boxes")
    for col in ("xmin", "ymin", "xmax", "ymax", "score"):
        assert out[col].dtype == np.float32, (col, out[col].dtype)


def test_decoder_multiclass_flattened_topk_and_per_class_nms():
    """K>1 semantics (torchvision RetinaNet postprocess_detections):

    * top-k runs over the FLATTENED (anchor, class) axis, so one anchor
      can contribute several classes;
    * NMS is per class (batched_nms): overlapping boxes of DIFFERENT
      classes both survive, same-class overlaps are suppressed.
    """
    H = W = 64
    K = 3
    decoder = retinanet.build_decoder((H, W), num_classes=K,
                                      score_thresh=0.05, nms_thresh=0.5,
                                      max_detections=10)
    logits = [np.full((int(np.ceil(H / s)), int(np.ceil(W / s)),
                       retinanet.NUM_ANCHORS * K), -20.0, np.float32)
              for s in retinanet.STRIDES]
    regs = [np.zeros((int(np.ceil(H / s)), int(np.ceil(W / s)),
                      retinanet.NUM_ANCHORS * 4), np.float32)
            for s in retinanet.STRIDES]
    a = 4  # ratio-1.0 anchor; same index in both cells so boxes are congruent
    # cell (1,1): ONE anchor fires TWO classes (flattened top-k must keep both)
    logits[0][1, 1, a * K + 1] = 8.0
    logits[0][1, 1, a * K + 0] = 5.0
    # cell (1,2), 8 px right (IoU ~ 0.67 with the (1,1) box):
    #   same class 1 -> suppressed by per-class NMS
    #   class 2      -> survives (cross-class overlap is allowed)
    logits[0][1, 2, a * K + 1] = 7.0
    logits[0][1, 2, a * K + 2] = 6.0

    boxes, scores, labels, valid = decoder(
        [jnp.asarray(l) for l in logits], [jnp.asarray(r) for r in regs])
    valid = np.asarray(valid)
    boxes = np.asarray(boxes)[valid]
    scores = np.asarray(scores)[valid]
    labels = np.asarray(labels)[valid]

    assert len(scores) == 3
    # score order: (1,1) cls1 > (1,2) cls2 > (1,1) cls0; the 0.999-scoring
    # (1,2) cls1 candidate is gone despite outscoring both survivors below it
    np.testing.assert_array_equal(labels, [1, 2, 0])
    np.testing.assert_allclose(
        scores, [1 / (1 + np.exp(-8.0)), 1 / (1 + np.exp(-6.0)),
                 1 / (1 + np.exp(-5.0))], rtol=1e-5)
    # the two classes fired by the SAME anchor decode to the SAME box
    np.testing.assert_allclose(boxes[0], boxes[2], atol=1e-5)
    # the surviving cls-2 box is the (1,2) cell's: one stride right in x
    # (xmax — xmin clips to 0 for both cells with the ~40 px anchor)
    np.testing.assert_allclose(boxes[1][2] - boxes[0][2], 8.0, atol=1e-4)
