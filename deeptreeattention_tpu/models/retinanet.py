"""RetinaNet-FPN crown detector in flax, with on-device decode.

The reference's production crown detection runs DeepForest's released
RetinaNet (torchvision retinanet_resnet50_fpn; reference
src/generate.py:17-42 drives it through deepforest.main.predict_image).
This module provides the same architecture TPU-natively so those weights are
a file-drop away (train/torch_import.import_retinanet):

- ResNet-50 body (models/resnet.py, features=True) -> C3/C4/C5
- FPN: 1x1 inner + 3x3 layer convs, nearest top-down merge, P6/P7 from P5
  (torchvision LastLevelP6P7(256, 256) semantics)
- shared classification/regression heads (4x conv3x3 + predictor, 9 anchors
  per location: 3 octave scales x 3 aspect ratios)
- decode: sigmoid scores, per-level top-k, box regression with the
  (1,1,1,1)-weight BoxCoder, clip, class-agnostic NMS — all inside one jit
  with static shapes (lax.fori_loop greedy suppression), so a whole batch of
  tile patches decodes on device without host round-trips.

Everything is single-class by default (DeepForest's "Tree"), but num_classes
is a knob. Inference-only: the reference never trains this detector either —
it consumes released weights.
"""
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from deeptreeattention_tpu.models.resnet import ResNet

# torchvision retinanet defaults
ANCHOR_SIZES = (32.0, 64.0, 128.0, 256.0, 512.0)  # per level P3..P7
ANCHOR_SCALES = (1.0, 2.0 ** (1.0 / 3.0), 2.0 ** (2.0 / 3.0))
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
NUM_ANCHORS = len(ANCHOR_SCALES) * len(ANCHOR_RATIOS)
STRIDES = (8, 16, 32, 64, 128)
BBOX_CLAMP = float(np.log(1000.0 / 16.0))


def _nearest_resize_hw(x, out_h, out_w):
    """torch F.interpolate(mode='nearest') semantics: src = floor(dst*in/out).
    Static gather indices — shapes are compile-time constants."""
    h, w = x.shape[1], x.shape[2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return x[:, rows][:, :, cols]


class FPN(nn.Module):
    """Feature pyramid over {c3, c4, c5} -> [P3, P4, P5, P6, P7] (256 ch)."""

    channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        cs = [feats["c3"], feats["c4"], feats["c5"]]
        inners = [
            nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    name="inner{}".format(i))(c)
            for i, c in enumerate(cs)
        ]
        # top-down: start at C5's lateral, merge downward with nearest upsample
        merged = [inners[-1]]
        for i in (1, 0):
            up = _nearest_resize_hw(
                merged[0], inners[i].shape[1], inners[i].shape[2])
            merged.insert(0, inners[i] + up)
        ps = [
            nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="layer{}".format(i))(m)
            for i, m in enumerate(merged)
        ]
        # LastLevelP6P7(256, 256): use_P5=True -> P6 from P5, P7 from relu(P6)
        p6 = nn.Conv(self.channels, (3, 3), (2, 2), padding="SAME",
                     dtype=self.dtype, name="p6")(ps[-1])
        p7 = nn.Conv(self.channels, (3, 3), (2, 2), padding="SAME",
                     dtype=self.dtype, name="p7")(nn.relu(p6))
        return ps + [p6, p7]


class RetinaNetHead(nn.Module):
    """Shared-weight classification + regression towers applied per level."""

    num_classes: int = 1
    num_anchors: int = NUM_ANCHORS
    channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid):
        cls_convs = [nn.Conv(self.channels, (3, 3), padding="SAME",
                             dtype=self.dtype, name="cls_conv{}".format(i))
                     for i in range(4)]
        reg_convs = [nn.Conv(self.channels, (3, 3), padding="SAME",
                             dtype=self.dtype, name="reg_conv{}".format(i))
                     for i in range(4)]
        cls_logits = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                             padding="SAME", dtype=self.dtype, name="cls_logits")
        bbox_reg = nn.Conv(self.num_anchors * 4, (3, 3), padding="SAME",
                           dtype=self.dtype, name="bbox_reg")
        logits, regs = [], []
        for p in pyramid:
            c = p
            for conv in cls_convs:
                c = nn.relu(conv(c))
            logits.append(cls_logits(c))
            r = p
            for conv in reg_convs:
                r = nn.relu(conv(r))
            regs.append(bbox_reg(r))
        return logits, regs


class RetinaNet(nn.Module):
    """Backbone + FPN + head; returns per-level (logits, regressions)."""

    num_classes: int = 1
    depth: int = 50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        feats = ResNet(num_classes=1, depth=self.depth, dtype=self.dtype,
                       name="body")(x, train=train, features=True)
        pyramid = FPN(dtype=self.dtype, name="fpn")(feats)
        return RetinaNetHead(num_classes=self.num_classes, dtype=self.dtype,
                             name="head")(pyramid)


def level_anchors(h, w, stride, size):
    """[h*w*A, 4] xyxy anchors for one pyramid level (torchvision
    AnchorGenerator: octave scales x aspect ratios, centered on stride grid).
    Host-side numpy: shapes are static per compiled program."""
    ws, hs = [], []
    for scale in ANCHOR_SCALES:
        area = (size * scale) ** 2
        for ratio in ANCHOR_RATIOS:
            # torchvision: h/w = ratio, w = sqrt(area/ratio)
            aw = np.sqrt(area / ratio)
            ah = aw * ratio
            ws.append(aw)
            hs.append(ah)
    ws = np.asarray(ws, np.float32)
    hs = np.asarray(hs, np.float32)
    base = np.stack([-ws / 2, -hs / 2, ws / 2, hs / 2], axis=1)  # [A, 4]
    # torchvision rounds base anchors
    base = np.round(base)
    cx = (np.arange(w, dtype=np.float32)) * stride
    cy = (np.arange(h, dtype=np.float32)) * stride
    shift_x, shift_y = np.meshgrid(cx, cy)
    shifts = np.stack([shift_x, shift_y, shift_x, shift_y],
                      axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4).astype(np.float32)


def decode_boxes(deltas, anchors):
    """torchvision BoxCoder.decode with weights (1,1,1,1)."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    dx, dy, dw, dh = deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3]
    dw = jnp.clip(dw, max=BBOX_CLAMP)
    dh = jnp.clip(dh, max=BBOX_CLAMP)
    cx = acx + dx * aw
    cy = acy + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=1)


def box_iou_matrix(boxes):
    """[N, N] pairwise IoU, xyxy."""
    x0, y0, x1, y1 = (boxes[:, i] for i in range(4))
    area = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    ix0 = jnp.maximum(x0[:, None], x0[None, :])
    iy0 = jnp.maximum(y0[:, None], y0[None, :])
    ix1 = jnp.minimum(x1[:, None], x1[None, :])
    iy1 = jnp.minimum(y1[:, None], y1[None, :])
    inter = jnp.maximum(ix1 - ix0, 0) * jnp.maximum(iy1 - iy0, 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_mask(boxes, scores, iou_threshold):
    """Greedy NMS keep-mask over score-DESCENDING-sorted candidates.

    O(N^2) IoU matrix + lax.fori_loop suppression: static shapes, no
    data-dependent control flow — the TPU-friendly formulation (N here is
    the post-top-k candidate count, ~hundreds)."""
    order = jnp.argsort(-scores)
    sboxes = boxes[order]
    iou = box_iou_matrix(sboxes)
    n = boxes.shape[0]

    def body(i, keep):
        # suppress j > i overlapping a kept i
        sup = (iou[i] > iou_threshold) & (jnp.arange(n) > i) & keep[i]
        return keep & ~sup

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones(n, bool))
    # scatter back to input order
    return jnp.zeros(n, bool).at[order].set(keep_sorted)


def build_decoder(image_hw, num_classes=1, score_thresh=0.05,
                  nms_thresh=0.5, topk_per_level=1000, max_detections=300):
    """Returns a jittable (logits_list, regs_list) -> (boxes, scores, labels,
    valid) decoder for a fixed padded image size.

    Output is fixed-size [max_detections]; `valid` masks real rows
    (score-threshold + NMS survivors). torchvision semantics: per-level
    top-k pre-selection, then one class-wise NMS over the union — for the
    single-class DeepForest case that is one class-agnostic NMS.
    """
    H, W = image_hw
    anchors_np, sizes = [], []
    for stride, size in zip(STRIDES, ANCHOR_SIZES):
        lh = int(np.ceil(H / stride))
        lw = int(np.ceil(W / stride))
        anchors_np.append(level_anchors(lh, lw, stride, size))
        sizes.append(lh * lw * NUM_ANCHORS)
    anchors_all = jnp.asarray(np.concatenate(anchors_np))

    def decode_one(logits_list, regs_list, hw=None):
        # hw: optional traced [2] float (true h, w). torchvision's
        # postprocess_detections clips to the TRUE image size BEFORE NMS
        # (the padded size only shapes the anchor grid); boxes fired
        # entirely inside the padded band clip to zero area and are
        # score-zeroed so they can never out-survive a real box.
        true_h = H if hw is None else hw[0]
        true_w = W if hw is None else hw[1]
        cand_boxes, cand_scores, cand_labels = [], [], []
        offset = 0
        for li, (logit, reg) in enumerate(zip(logits_list, regs_list)):
            # torchvision flattens the (anchor, class) axis before its
            # per-level top-k, so one anchor can contribute several classes;
            # anchor index = flat // K, class = flat % K (reduces to
            # max-per-anchor when K == 1, the DeepForest case)
            k = min(topk_per_level, sizes[li] * num_classes)
            flat = jax.nn.sigmoid(logit.reshape(-1))  # [HWA * K]
            top_scores, flat_idx = jax.lax.top_k(flat, k)
            top_idx = flat_idx // num_classes
            lab = flat_idx % num_classes
            deltas = reg.reshape(-1, 4)[top_idx]
            anch = anchors_all[offset:offset + sizes[li]][top_idx]
            boxes = decode_boxes(deltas, anch)
            boxes = jnp.stack([
                jnp.clip(boxes[:, 0], 0, true_w),
                jnp.clip(boxes[:, 1], 0, true_h),
                jnp.clip(boxes[:, 2], 0, true_w),
                jnp.clip(boxes[:, 3], 0, true_h),
            ], axis=1)
            cand_boxes.append(boxes)
            cand_scores.append(top_scores)
            cand_labels.append(lab)
            offset += sizes[li]
        boxes = jnp.concatenate(cand_boxes)
        scores = jnp.concatenate(cand_scores)
        labels = jnp.concatenate(cand_labels)
        scores = jnp.where(scores >= score_thresh, scores, 0.0)
        degenerate = ((boxes[:, 2] - boxes[:, 0]) <= 0) | (
            (boxes[:, 3] - boxes[:, 1]) <= 0)
        scores = jnp.where(degenerate, 0.0, scores)
        # torchvision batched_nms: per-class NMS via a per-class coordinate
        # offset so cross-class boxes never overlap (no-op for one class)
        nms_boxes = boxes
        if num_classes > 1:
            off = (labels * (max(H, W) + 2)).astype(boxes.dtype)
            nms_boxes = boxes + off[:, None]
        keep = nms_mask(nms_boxes, scores, nms_thresh) & (scores > 0)
        final_scores = jnp.where(keep, scores, 0.0)
        take = min(max_detections, int(final_scores.shape[0]))
        top_scores, top_idx = jax.lax.top_k(final_scores, take)
        return (boxes[top_idx], top_scores, labels[top_idx], top_scores > 0)

    return decode_one


# ImageNet statistics: torchvision's GeneralizedRCNNTransform normalizes
# inputs with these before the backbone
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class RetinaNetDetector:
    """data.detection.Detector-protocol adapter around flax RetinaNet.

    predict_image takes an HWC RGB array (uint8 or float), pads to a
    multiple of 32 (torchvision size_divisible batching), runs backbone +
    decode in ONE jit program per padded shape, and returns the reference's
    box-frame DataFrame (xmin/ymin/xmax/ymax in pixel coords, score, label)
    — the contract predict/tiles.find_crowns expects. Thresholds default to
    torchvision's; DeepForest release configs override them alongside the
    weights (train/torch_import.import_retinanet)."""

    label = "Tree"

    def __init__(self, variables=None, num_classes=1, depth=50,
                 score_thresh=0.1, nms_thresh=0.4, max_detections=300,
                 seed=0, dtype=jnp.float32):
        self.model = RetinaNet(num_classes=num_classes, depth=depth,
                               dtype=dtype)
        self.num_classes = num_classes
        self.score_thresh = score_thresh
        self.nms_thresh = nms_thresh
        self.max_detections = max_detections
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))
        self.variables = dict(variables)
        self._programs = {}

    @classmethod
    def from_torch(cls, state_or_path, **kwargs):
        from deeptreeattention_tpu.train import torch_import

        variables = torch_import.import_retinanet(
            state_or_path, num_classes=kwargs.get("num_classes", 1),
            depth=kwargs.get("depth", 50))
        return cls(variables=variables, **kwargs)

    def _program(self, hw):
        if hw not in self._programs:
            decoder = build_decoder(
                hw, num_classes=self.num_classes,
                score_thresh=self.score_thresh, nms_thresh=self.nms_thresh,
                max_detections=self.max_detections)
            model = self.model

            @jax.jit
            def run(params, batch_stats, x, hw):
                # hw [B, 2]: per-image TRUE (h, w) — decode clips to it
                # before NMS (torchvision postprocess_detections order)
                logits, regs = model.apply(
                    {"params": params, "batch_stats": batch_stats}, x,
                    train=False)
                outs = [decoder([l[i] for l in logits], [r[i] for r in regs],
                                hw[i])
                        for i in range(x.shape[0])]
                return jax.tree_util.tree_map(
                    lambda *a: jnp.stack(a), *outs)

            ph, pw = hw

            @jax.jit
            def run_raw(params, batch_stats, x, extents):
                # raw 0..255 input (uint8 stays uint8 across the host->device
                # transfer — 4x less relay traffic than normalized float32);
                # ImageNet normalization runs on device. torchvision pads
                # AFTER normalizing with zeros (GeneralizedRCNNTransform
                # batch_images), so the band past each image's true extent
                # is re-zeroed post-normalization.
                xf = (x.astype(jnp.float32) / 255.0 - _MEAN) / _STD
                rows = jnp.arange(ph)[None, :] < extents[:, 0:1]
                cols = jnp.arange(pw)[None, :] < extents[:, 1:2]
                mask = (rows[:, :, None] & cols[:, None, :])
                xf = xf * mask[..., None]
                return run(params, batch_stats, xf, extents)

            self._programs[hw] = (run, run_raw)
        return self._programs[hw]

    def _preprocess(self, image):
        # repo Detector protocol (and DeepForest's predict surface): pixel
        # values are 0..255 whether uint8 or float — always rescale
        img = np.asarray(image).astype(np.float32) / 255.0
        img = (img - _MEAN) / _STD
        h, w = img.shape[:2]
        ph = int(np.ceil(h / 32)) * 32
        pw = int(np.ceil(w / 32)) * 32
        if (ph, pw) != (h, w):
            img = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)))
        return img, (ph, pw)

    def predict_image(self, image):
        import pandas as pd

        img, hw = self._preprocess(image)
        run, _ = self._program(hw)
        h, w = np.asarray(image).shape[:2]
        boxes, scores, labels, valid = run(
            self.variables["params"],
            self.variables.get("batch_stats", {}), img[None],
            jnp.asarray([[h, w]], jnp.float32))
        v = np.asarray(valid[0])
        boxes = np.asarray(boxes[0])[v]
        if boxes.size == 0:
            return None
        return pd.DataFrame({
            "xmin": boxes[:, 0],
            "ymin": boxes[:, 1],
            "xmax": boxes[:, 2],
            "ymax": boxes[:, 3],
            "score": np.asarray(scores[0])[v],
            "label": self.label,
        })

    def predict_tile(self, path, patch_size=400, overlap=0, batch=8):
        """Windowed tile sweep with the patch grid BATCHED through the jit
        forward+decode program (the base protocol loops patches one at a
        time; DeepForest also sweeps 400-px windows serially,
        reference src/generate.py:17-42 via predict_image)."""
        import pandas as pd

        from deeptreeattention_tpu.geo import raster

        with raster.open_raster(path) as src:
            img = np.moveaxis(src.read(), 0, -1)
        if img.shape[-1] > 3:
            img = img[..., :3]
        h, w = img.shape[:2]
        step = patch_size - overlap
        origins = [(r0, c0) for r0 in range(0, h, step)
                   for c0 in range(0, w, step)]
        pad = int(np.ceil(patch_size / 32)) * 32
        _, run_raw = self._program((pad, pad))

        # raw-pixel chunks go to the device (uint8 tiles stay uint8: 4x less
        # relay upload than normalized float32, the sweep's measured floor);
        # ImageNet normalization + pad re-zeroing happen inside the program
        stack_dtype = img.dtype if img.dtype == np.uint8 else np.float32
        frames = []
        for s in range(0, len(origins), batch):
            group = origins[s:s + batch]
            stack = np.zeros((batch, pad, pad, 3), stack_dtype)
            extents = np.full((batch, 2), float(patch_size), np.float32)
            for g, (r0, c0) in enumerate(group):
                chunk = img[r0:r0 + patch_size, c0:c0 + patch_size]
                ch, cw = chunk.shape[0], chunk.shape[1]
                stack[g, :ch, :cw] = chunk
                extents[g] = (ch, cw)
            boxes_b, scores_b, _, valid_b = run_raw(
                self.variables["params"],
                self.variables.get("batch_stats", {}), jnp.asarray(stack),
                jnp.asarray(extents))
            # host boundary: standard float32 regardless of compute dtype —
            # a bf16 detector otherwise leaks ml_dtypes.bfloat16 columns
            # into the DataFrame (pandas cannot concat them) and rounds
            # pixel coordinates when the chunk offset is added
            boxes_b = np.asarray(boxes_b, np.float32)
            scores_b = np.asarray(scores_b, np.float32)
            valid_b = np.asarray(valid_b)
            for g, (r0, c0) in enumerate(group):
                # decode already clipped to the true chunk extent before NMS
                # and zero-scored degenerate (padding-band) boxes; `valid`
                # therefore only contains boxes inside the real tile area
                v = valid_b[g]
                if not v.any():
                    continue
                bx = boxes_b[g][v]
                frames.append(pd.DataFrame({
                    "xmin": bx[:, 0] + c0, "ymin": bx[:, 1] + r0,
                    "xmax": bx[:, 2] + c0, "ymax": bx[:, 3] + r0,
                    "score": scores_b[g][v], "label": self.label,
                }))
        if not frames:
            return None
        out = pd.concat(frames, ignore_index=True)
        out["image_path"] = path
        return out
