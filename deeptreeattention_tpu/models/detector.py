"""Trainable crown detector: anchor-free center-heatmap network in flax.

The reference delegates crown detection to a pretrained DeepForest RetinaNet
(reference src/generate.py:17-60). Offline and TPU-native, this module
provides a trainable replacement with the same Detector protocol
(data/detection.py): a small conv backbone predicts a crown-center heatmap
plus per-center box sizes at stride 4 (CenterNet-style — peaks are crowns,
no anchors, no NMS beyond a 3x3 local-max). Train on any boxes dataframe
(e.g. hand labels or DeepForest outputs); inference decodes top-K peaks.

Loss: penalty-reduced focal on the heatmap + L1 on sizes at center pixels.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from deeptreeattention_tpu.data.detection import Detector
from deeptreeattention_tpu.train import checkpoints, optim

STRIDE = 4


class CrownDetectorNet(nn.Module):
    """Conv backbone -> (heatmap [H/4, W/4, 1], sizes [H/4, W/4, 2])."""

    width: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        w = self.width
        x = x.astype(self.dtype) / 255.0
        # dilations widen the receptive field to ~100 px so crown-scale
        # objects (NEON crowns are 50-100 px at 0.1 m) can be localized
        ladder = [(w, 2, 1), (w * 2, 2, 1), (w * 2, 1, 2), (w * 4, 1, 4)]
        for i, (filters, stride, dilation) in enumerate(ladder):
            x = nn.Conv(filters, (3, 3), (stride, stride), padding="SAME",
                        kernel_dilation=(dilation, dilation),
                        dtype=self.dtype, name="conv{}".format(i))(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="bn{}".format(i))(x)
            x = nn.relu(x)
        heat = nn.Conv(1, (1, 1), name="heat",
                       bias_init=nn.initializers.constant(-2.19))(x)  # sigmoid ~0.1 prior
        size = nn.Conv(2, (1, 1), name="size")(x)
        # sub-stride center offset (CenterNet's O head): at stride 4 a
        # cell-center box can be off by 2 px per axis — on a 12 px crown
        # that alone caps IoU near 0.7, so regress the residual. Range
        # covers the 3x3 supervised neighborhood (render_targets), so a
        # local-max that lands one cell off the true center still decodes
        # to the exact box center
        off = nn.Conv(2, (1, 1), name="offset")(x)
        return (jax.nn.sigmoid(heat[..., 0]).astype(jnp.float32),
                jnp.maximum(size, 0.0).astype(jnp.float32),
                jnp.clip(off, -2.0, 2.0).astype(jnp.float32))


def render_targets(boxes_list, hw, stride=STRIDE, sigma=None):
    """Ground-truth heatmaps/sizes from per-image box lists.

    boxes_list: list (len B) of [N_i, 4] pixel boxes (xmin, ymin, xmax, ymax).
    Returns (heat [B, h, w], size [B, h, w, 2], mask [B, h, w]).
    sigma: fixed gaussian width in heat cells; default scales with the box
    (CenterNet's adaptive radius) so 100-px crowns get soft targets instead
    of a single hot cell in a 25-cell-wide object.
    """
    H, W = hw
    h, w = H // stride, W // stride
    B = len(boxes_list)
    heat = np.zeros((B, h, w), np.float32)
    size = np.zeros((B, h, w, 2), np.float32)
    off = np.zeros((B, h, w, 2), np.float32)
    mask = np.zeros((B, h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for b, boxes in enumerate(boxes_list):
        for (x0, y0, x1, y1) in np.asarray(boxes, float).reshape(-1, 4):
            cx = (x0 + x1) / 2 / stride
            cy = (y0 + y1) / 2 / stride
            ci, cj = int(np.clip(cy, 0, h - 1)), int(np.clip(cx, 0, w - 1))
            s = sigma
            if s is None:
                s = max(min(x1 - x0, y1 - y0) / stride / 6.0, 1.5)
            g = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s**2))
            heat[b] = np.maximum(heat[b], g)
            # the exact-center cell is the positive; keep it at 1
            heat[b, ci, cj] = 1.0
            # supervise size + offset over the 3x3 neighborhood: the 3x3
            # local-max decode can fire one cell off the true center, and
            # an exact-center-only target would leave that cell's size and
            # offset UNTRAINED (masked out of the loss) — the dominant
            # residual IoU loss measured in round 4. Per-cell offsets point
            # every neighbor back at the true box center.
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    ni, nj = ci + di, cj + dj
                    if not (0 <= ni < h and 0 <= nj < w):
                        continue
                    if mask[b, ni, nj] and (di or dj):
                        continue  # never overwrite another crown's center
                    size[b, ni, nj] = ((x1 - x0) / stride, (y1 - y0) / stride)
                    off[b, ni, nj] = (cx - (nj + 0.5), cy - (ni + 0.5))
                    mask[b, ni, nj] = 1.0
    return heat, size, off, mask


def detector_loss(pred_heat, pred_size, heat, size, mask, alpha=2.0, beta=4.0,
                  pred_off=None, off=None):
    """Penalty-reduced focal (CenterNet eq. 1) + masked L1 size loss
    + masked L1 offset loss (CenterNet eq. 2/3 weights: 0.1 size, 1.0 off)."""
    eps = 1e-6
    p = jnp.clip(pred_heat, eps, 1 - eps)
    pos = jnp.where(heat >= 0.999, 1.0, 0.0)
    pos_loss = -pos * ((1 - p) ** alpha) * jnp.log(p)
    neg_loss = -(1 - pos) * ((1 - heat) ** beta) * (p**alpha) * jnp.log(1 - p)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    focal = (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos
    # size/offset normalize by the supervised-cell count (the 3x3
    # neighborhoods render_targets writes), keeping the regression weight
    # independent of how many cells carry targets per crown
    n_sup = jnp.maximum(jnp.sum(mask), 1.0)
    l1 = jnp.sum(jnp.abs(pred_size - size) * mask[..., None]) / n_sup
    loss = focal + 0.1 * l1
    if pred_off is not None:
        loss = loss + jnp.sum(
            jnp.abs(pred_off - off) * mask[..., None]) / n_sup
    return loss


def decode(heat, size, off=None, stride=STRIDE, threshold=0.3, top_k=200):
    """Heatmap -> boxes df (pixel coords). 3x3 local-max suppression;
    `off` (sub-cell center residuals) refines peaks past stride quantization."""
    heat = np.asarray(heat)
    size = np.asarray(size)
    off = None if off is None else np.asarray(off)
    from scipy import ndimage

    local_max = ndimage.maximum_filter(heat, size=3) == heat
    ys, xs = np.nonzero(local_max & (heat > threshold))
    scores = heat[ys, xs]
    order = np.argsort(-scores)[:top_k]
    rows = []
    for k in order:
        i, j = ys[k], xs[k]
        bw, bh = size[i, j, 0] * stride, size[i, j, 1] * stride
        cx, cy = j * stride + stride / 2, i * stride + stride / 2
        if off is not None:
            cx += off[i, j, 0] * stride
            cy += off[i, j, 1] * stride
        rows.append(
            {
                "xmin": cx - bw / 2, "ymin": cy - bh / 2,
                "xmax": cx + bw / 2, "ymax": cy + bh / 2,
                "score": float(heat[i, j]), "label": "Tree",
            }
        )
    return pd.DataFrame(rows)


class LearnedDetector(Detector):
    """Detector-protocol adapter around a trained CrownDetectorNet."""

    def __init__(self, config=None, width=32, seed=0, patch=256, threshold=0.3):
        self.model = CrownDetectorNet(width=width)
        self.patch = patch
        self.threshold = threshold
        key = jax.random.PRNGKey(seed)
        self.variables = dict(
            self.model.init(key, jnp.zeros((1, patch, patch, 3), jnp.float32))
        )
        lr = (config or {}).get("detector_lr", 1e-3)
        self.optimizer = optim.adam_with_plateau(lr)
        self.opt_state = self.optimizer.init(self.variables["params"])
        self._build_steps()

    def _build_steps(self):
        model = self.model
        optimizer = self.optimizer

        @jax.jit
        def train_step(params, batch_stats, opt_state, images, heat, size,
                       off, mask):
            def loss_fn(p):
                (ph, ps, po), mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, images,
                    train=True, mutable=["batch_stats"],
                )
                return detector_loss(ph, ps, heat, size, mask,
                                     pred_off=po, off=off), mut["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            import optax

            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), stats, opt_state, loss

        @jax.jit
        def infer_step(params, batch_stats, images):
            return model.apply({"params": params, "batch_stats": batch_stats}, images)

        self._train_step = train_step
        self._infer_step = infer_step

    def fit(self, images, boxes_list, steps=200, batch_size=8, seed=0, log_every=50):
        """images: [N, H, W, 3] uint8/float; boxes_list: list of [n_i, 4]."""
        images = np.asarray(images, np.float32)
        heat, size, off, mask = render_targets(boxes_list, images.shape[1:3])
        rng = np.random.RandomState(seed)
        losses = []
        n = len(images)
        for step_i in range(steps):
            idx = rng.randint(0, n, size=min(batch_size, n))
            params, stats, self.opt_state, loss = self._train_step(
                self.variables["params"], self.variables.get("batch_stats", {}),
                self.opt_state, jnp.asarray(images[idx]), jnp.asarray(heat[idx]),
                jnp.asarray(size[idx]), jnp.asarray(off[idx]),
                jnp.asarray(mask[idx]),
            )
            self.variables = {"params": params, "batch_stats": stats}
            losses.append(loss)
        return [float(l) for l in jax.device_get(losses)]

    def predict_image(self, image):
        if image is None or image.size == 0:
            return None
        img = np.asarray(image, np.float32)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        if img.shape[-1] > 3:
            img = img[..., :3]
        h, w = img.shape[:2]
        ph = -(-h // STRIDE) * STRIDE
        pw = -(-w // STRIDE) * STRIDE
        padded = np.zeros((ph, pw, 3), np.float32)
        padded[:h, :w] = img
        heat, sizes, offs = self._infer_step(
            self.variables["params"], self.variables.get("batch_stats", {}),
            jnp.asarray(padded[None]),
        )
        boxes = decode(np.asarray(heat)[0], np.asarray(sizes)[0],
                       np.asarray(offs)[0], threshold=self.threshold)
        if boxes.empty:
            return None
        boxes["xmax"] = boxes.xmax.clip(upper=w - 1)
        boxes["ymax"] = boxes.ymax.clip(upper=h - 1)
        boxes["xmin"] = boxes.xmin.clip(lower=0)
        boxes["ymin"] = boxes.ymin.clip(lower=0)
        return boxes

    def predict_tile(self, path, patch_size=None, overlap=0, batch=16):
        """Tile sweep with the patch grid BATCHED through one jit forward
        (the base class loops patches host-serially; reference DeepForest
        also sweeps 400-px windows one at a time, src/predict.py:112-138).
        Heatmap decode stays host-side (cheap: top-k peaks per patch)."""
        from deeptreeattention_tpu.geo import raster

        patch = patch_size or self.patch
        with raster.open_raster(path) as src:
            img = np.moveaxis(src.read(), 0, -1)
        if img.shape[-1] > 3:
            img = img[..., :3]
        # keep uint8 tiles uint8 all the way to the device: the net's first
        # op is astype(dtype)/255 (exact for uint8 values), and the host->
        # device upload is the tile sweep's wall-clock floor on the relay
        # (measured 23 s for a u8 10000^2 tile vs 499 s for its f32 copy)
        if img.dtype != np.uint8:
            img = img.astype(np.float32)
        h, w = img.shape[:2]
        step = patch - overlap
        origins = [(r0, c0) for r0 in range(0, h, step) for c0 in range(0, w, step)]
        tiles = np.zeros((len(origins), patch, patch, 3), img.dtype)
        extents = []
        for k, (r0, c0) in enumerate(origins):
            chunk = img[r0 : r0 + patch, c0 : c0 + patch]
            tiles[k, : chunk.shape[0], : chunk.shape[1]] = chunk
            extents.append(chunk.shape[:2])

        frames = []
        for s in range(0, len(origins), batch):
            group = tiles[s : s + batch]
            k = len(group)
            if k < batch:  # static batch shape -> one compiled program
                group = np.concatenate(
                    [group, np.zeros((batch - k,) + group.shape[1:], group.dtype)]
                )
            heat, sizes, offs = self._infer_step(
                self.variables["params"], self.variables.get("batch_stats", {}),
                jnp.asarray(group),
            )
            heat, sizes, offs = (np.asarray(heat)[:k], np.asarray(sizes)[:k],
                                 np.asarray(offs)[:k])
            for g in range(k):
                boxes = decode(heat[g], sizes[g], offs[g],
                               threshold=self.threshold)
                if boxes.empty:
                    continue
                # partial edge patches are zero-padded to the full patch
                # size; drop peaks past the true extent (the per-patch path
                # only pads to a STRIDE multiple)
                hh, ww = extents[s + g]
                ph = -(-hh // STRIDE) * STRIDE
                pw = -(-ww // STRIDE) * STRIDE
                cx = (boxes.xmin + boxes.xmax) / 2
                cy = (boxes.ymin + boxes.ymax) / 2
                boxes = boxes[(cx < pw) & (cy < ph)]
                if boxes.empty:
                    continue
                boxes = boxes.copy()
                r0, c0 = origins[s + g]
                boxes["xmin"] += c0
                boxes["xmax"] += c0
                boxes["ymin"] += r0
                boxes["ymax"] += r0
                frames.append(boxes)
        if not frames:
            return None
        out = pd.concat(frames, ignore_index=True)
        out["xmax"] = out.xmax.clip(upper=w - 1)
        out["ymax"] = out.ymax.clip(upper=h - 1)
        out["xmin"] = out.xmin.clip(lower=0)
        out["ymin"] = out.ymin.clip(lower=0)
        out["image_path"] = path
        return out

    def save_checkpoint(self, path):
        return checkpoints.save_checkpoint(path, self.variables, {"width": self.model.width})

    @classmethod
    def load_from_checkpoint(cls, path, config=None):
        tree, meta = checkpoints.load_checkpoint(path)
        obj = cls(config=config, width=int(meta.get("width", 32)))
        if "offset" not in tree.get("params", {}):
            # checkpoint predates the offset head: zero offsets reproduce
            # the old cell-center decode exactly
            zero = jax.tree_util.tree_map(
                jnp.zeros_like, obj.variables["params"]["offset"])
            tree.setdefault("params", {})["offset"] = zero
        obj.variables = jax.tree_util.tree_map(jnp.asarray, tree)
        return obj


def scenes_from_tiles(tile_paths, label_paths, patch=96, crops_per_tile=40,
                      seed=0, min_box_px=8):
    """Build a CenterNet training set from (RGB tile, crown-box shapefile)
    pairs — the label format DeepForest-exported crowns already have
    (reference src/generate.py:17-60 writes exactly such boxes).

    Random patch-sized crops of each tile; each crop keeps the ground-truth
    boxes that intersect it by at least min_box_px on both axes, in crop-local
    pixel coordinates. Returns (scenes [N, patch, patch, 3] float32,
    boxes_list of [n_i, 4]) ready for LearnedDetector.fit.
    """
    from deeptreeattention_tpu.geo import raster, vector

    rng = np.random.RandomState(seed)
    scenes, blists = [], []
    for tile_path, label_path in zip(tile_paths, label_paths):
        with raster.open_raster(tile_path) as src:
            img = np.moveaxis(src.read(), 0, -1).astype(np.float32)
            t = src.transform
        gt = vector.read_file(label_path)
        px_boxes = [
            (
                (g.bounds[0] - t.c) / t.a,
                (t.f - g.bounds[3]) / (-t.e),
                (g.bounds[2] - t.c) / t.a,
                (t.f - g.bounds[1]) / (-t.e),
            )
            for g in gt.geometry
        ]
        h, w = img.shape[:2]
        if h < patch or w < patch:
            raise ValueError(
                "tile {} ({}x{}) smaller than patch={}".format(tile_path, h, w, patch)
            )
        for _ in range(crops_per_tile):
            r0 = rng.randint(0, h - patch + 1)
            c0 = rng.randint(0, w - patch + 1)
            bs = []
            for (x0, y0, x1, y1) in px_boxes:
                xx0, yy0 = max(x0 - c0, 0), max(y0 - r0, 0)
                xx1, yy1 = min(x1 - c0, patch), min(y1 - r0, patch)
                if xx1 - xx0 > min_box_px and yy1 - yy0 > min_box_px:
                    bs.append((xx0, yy0, xx1, yy1))
            scenes.append(img[r0:r0 + patch, c0:c0 + patch])
            blists.append(np.asarray(bs, np.float32).reshape(-1, 4))
    return np.stack(scenes), blists
