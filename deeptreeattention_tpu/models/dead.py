"""Alive/Dead crown classifier on RGB crops.

Capability parity with reference src/models/dead.py:16-192 (AliveDead,
get_transform, utm_dataset, dataset_confusion): a ResNet 2-class head over
ImageNet-normalized 224x224 RGB, folder-of-classes training data, a
UTM-window dataset reading crown RGB straight from the tile, and a confusion
helper. Preprocessing is jnp and fused into the forward under jit.
"""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeptreeattention_tpu.geo import raster
from deeptreeattention_tpu.models.resnet import ResNet
from deeptreeattention_tpu.ops.preprocess import nearest_resize
from deeptreeattention_tpu.train import checkpoints, metrics as M, optim, steps
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
CLASSES = ["Alive", "Dead"]


def rgb_transform(image, size=224):
    """uint8 HWC -> normalized float32 [size, size, 3] (NEAREST resize keeps
    the chain bit-exact between host and device paths)."""
    x = jnp.asarray(image, jnp.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    if x.shape[0] != size or x.shape[1] != size:
        x = nearest_resize(x, size)
    return x


def rgb_transform_np(image, size=224):
    """numpy twin of rgb_transform for the host data path — a per-item jnp
    call would round-trip every crop through the (remote) device."""
    x = np.asarray(image, np.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    if x.shape[0] != size or x.shape[1] != size:
        h, w = x.shape[0], x.shape[1]
        rows = (np.arange(size) * h) // size
        cols = (np.arange(size) * w) // size
        x = x[rows[:, None], cols[None, :], :]
    return np.ascontiguousarray(x)


from functools import partial


@partial(jax.jit, static_argnums=(2,))
def _dead_windows(tile, rect, slab=256):
    """Crown windows from a device-resident RGB tile, boundless zero-fill +
    ImageNet normalize (module-level jit: compiled once per shape for the
    whole landscape sweep).

    Uses the selection-matmul window path (ops.windows.crown_resize_windows_mm,
    exact-parity with the gather): the 224x224 advanced-index gather was THE
    dead-scoring bottleneck — 2.5k windows/s alone vs 4.2k/s for the whole
    ResNet-50 forward (scripts/bench_dead_probe.py). slab is the static
    crown-size bound in px (callers round the sweep max up to 64)."""
    from deeptreeattention_tpu.ops.windows import crown_resize_windows_mm

    win = crown_resize_windows_mm(tile, rect, size=224, slab=slab)
    x = win / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class _TileCache:
    """Device-resident RGB tiles, LRU-capped (a 1 km tile is ~300 MB)."""

    def __init__(self, max_tiles=2):
        import collections

        self._c = collections.OrderedDict()
        self.max = max_tiles

    def __contains__(self, path):
        return path in self._c

    def get(self, path):
        if path in self._c:
            self._c.move_to_end(path)
            return self._c[path]
        if len(self._c) >= self.max:
            self._c.popitem(last=False)
        with raster.open_raster(path) as src:
            arr = src.read()
        tile = jnp.asarray(np.ascontiguousarray(np.moveaxis(arr, 0, -1)))
        self._c[path] = tile
        return tile


def scores_reference(p):
    """Reference score convention: softmax over the sigmoid pair
    (reference src/models/dead.py:97-99). Capped at e/(e+1) ~ 0.7311 per
    entry since each p is in (0, 1) — see docs/PARITY.md."""
    p = np.asarray(p, np.float64)
    e = np.exp(p - p.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def scores_calibrated(p):
    """Production convention (predict_batch): normalize the sigmoid pair.
    Same argmax as scores_reference; confident pairs reach ~1.0, so the
    dead_threshold gate (config dead_threshold: 0.95) is reachable."""
    p = np.asarray(p, np.float64)
    return p / np.clip(p.sum(axis=1, keepdims=True), 1e-8, None)


def _classification_metrics(probs, labels):
    """val loss + overall/per-class accuracy from softmax probs (the metric
    set the reference logs per validation epoch)."""
    preds = np.argmax(probs, 1)
    p = np.clip(probs, 1e-8, 1.0)
    out = {
        "val_loss": float(np.mean(-np.log(p[np.arange(len(labels)), labels]))),
        "Accuracy": float(np.mean(preds == labels)),
    }
    acc = M.per_class_accuracy(preds, labels, 2)
    out["Alive Accuracy"] = float(acc[0])
    out["Dead Accuracy"] = float(acc[1])
    return out


def folder_to_arrays(root, size=224, classes=CLASSES, cache_dir=None):
    """Decode an ImageFolder tree once into (uint8 [N,size,size,3], int32 [N]).

    NEAREST uint8 resize commutes with the per-pixel normalize in
    rgb_transform_np, so downstream device-side normalization reproduces the
    folder path bit-exactly. With cache_dir set, the decoded arrays are
    memoized as one .npz (a 1-core host re-decoding 5.7k PNGs per run is the
    bottleneck, not the TPU)."""
    listing = [
        (cls, path, os.path.getsize(path))
        for cls in classes
        for path in sorted(glob.glob(os.path.join(root, cls, "*")))
    ]
    if cache_dir:
        import hashlib

        # key the cache on WHAT will be decoded — absolute root, classes,
        # and the (name, size) file listing — not just basename(root):
        # two dataset versions sharing a cache_dir must never alias
        fp = hashlib.sha1(repr(
            (os.path.abspath(root), tuple(classes),
             [(os.path.relpath(p, root), s) for _, p, s in listing])
        ).encode()).hexdigest()[:12]
        tag = "{}_{}_{}".format(
            os.path.basename(os.path.normpath(root)), size, fp)
        cpath = os.path.join(cache_dir, "folder_{}.npz".format(tag))
        if os.path.exists(cpath):
            z = np.load(cpath, allow_pickle=False)
            return z["x"], z["y"]
    from PIL import Image

    xs, ys = [], []
    for label, cls in enumerate(classes):
        for path in (p for c, p, _ in listing if c == cls):
            img = np.asarray(Image.open(path).convert("RGB"))
            h, w = img.shape[0], img.shape[1]
            r = (np.arange(size) * h) // size
            c = (np.arange(size) * w) // size
            xs.append(np.ascontiguousarray(img[r[:, None], c[None, :], :]))
            ys.append(label)
    x = np.stack(xs).astype(np.uint8) if xs else np.zeros(
        (0, size, size, 3), np.uint8)
    y = np.asarray(ys, np.int32)
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(cpath, x=x, y=y)
    return x, y


class FolderDataset:
    """ImageFolder equivalent: class-per-subdirectory of PNG/JPG crops."""

    train = True

    def __init__(self, root, augment=False, size=224, classes=CLASSES):
        self.samples = []
        self.augment = augment
        self.size = size
        self.classes = classes
        for label, cls in enumerate(classes):
            for path in sorted(glob.glob(os.path.join(root, cls, "*"))):
                self.samples.append((path, label))
        self.rng = np.random.RandomState(0)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        from PIL import Image

        path, label = self.samples[index]
        img = np.asarray(Image.open(path).convert("RGB"))
        x = rgb_transform_np(img, self.size)
        if self.augment and self.rng.rand() < 0.5:
            x = x[:, ::-1, :]
        return os.path.basename(path), x, label


class UTMDataset:
    """Crown RGB windows read straight from the tile (reference
    src/models/dead.py:153-182): crown bounds +1 m buffer -> 224x224."""

    train = False

    # open raster handles kept per dataset, LRU-capped: one tile sweep uses a
    # handful, but a landscape sweep would otherwise leak one handle per tile
    _SRC_CACHE_SIZE = 8

    def __init__(self, crowns, config=None, size=224):
        import collections

        self.crowns = crowns.reset_index(drop=True)
        self.size = size
        self._srcs = collections.OrderedDict()

    def __len__(self):
        return len(self.crowns)

    def _src(self, path):
        if path in self._srcs:
            self._srcs.move_to_end(path)
            return self._srcs[path]
        if len(self._srcs) >= self._SRC_CACHE_SIZE:
            _, old = self._srcs.popitem(last=False)
            try:
                old.close()
            except Exception:
                pass
        self._srcs[path] = raster.open_raster(path)
        return self._srcs[path]

    def __getitem__(self, index):
        row = self.crowns.iloc[index]
        left, bottom, right, top = row["geometry"].bounds
        src = self._src(row["RGB_tile"])
        img = src.read_bounds(left - 1, bottom - 1, right + 1, top + 1, boundless=True)
        img = np.moveaxis(img, 0, -1)
        return row.get("individual", str(index)), rgb_transform_np(img, self.size)


class AliveDead:
    """Training module: ResNet(2) + Adam + plateau, sigmoid outputs like the
    reference's forward (sigmoid then CE — kept for score compatibility)."""

    def __init__(self, config, depth=50, seed=0):
        self.config = config
        self.depth = depth
        cfg = config["dead"]
        # opt-in bf16 compute: +13% scoring throughput measured on v5e
        # (scripts/bench_dead.py); scores shift at bf16 precision, so the
        # default stays f32 for exact torch-import parity
        dtype = (
            jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else jnp.float32
        )
        self._compute_dtype = dtype
        self.model = ResNet(num_classes=2, depth=depth, dtype=dtype)
        key = jax.random.PRNGKey(seed)
        self.variables = dict(
            self.model.init(key, jnp.zeros((1, 224, 224, 3), jnp.float32))
        )
        self.optimizer = optim.adam_with_plateau(cfg["lr"])
        self.opt_state = self.optimizer.init(self.variables["params"])
        self.scheduler = optim.ReduceLROnPlateau(cfg["lr"], factor=0.5, patience=10)
        self.metrics = M.MetricCollection(2)

        model = self.model

        def apply_sigmoid(variables, x, train=False, mutable=None):
            if mutable:
                logits, mut = model.apply(variables, x, train=train, mutable=mutable)
                return jax.nn.sigmoid(logits), mut
            return jax.nn.sigmoid(model.apply(variables, x, train=train))

        self._apply_sigmoid = apply_sigmoid
        self._train_step = steps.make_train_step(
            apply_sigmoid, self.optimizer, donate=True,
            remat=config.get("remat", False))

        # every BN mode's step returns the RAW sigmoid pair; predict_batch
        # applies ONE final normalize (calibrated convention) so dead scores
        # have the same range in all three modes. Routing "eval" through
        # make_eval_step used to softmax the sigmoids first, capping eval/
        # eval_folded scores at e/(e+1) ~ 0.7311 — enabling the fast folded
        # path then silently disabled the dead_threshold gate (docs/PARITY.md)
        @jax.jit
        def eval_sigmoid(params, batch_stats, x):
            return apply_sigmoid(
                {"params": params, "batch_stats": batch_stats}, x, train=False)

        self._eval_step = eval_sigmoid
        self._array_steps = None

        # prediction-time quirk preserved from the reference
        # (src/predict.py:156): the dead model is scored in train mode, i.e.
        # BN uses the batch statistics (without persisting them)
        @jax.jit
        def eval_batch_stats(params, batch_stats, x):
            probs, _ = model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"],
            )
            return jax.nn.sigmoid(probs)

        self._eval_step_batch_stats = eval_batch_stats

        # BN-folded eval forward: `dead.bn_mode: eval_folded` drops the
        # reference quirk for a measured ~1.9x forward (docs/PERF.md round 3).
        # "batch" (default) = reference train-mode-BN parity; "eval" =
        # running averages through the module; "eval_folded" = running
        # averages folded into conv weights (fastest, same math as "eval")
        self.bn_mode = cfg.get("bn_mode", "batch")
        if self.bn_mode not in ("batch", "eval", "eval_folded"):
            raise ValueError("dead.bn_mode must be batch|eval|eval_folded, "
                             "got {!r}".format(self.bn_mode))
        d = depth

        @jax.jit
        def eval_folded(params, batch_stats, x):
            from deeptreeattention_tpu.models import fused

            logits = fused.resnet_eval(
                {"params": params, "batch_stats": batch_stats}, x,
                depth=d, dtype=dtype,
            )
            # same output contract as _eval_step: raw sigmoid pair
            return jax.nn.sigmoid(logits)

        self._eval_step_folded = eval_folded

    # -- data ------------------------------------------------------------
    def _folder(self, which, augment):
        root = self.config["dead"]["{}_dir".format(which)]
        return FolderDataset(root, augment=augment)

    def _batches(self, ds, batch_size, shuffle=False, seed=0):
        idx = np.arange(len(ds))
        if shuffle:
            np.random.RandomState(seed).shuffle(idx)
        for start in range(0, len(idx), batch_size):
            chunk = [ds[i] for i in idx[start : start + batch_size]]
            names = [c[0] for c in chunk]
            xs = np.stack([c[1] for c in chunk])
            if len(chunk[0]) == 3:
                ys = np.array([c[2] for c in chunk], np.int32)
                yield names, xs, ys
            else:
                yield names, xs

    def fit(self, epochs=None, experiment=None, fast_dev_run=False):
        cfg = self.config["dead"]
        epochs = epochs or cfg["epochs"]
        if fast_dev_run:
            epochs = 1
        train_ds = self._folder("train", augment=True)
        val_ds = self._folder("test", augment=False)
        history = []
        for epoch in range(epochs):
            # device-side loss accumulation: ONE host sync per epoch (a
            # per-step float() is a relay round trip per step)
            loss_sum, n_batches = jnp.float32(0.0), 0
            for bi, (names, xs, ys) in enumerate(
                self._batches(train_ds, cfg["batch_size"], shuffle=True, seed=epoch)
            ):
                if fast_dev_run and bi > 0:
                    break
                mask = jnp.ones(len(ys))
                params, stats, self.opt_state, loss = self._train_step(
                    self.variables["params"], self.variables.get("batch_stats", {}),
                    self.opt_state, jnp.asarray(xs), jnp.asarray(ys), mask,
                    jnp.ones(2),
                )
                self.variables = {"params": params, "batch_stats": stats}
                loss_sum = loss_sum + loss
                n_batches += 1
            val = self.validate(val_ds)
            new_lr = self.scheduler.step(val["val_loss"])
            self.opt_state = optim.set_learning_rate(self.opt_state, new_lr)
            rec = {"epoch": epoch,
                   "train_loss": float(loss_sum) / max(n_batches, 1), **val}
            if experiment:
                experiment.log_metrics(rec, epoch=epoch)
            history.append(rec)
            log.info("dead epoch %d: %s", epoch, rec)
        return history

    # -- device-resident training (real-dataset path) -----------------------
    def _make_array_steps(self, augment="hflip"):
        """jit steps over a device-resident uint8 dataset.

        The folder fit() path ships normalized float32 batches host->device
        every step — 4x the bytes of the source crops, per epoch, through
        the relay tunnel. Here the whole uint8 dataset is uploaded ONCE;
        each step gathers its shuffled rows, normalizes (ImageNet mean/std),
        and augments on device, fused into the train step. Static batch
        shape = one compiled program for the whole run.

        augment="hflip" is the reference transform (src/models/dead.py:24
        RandomHorizontalFlip(0.5)); "dihedral" samples all 8 square
        symmetries (hflip x vflip x transpose) — nadir crowns have no
        preferred orientation, and the from-scratch backbone (no ImageNet
        weights offline) needs the extra variety on 882 Dead crowns."""
        model = self.model
        optimizer = self.optimizer
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)

        def gather_norm(data, idx):
            x = jnp.take(data, idx, axis=0).astype(jnp.float32) / 255.0
            return (x - mean) / std

        def forward(params, batch_stats, x):
            probs, mut = model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"],
            )
            return probs, mut["batch_stats"]

        # config["remat"]: recompute activations in the backward pass —
        # the HBM lever that lets batch 128 resnet50 f32 train alongside
        # the device-resident dataset on a 16 GB chip
        fwd = jax.checkpoint(forward) if self.config.get("remat") else forward

        def forward_loss(params, batch_stats, x, labels, mask, class_weights):
            probs, new_stats = fwd(params, batch_stats, x)
            # sigmoid-then-CE kept for reference score compatibility
            # (reference src/models/dead.py:53-55)
            loss = steps.weighted_cross_entropy(
                jax.nn.sigmoid(probs), labels, class_weights, mask)
            return loss, new_stats

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(params, batch_stats, opt_state, data, labels, idx,
                       mask, class_weights, key):
            x = gather_norm(data, idx)
            kh, kv, kt = jax.random.split(key, 3)
            flip = jax.random.bernoulli(kh, 0.5, (idx.shape[0],))
            x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
            if augment == "dihedral":
                vflip = jax.random.bernoulli(kv, 0.5, (idx.shape[0],))
                x = jnp.where(vflip[:, None, None, None], x[:, ::-1, :, :], x)
                tr = jax.random.bernoulli(kt, 0.5, (idx.shape[0],))
                x = jnp.where(tr[:, None, None, None],
                              jnp.transpose(x, (0, 2, 1, 3)), x)
            y = jnp.take(labels, idx, axis=0)
            (loss, new_stats), grads = jax.value_and_grad(
                forward_loss, has_aux=True)(params, batch_stats, x, y,
                                            mask, class_weights)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_stats, new_opt_state, loss

        @jax.jit
        def eval_step(params, batch_stats, data, idx):
            # returns RAW sigmoid probs; the score convention (reference
            # softmax-of-sigmoid vs calibrated normalize) is applied on host
            # in evaluate_arrays — both are cheap monotone maps of this pair
            x = gather_norm(data, idx)
            return jax.nn.sigmoid(model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False))

        return train_step, eval_step

    def fit_arrays(self, x_train, y_train, x_val=None, y_val=None,
                   epochs=None, batch_size=None, class_weights=None,
                   seed=0, experiment=None, select_best=False,
                   augment="hflip"):
        """Train on an in-memory uint8 dataset (N, H, W, 3), device-resident.

        `class_weights=None` keeps the reference's unweighted CE
        (reference src/models/dead.py:91); pass "balanced" for
        inverse-frequency weights (the 5.5:1 Alive:Dead imbalance knob).
        `select_best=True` (needs val data) restores the lowest-val-loss
        epoch's params at the end — the round-4 CPU run regressed from
        dead-accuracy 0.92 (epoch 6) to 0.81 at the final epoch, so
        last-epoch weights are a bad default for the published artifact.
        Records `self.best_epoch`. Returns the per-epoch history list."""
        cfg = self.config["dead"]
        epochs = epochs or cfg["epochs"]
        batch_size = batch_size or cfg["batch_size"]
        if self._array_steps is None:
            self._array_steps = {}
        if augment not in self._array_steps:
            self._array_steps[augment] = self._make_array_steps(augment)
        train_step, eval_step = self._array_steps[augment]
        if isinstance(class_weights, str) and class_weights == "balanced":
            class_weights = steps.compute_loss_weights(y_train, 2)
        cw = jnp.asarray(class_weights if class_weights is not None
                         else np.ones(2), jnp.float32)
        data = jax.device_put(jnp.asarray(x_train, jnp.uint8))
        labels = jax.device_put(jnp.asarray(y_train, jnp.int32))
        val_data = val_labels = None
        if x_val is not None:
            val_data = jax.device_put(jnp.asarray(x_val, jnp.uint8))
            val_labels = np.asarray(y_val, np.int32)
        n = len(y_train)
        key = jax.random.PRNGKey(seed)
        history = []
        best_loss, best_vars = float("inf"), None
        self.best_epoch = None
        for epoch in range(epochs):
            perm = np.random.RandomState(seed + epoch).permutation(n)
            # pad to a full final batch (mask drops the repeats) so the whole
            # run is ONE compiled program shape
            pad = (-len(perm)) % batch_size
            mask_host = np.ones(len(perm) + pad, np.float32)
            if pad:
                mask_host[len(perm):] = 0.0
                # np.resize cycles, so pad > n (dataset smaller than one
                # batch) still fills the full batch with repeats
                perm = np.resize(perm, len(perm) + pad)
            loss_sum, n_batches = jnp.float32(0.0), 0
            for start in range(0, len(perm), batch_size):
                key, sub = jax.random.split(key)
                idx = jnp.asarray(perm[start:start + batch_size], jnp.int32)
                mask = jnp.asarray(mask_host[start:start + batch_size])
                (self.variables["params"], self.variables["batch_stats"],
                 self.opt_state, loss) = train_step(
                    self.variables["params"],
                    self.variables.get("batch_stats", {}),
                    self.opt_state, data, labels, idx, mask, cw, sub)
                loss_sum = loss_sum + loss
                n_batches += 1
            rec = {"epoch": epoch,
                   "train_loss": float(loss_sum) / max(n_batches, 1)}
            if val_data is not None:
                probs = self.evaluate_arrays(val_data, batch_size=batch_size,
                                             _already_on_device=True)
                rec.update(_classification_metrics(probs, val_labels))
                new_lr = self.scheduler.step(rec["val_loss"])
                self.opt_state = optim.set_learning_rate(self.opt_state, new_lr)
                if select_best and rec["val_loss"] < best_loss:
                    best_loss = rec["val_loss"]
                    self.best_epoch = epoch
                    # host copies: don't pin a second param set in HBM
                    best_vars = jax.tree_util.tree_map(np.asarray,
                                                       self.variables)
            if experiment:
                experiment.log_metrics(rec, epoch=epoch)
            history.append(rec)
            log.info("dead epoch %d: %s", epoch, rec)
        if select_best and best_vars is not None:
            self.variables = jax.tree_util.tree_map(jnp.asarray, best_vars)
            log.info("dead select_best: restored epoch %d (val_loss %.4f)",
                     self.best_epoch, best_loss)
        return history

    def evaluate_arrays(self, x, batch_size=None, _already_on_device=False,
                        score_mode="reference"):
        """Class probs for a uint8 array dataset (eval-mode BN, like the
        reference's trainer.validate); padded static-shape batches.

        score_mode selects the scoring convention applied to the model's
        sigmoid pair (p0, p1):
        - "reference": softmax(p) — the reference's predict_step math
          (reference src/models/dead.py:97-99). NOTE this caps every score
          at e/(e+1) ~ 0.7311, so the reference's own production
          dead_threshold of 0.95 (reference config.yml:81, applied at
          src/predict.py:96-98) is mathematically unreachable — a latent
          upstream bug, documented in docs/PARITY.md.
        - "calibrated": p / (p0 + p1) — the production convention this
          framework's predict paths use (predict_batch): confident pairs
          reach ~1.0, making the 0.95 gate meaningful.
        - "raw": the sigmoid pair itself (one device pass; feed it to
          scores_reference / scores_calibrated to get both conventions
          without re-running the forward).
        Argmax (and hence accuracy/confusion) is identical under all."""
        if score_mode not in ("reference", "calibrated", "raw"):
            raise ValueError("score_mode must be reference|calibrated|raw, "
                             "got {!r}".format(score_mode))
        cfg = self.config["dead"]
        batch_size = batch_size or cfg["batch_size"]
        if self._array_steps is None:
            self._array_steps = {}
        if "hflip" not in self._array_steps:
            # eval_step is augment-independent; any cached pair serves
            self._array_steps["hflip"] = self._make_array_steps()
        _, eval_step = self._array_steps["hflip"]
        data = x if _already_on_device else jax.device_put(
            jnp.asarray(x, jnp.uint8))
        n = int(data.shape[0])
        if n == 0:
            return np.zeros((0, 2))
        idx_all = np.arange(n)
        pad = (-n) % batch_size
        if pad:
            idx_all = np.concatenate([idx_all, np.zeros(pad, np.int64)])
        outs = []
        for start in range(0, len(idx_all), batch_size):
            idx = jnp.asarray(idx_all[start:start + batch_size], jnp.int32)
            outs.append(eval_step(self.variables["params"],
                                  self.variables.get("batch_stats", {}),
                                  data, idx))
        p = np.concatenate([np.asarray(o, np.float64) for o in outs])[:n]
        if score_mode == "raw":
            return p
        convert = (scores_calibrated if score_mode == "calibrated"
                   else scores_reference)
        return convert(p)

    def validate(self, ds):
        cfg = self.config["dead"]
        self.metrics.reset()
        losses = []
        preds, targets = [], []
        for names, xs, ys in self._batches(ds, cfg["batch_size"]):
            # val_loss under the REFERENCE convention (softmax of the raw
            # sigmoid pair), like fit_arrays — keeps the plateau scheduler
            # and cross-loop histories comparable; predict_batch's
            # calibrated normalize is for production scoring, not losses
            raw = np.asarray(self._eval_step(
                self.variables["params"],
                self.variables.get("batch_stats", {}), jnp.asarray(xs)))
            probs = scores_reference(raw)
            self.metrics.update(probs, ys)
            preds.append(np.argmax(probs, 1))
            targets.append(ys)
            p = np.clip(probs, 1e-8, 1.0)
            losses.append(float(np.mean(-np.log(p[np.arange(len(ys)), ys]))))
        out = {"val_loss": float(np.mean(losses)) if losses else float("nan")}
        out.update(self.metrics.compute())
        if preds:
            acc = M.per_class_accuracy(np.concatenate(preds), np.concatenate(targets), 2)
            out["Alive Accuracy"] = float(acc[0])
            out["Dead Accuracy"] = float(acc[1])
        return out

    # -- inference ---------------------------------------------------------
    def predict_crowns_ondevice(self, crowns, batch_size=None,
                                use_batch_stats=None, buffer=1.0):
        """Tile-resident alive/dead scoring (the TPU redesign of the
        reference's per-crown host window reads, src/predict.py:153-168 +
        src/models/dead.py:153-182): each RGB tile uploads ONCE (uint8 — 4x
        smaller than float32), and window gather + ImageNet normalize run on
        device fused with the ResNet forward.

        Bit-equal to `UTMDataset` + `predict_dataset`: rectangles come from
        the same Window.round() math, out-of-tile pixels zero-fill like
        boundless reads, and batches are partitioned in crown order (even
        across tile boundaries) so the train-mode-BN scoring quirk sees the
        same batch statistics. Returns [N, 2] probabilities in crown order.
        """
        from deeptreeattention_tpu.geo.affine import window_from_bounds

        batch_size = batch_size or self.config["dead"]["batch_size"]
        mode = self._resolve_mode(use_batch_stats)
        crowns = crowns.reset_index(drop=True)
        paths = crowns["RGB_tile"]
        if paths.isna().any():
            raise ValueError(
                "predict_crowns_ondevice: {} crowns have no RGB_tile".format(
                    int(paths.isna().sum())
                )
            )
        n = len(crowns)
        probs = np.zeros((n, 2), np.float32)

        # per-crown pixel rects in crown order
        rects = np.zeros((n, 4), np.int32)
        transforms = {}
        tiles = _TileCache(max_tiles=2)
        for i in range(n):
            path = paths.iloc[i]
            if path not in transforms:
                with raster.open_raster(path) as src:
                    transforms[path] = src.transform
            left, bottom, right, top = crowns.geometry.iloc[i].bounds
            win = window_from_bounds(
                left - buffer, bottom - buffer,
                right + buffer, top + buffer, transforms[path],
            ).round()
            rects[i] = (win.row_off, win.col_off, win.height, win.width)

        # static slab: the sweep's max crown dimension rounded up to 64 (one
        # compiled shape per 64-px crown-size class across the landscape)
        slab = 64
        if n:
            slab = int(max(64, -(-int(rects[:, 2:].max()) // 64) * 64))

        def gather(path, rect_chunk):
            # pad the rect list to batch_size so _dead_windows compiles for
            # ONE shape across the whole sweep; the slice drops padding
            k = len(rect_chunk)
            if k < batch_size:
                pad = np.repeat(rect_chunk[:1], batch_size - k, axis=0)
                rect_chunk = np.concatenate([rect_chunk, pad])
            # tile_for (defined below) drains pipelined outputs on a tile
            # cache miss before the upload
            return _dead_windows(tile_for(path), rect_chunk, slab)[:k]

        fused = self._fused_window_score(mode, slab)

        # batches follow crown order exactly (matching predict_dataset's
        # partitioning, so batch-BN statistics agree even across tiles).
        #
        # Dispatch is PIPELINED: on the axon relay a device->host read costs
        # a full tunnel round-trip, and reading each batch synchronously
        # measured 2.5k crowns/s against the 7.5k in-jit ceiling
        # (BENCH_DEAD_PRODUCTION.json, round 4). Batch outputs stay on device
        # and drain (a) when a NEW tile uploads — bounding device memory to
        # the tile-cache window — and (b) once at the end.
        pending = []  # (start_row, k, device_probs)

        def drain():
            for ps, pk, pout in pending:
                probs[ps:ps + pk] = np.asarray(pout)[:pk]
            pending.clear()

        def tile_for(path):
            if path not in tiles:
                drain()
            return tiles.get(path)

        for s in range(0, n, batch_size):
            e = min(s + batch_size, n)
            k = e - s
            batch_paths = paths.iloc[s:e].values
            uniq = list(dict.fromkeys(batch_paths))
            # The fused program runs the forward over the full padded batch,
            # so in 'batch' BN mode padding duplicates would leak into the
            # batch statistics — a partial final batch must keep the
            # truncate-before-forward path for bit-parity with
            # predict_dataset. Eval modes have input-independent statistics;
            # padding is then harmless.
            if len(uniq) == 1 and (k == batch_size or mode != "batch"):
                # the common case: ONE jit program per batch — gather +
                # normalize + forward fused (round-4: the split
                # _dead_windows -> predict_batch pair cost a second
                # dispatch RTT per batch and blocked normalize-into-conv1
                # fusion; the composed-estimate gap in VERDICT Weak #4)
                rect_chunk = rects[s:e]
                if k < batch_size:
                    pad = np.repeat(rect_chunk[:1], batch_size - k, axis=0)
                    rect_chunk = np.concatenate([rect_chunk, pad])
                out = fused(self.variables["params"],
                            self.variables.get("batch_stats", {}),
                            tile_for(uniq[0]), jnp.asarray(rect_chunk))
                pending.append((s, k, out))
                continue
            # tile-boundary batch (rare): per-path gathers, then the
            # standalone forward — batch-BN statistics still see the full
            # crown-order batch
            parts, order = [], []
            for path in uniq:
                sel = np.where(batch_paths == path)[0]
                parts.append(gather(path, rects[s + sel]))
                order.append(sel)
            inv = np.argsort(np.concatenate(order))
            x = jnp.concatenate(parts)[jnp.asarray(inv)]
            pending.append(
                (s, k, self.predict_batch(x, use_batch_stats=use_batch_stats)))
        drain()
        return probs

    def _fused_window_score(self, mode, slab):
        """One jit program: crown-window gather + ImageNet normalize +
        forward (+ predict_batch's softmax-of-log calibration), per
        (bn-mode, slab) shape class. Composes the same primitives as
        `_dead_windows` + `predict_batch`, so results are bit-identical."""
        if not hasattr(self, "_fused_score_cache"):
            self._fused_score_cache = {}
        key = (mode, slab)
        if key not in self._fused_score_cache:
            model = self.model
            depth = self.depth
            dtype = self._compute_dtype

            @jax.jit
            def run(params, batch_stats, tile, rect):
                x = _dead_windows(tile, rect, slab)
                variables = {"params": params, "batch_stats": batch_stats}
                if mode == "batch":
                    logits, _ = model.apply(variables, x, train=True,
                                            mutable=["batch_stats"])
                elif mode == "eval":
                    logits = model.apply(variables, x, train=False)
                else:  # eval_folded
                    from deeptreeattention_tpu.models import fused as fused_mod

                    logits = fused_mod.resnet_eval(variables, x, depth=depth,
                                                   dtype=dtype)
                # raw sigmoid pair -> ONE normalize = the calibrated
                # convention, identical across all three BN modes
                p = jax.nn.sigmoid(logits)
                return jax.nn.softmax(jnp.log(jnp.clip(p, 1e-8, 1.0)), axis=-1)

            self._fused_score_cache[key] = run
        return self._fused_score_cache[key]

    def _resolve_mode(self, use_batch_stats):
        """use_batch_stats=True/False pins the reference quirk / plain eval
        (explicit callers keep their semantics); None defers to the
        `dead.bn_mode` config knob."""
        if use_batch_stats is None:
            return self.bn_mode
        return "batch" if use_batch_stats else "eval"

    def predict_batch(self, xs, use_batch_stats=False):
        mode = self._resolve_mode(use_batch_stats)
        step = {
            "batch": self._eval_step_batch_stats,
            "eval": self._eval_step,
            "eval_folded": self._eval_step_folded,
        }[mode]
        probs = step(
            self.variables["params"], self.variables.get("batch_stats", {}), jnp.asarray(xs)
        )
        return jax.nn.softmax(jnp.log(jnp.clip(probs, 1e-8, 1.0)), axis=-1)

    def predict_dataset(self, ds, batch_size=None, use_batch_stats=None):
        """Dataset scoring; use_batch_stats=True keeps the reference's
        train-mode-BN prediction behavior (src/predict.py:156); None defers
        to `dead.bn_mode`."""
        batch_size = batch_size or self.config["dead"]["batch_size"]
        outs = []
        for batch in self._batches(ds, batch_size):
            xs = batch[1]
            outs.append(np.asarray(self.predict_batch(xs, use_batch_stats=use_batch_stats)))
        return np.concatenate(outs) if outs else np.zeros((0, 2))

    def dataset_confusion(self, ds, batch_size=8, use_batch_stats=False):
        """use_batch_stats=True scores with the production (train-mode BN)
        semantics — thresholds read off curves built from these scores then
        match what predict_dead actually produces."""
        true, pred = [], []
        for names, xs, ys in self._batches(ds, batch_size):
            probs = np.asarray(self.predict_batch(xs, use_batch_stats=use_batch_stats))
            pred.append(probs)
            true.append(np.eye(2)[ys])
        return np.concatenate(true), np.concatenate(pred)

    # -- checkpointing ------------------------------------------------------
    def save_checkpoint(self, path, save_dtype=None):
        return checkpoints.save_checkpoint(
            path, self.variables,
            {"scheduler_state": self.scheduler.state_dict(), "depth": self.depth},
            save_dtype=save_dtype,
        )

    @classmethod
    def load_from_checkpoint(cls, path, config, depth=None):
        tree, meta = checkpoints.load_checkpoint(path)
        obj = cls(config, depth=depth or int(meta.get("depth", 50)))
        # committed snapshots may be stored bf16 (half-size artifact);
        # compute keeps the configured dtype, so restore floats to f32
        obj.variables = jax.tree_util.tree_map(
            lambda x: (jnp.asarray(x, jnp.float32)
                       if jnp.issubdtype(np.asarray(x).dtype, jnp.floating)
                       else jnp.asarray(x)),
            tree)
        if meta.get("scheduler_state"):
            obj.scheduler.load_state_dict(meta["scheduler_state"])
        return obj
