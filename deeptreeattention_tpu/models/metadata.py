"""Site-metadata fusion models.

Capability parity with reference src/models/metadata.py:9-89: a site
embedding MLP (16-d embedding + BN + dropout 0.7 + linear + relu), a late
fusion of HSI (Hang2020) and metadata softmax scores, and a MetadataModel
training module that feeds both inputs.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from deeptreeattention_tpu.models.hang2020 import Hang2020
from deeptreeattention_tpu.train import treemodel, steps


class Metadata(nn.Module):
    sites: int
    classes: int

    @nn.compact
    def __call__(self, site_ids, train=False):
        x = nn.Embed(self.sites, 16, name="embedding")(site_ids)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="batch_norm"
        )(x)
        x = nn.Dropout(0.7, deterministic=not train)(x)
        x = nn.Dense(self.classes, name="mlp")(x)
        return nn.relu(x)


class MetadataSensorFusion(nn.Module):
    """Late fusion: concat(metadata scores, HSI scores) -> linear -> relu."""

    bands: int
    sites: int
    classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, site_ids, train=False):
        meta_scores = Metadata(self.sites, self.classes, name="metadata_model")(
            site_ids, train=train
        )
        sensor_scores = Hang2020(self.bands, self.classes, self.dtype, name="sensor_model")(
            images, train=train
        )
        joint = jnp.concatenate([meta_scores, sensor_scores], axis=1)
        joint = nn.Dense(self.classes, name="fc1")(joint)
        return nn.relu(joint)


class MetadataModel(treemodel.TreeModel):
    """TreeModel variant with (HSI, site) two-input batches."""

    def __init__(self, model, classes, label_dict, config, sites=None, seed=0):
        from deeptreeattention_tpu.ops.preprocess import make_augmenter
        from deeptreeattention_tpu.parallel import resolve_mesh

        self.config = config
        self.classes = classes
        self.model = model
        self.label_to_index = label_dict
        self.index_to_label = {v: k for k, v in label_dict.items()}
        self.key = jax.random.PRNGKey(seed)
        # the inherited _iter_batches prefetch pipeline reads these
        self.mesh = resolve_mesh(config)
        self._augmenter = make_augmenter(config.get("augmentations"))

        cfg = config
        sample_img = jnp.zeros(
            (1, cfg["image_size"], cfg["image_size"], cfg["bands"]), jnp.float32
        )
        sample_site = jnp.zeros((1,), jnp.int32)
        self.key, sub, drop = jax.random.split(self.key, 3)
        self.variables = dict(
            model.init({"params": sub, "dropout": drop}, sample_img, sample_site, train=False)
        )

        from deeptreeattention_tpu.train import optim, metrics as M

        lr = cfg.get("lr", 1e-4)
        self.optimizer = optim.adam_with_plateau(lr)
        self.opt_state = self.optimizer.init(self.variables["params"])
        self.scheduler = optim.ReduceLROnPlateau(lr, min_lr=1e-7)
        self.loss_weight = jnp.ones(classes, jnp.float32)
        self.metrics = M.MetricCollection(classes, top_k=cfg.get("top_k"))
        self._build_steps()

    def _build_steps(self):
        model = self.model
        optimizer = self.optimizer

        @jax.jit
        def train_step(params, batch_stats, opt_state, images, sites, labels, mask, weights, rng):
            def loss_fn(p):
                logits, mutated = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    images, sites, train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng},
                )
                return steps.weighted_cross_entropy(logits, labels, weights, mask), mutated[
                    "batch_stats"
                ]

            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            import optax

            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), stats, opt_state, loss

        from deeptreeattention_tpu.models import fused

        eval_apply = fused.eval_apply(model, self.config)

        @jax.jit
        def eval_step(params, batch_stats, images, sites):
            logits = eval_apply(
                {"params": params, "batch_stats": batch_stats}, images, sites,
                train=False,
            )
            return jax.nn.softmax(logits, axis=-1)

        self._fusion_train_step = train_step
        self._fusion_eval_step = eval_step

    def fit(self, train_ds, val_ds=None, epochs=None, experiment=None, fast_dev_run=False):
        from deeptreeattention_tpu.data.dataset import Loader

        cfg = self.config
        epochs = epochs or cfg["epochs"]
        if fast_dev_run or cfg.get("fast_dev_run"):
            epochs = 1
        history = []
        for epoch in range(epochs):
            loader = Loader(train_ds, cfg["batch_size"], shuffle=True, seed=epoch,
                            pad_to_batch=cfg.get("pad_batches", True))
            # device-side loss accumulation, one host sync per epoch
            loss_sum, n_batches = jnp.float32(0.0), 0
            for bi, batch in enumerate(self._iter_batches(loader)):
                if fast_dev_run and bi > 0:
                    break
                self.key, rng = jax.random.split(self.key)
                images = jnp.asarray(batch["HSI"])
                if images.ndim == 5:  # year-stacked -> first year for fusion model
                    images = images[:, 0]
                params, stats, self.opt_state, loss = self._fusion_train_step(
                    self.variables["params"], self.variables.get("batch_stats", {}),
                    self.opt_state, images, jnp.asarray(batch["site"]),
                    jnp.asarray(batch["label"]), jnp.asarray(batch["mask"]),
                    self.loss_weight, rng,
                )
                self.variables = {"params": params, "batch_stats": stats}
                loss_sum = loss_sum + loss
                n_batches += 1
            history.append({"epoch": epoch,
                            "train_loss": float(loss_sum) / max(n_batches, 1)})
        return history

    def predict(self, inputs):
        images = jnp.asarray(inputs["HSI"])
        if images.ndim == 5:
            images = images[:, 0]
        return self._fusion_eval_step(
            self.variables["params"], self.variables.get("batch_stats", {}),
            images, jnp.asarray(inputs["site"]),
        )

    def _predict_batch(self, batch):
        """Two-input hook: the inherited predict_dataloader/evaluate_crowns
        feed each loader batch through here."""
        if "site" not in batch:
            raise KeyError(
                "MetadataModel needs a 'site' column in the dataset "
                "annotations (TreeDataset exposes it automatically)"
            )
        return self.predict({"HSI": batch["HSI"], "site": batch["site"]})

    def validate(self, val_ds):
        """Weighted-CE loss + metrics over a validation dataset (the
        inherited TreeModel.validate uses the single-input _val_step, which
        this two-input module does not build)."""
        from deeptreeattention_tpu.data.dataset import Loader

        cfg = self.config
        loader = Loader(val_ds, cfg["batch_size"],
                        pad_to_batch=cfg.get("pad_batches", True))
        self.metrics.reset()
        losses = []
        w = np.asarray(self.loss_weight)
        for batch in self._iter_batches(loader):
            probs = np.asarray(self._predict_batch(batch))
            mask = np.asarray(batch["mask"]).astype(bool)
            labels = np.asarray(batch["label"])
            p = np.clip(probs[mask], 1e-8, 1.0)
            y = labels[mask]
            wy = w[y]
            losses.append(float(
                np.sum(-np.log(p[np.arange(len(y)), y]) * wy)
                / max(float(np.sum(wy)), 1e-12)
            ))
            self.metrics.update(probs[mask], y)
        return float(np.mean(losses)) if losses else float("nan"), self.metrics.compute()
