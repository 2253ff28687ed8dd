"""TreeModel: generic single-model training/eval module.

Capability parity with reference src/main.py:28-333 (TreeModel): weighted CE
training, micro/macro/top-k metrics, Adam + plateau schedule, dataloader-level
prediction producing a top1/top2 DataFrame, and crown-level evaluation joined
against the crowns layer — over any flax model from the zoo (VanillaCNN,
SpectralNetwork, Hang2020, LearnedEnsemble).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from deeptreeattention_tpu.data.dataset import Loader
from deeptreeattention_tpu.geo import vector
from deeptreeattention_tpu.train import checkpoints, metrics as M, optim, steps
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)


class TreeModel:
    def __init__(self, model, classes, label_dict, loss_weight=None, config=None, seed=0,
                 mesh=None):
        from deeptreeattention_tpu.parallel import resolve_mesh

        self.config = config
        self.classes = classes
        self.model = model
        self.label_to_index = label_dict
        self.index_to_label = {v: k for k, v in label_dict.items()}
        self.key = jax.random.PRNGKey(seed)
        # data-parallel mesh: batch axis sharded, params replicated (GSPMD)
        self.mesh = resolve_mesh(config, mesh)
        from deeptreeattention_tpu.ops.preprocess import make_augmenter

        self._augmenter = make_augmenter(config.get("augmentations"))

        cfg = config
        years = cfg.get("n_years", 1)
        sample_shape = (1, years, cfg["image_size"], cfg["image_size"], cfg["bands"])
        if not getattr(model, "years", None):
            sample_shape = (1, cfg["image_size"], cfg["image_size"], cfg["bands"])
        self.key, sub = jax.random.split(self.key)
        self.variables = dict(model.init(sub, jnp.zeros(sample_shape, jnp.float32)))

        lr = cfg.get("lr", 1e-4)
        self.optimizer = optim.adam_with_plateau(lr)
        self.opt_state = self.optimizer.init(self.variables["params"])
        self.scheduler = optim.ReduceLROnPlateau(lr, min_lr=1e-7)
        if loss_weight is None:
            loss_weight = np.ones(classes, np.float32)
        self.loss_weight = jnp.asarray(loss_weight, jnp.float32)

        from deeptreeattention_tpu.models import fused

        self._train_step = steps.make_train_step(
            model.apply, self.optimizer, donate=True, remat=cfg.get("remat", False))
        self._eval_step = steps.make_eval_step(fused.eval_apply(model, cfg))
        self._val_step = steps.make_loss_eval_step(model.apply)
        self.metrics = M.MetricCollection(classes, top_k=cfg.get("top_k"))

    # ------------------------------------------------------------------
    def fit(self, train_ds, val_ds=None, epochs=None, experiment=None, fast_dev_run=False):
        cfg = self.config
        epochs = epochs or cfg["epochs"]
        if fast_dev_run or cfg.get("fast_dev_run"):
            epochs = 1
        history = []
        for epoch in range(epochs):
            loader = Loader(
                train_ds, cfg["batch_size"], shuffle=True, seed=epoch,
                pad_to_batch=cfg.get("pad_batches", True),
            )
            loss_sum = jnp.float32(0.0)
            n_batches = 0
            for bi, batch in enumerate(self._iter_batches(loader)):
                if (fast_dev_run or cfg.get("fast_dev_run")) and bi > 0:
                    break
                images = batch["HSI"]
                if self._augmenter is not None:
                    self.key, sub = jax.random.split(self.key)
                    images = self._augmenter(images, sub)
                params, stats, self.opt_state, loss = self._train_step(
                    self.variables["params"],
                    self.variables.get("batch_stats", {}),
                    self.opt_state,
                    images,
                    batch["label"],
                    batch["mask"],
                    self.loss_weight,
                )
                self.variables = {"params": params, "batch_stats": stats}
                loss_sum = loss_sum + loss  # device-side; one sync per epoch
                n_batches += 1
            rec = {"epoch": epoch, "train_loss": float(loss_sum) / max(n_batches, 1)}
            if val_ds is not None:
                val_loss, metric_dict = self.validate(val_ds)
                rec["val_loss"] = val_loss
                rec.update(metric_dict)
                new_lr = self.scheduler.step(val_loss)
                self.opt_state = optim.set_learning_rate(self.opt_state, new_lr)
            if experiment:
                experiment.log_metrics(rec, epoch=epoch)
            history.append(rec)
            log.info("epoch %d %s", epoch, {k: v for k, v in rec.items() if k != "epoch"})
        return history

    def _iter_batches(self, loader):
        """Loader -> double-buffered device batch stream (sharded over the
        mesh when one is configured); H2D transfer overlaps step compute."""
        from deeptreeattention_tpu.parallel import prefetch_to_device

        return prefetch_to_device(iter(loader), size=2, mesh=self.mesh)

    def validate(self, val_ds):
        cfg = self.config
        loader = Loader(val_ds, cfg["batch_size"], pad_to_batch=cfg.get("pad_batches", True))
        self.metrics.reset()
        losses = []
        for batch in self._iter_batches(loader):
            loss, probs = self._val_step(
                self.variables["params"],
                self.variables.get("batch_stats", {}),
                batch["HSI"],
                batch["label"],
                batch["mask"],
                self.loss_weight,
            )
            losses.append(float(loss))
            mask = np.asarray(batch["mask"]).astype(bool)
            labels = np.asarray(batch["label"])
            self.metrics.update(np.asarray(probs)[mask], labels[mask])
        return float(np.mean(losses)), self.metrics.compute()

    # ------------------------------------------------------------------
    def predict(self, images):
        return self._eval_step(
            self.variables["params"], self.variables.get("batch_stats", {}), images
        )

    def _predict_batch(self, batch):
        """Probabilities for one loader batch — the hook two-input variants
        override (MetadataModel feeds HSI + site)."""
        return self.predict(batch["HSI"])

    def predict_dataloader(self, data_loader, test_crowns=None, test_points=None,
                           return_features=False, experiment=None, train=True):
        """Predict a loader -> DataFrame with top1/top2 labels and scores
        (reference src/main.py:165-263)."""
        individuals, probs, labels = [], [], []
        for batch in self._iter_batches(data_loader):
            inds = np.asarray(batch["individual"])  # strings stay host-side
            n = len(inds)
            mask = np.asarray(batch["mask"]).astype(bool)[:n]
            p = np.asarray(self._predict_batch(batch))[:n][mask]
            probs.append(p)
            individuals.append(inds[mask])
            if train and "label" in batch:
                labels.append(np.asarray(batch["label"])[:n][mask])
        individuals = np.concatenate(individuals)
        probs = np.concatenate(probs)

        order = np.argsort(-probs, axis=1)
        df = pd.DataFrame(
            {
                "pred_label_top1": order[:, 0],
                "pred_label_top2": order[:, 1] if probs.shape[1] > 1 else order[:, 0],
                "top1_score": probs[np.arange(len(probs)), order[:, 0]],
                "top2_score": probs[np.arange(len(probs)), order[:, 1]]
                if probs.shape[1] > 1
                else probs[np.arange(len(probs)), order[:, 0]],
                "individual": individuals,
            }
        )
        df["pred_taxa_top1"] = df.pred_label_top1.map(self.index_to_label)
        df["pred_taxa_top2"] = df.pred_label_top2.map(self.index_to_label)
        if train and labels:
            df["label"] = np.concatenate(labels)
            df["true_taxa"] = df.label.map(self.index_to_label)
        if return_features:
            return df, probs
        return df

    def evaluate_crowns(self, data_loader, crowns, points=None, experiment=None):
        """Crown-level accuracy tables (reference src/main.py:265-333)."""
        results, _ = self.predict_dataloader(data_loader, return_features=True)
        crowns_df = crowns.drop(columns=["label"], errors="ignore")
        results = results.merge(crowns_df, on="individual")

        acc = M.per_class_accuracy(results.pred_label_top1, results.label, self.classes)
        prec = M.per_class_precision(results.pred_label_top1, results.label, self.classes)
        species_table = pd.DataFrame(
            {"taxonID": list(self.label_to_index.keys()),
             "accuracy": [acc[self.label_to_index[t]] for t in self.label_to_index],
             "precision": [prec[self.label_to_index[t]] for t in self.label_to_index]}
        )
        if experiment:
            experiment.log_metrics(
                species_table.set_index("taxonID").accuracy.to_dict(), prefix="accuracy"
            )
            experiment.log_metrics(
                species_table.set_index("taxonID").precision.to_dict(), prefix="precision"
            )
            if "siteID" in results.columns:
                rows = []
                for name, group in results.groupby("siteID"):
                    micro = M.micro_accuracy(group.pred_label_top1, group.label)
                    macro = M.macro_accuracy(group.pred_label_top1, group.label, self.classes)
                    experiment.log_metric("{}_micro".format(name), micro)
                    experiment.log_metric("{}_macro".format(name), macro)
                    rows.append({"Site": name, "Micro Recall": micro, "Macro Recall": macro})
                experiment.log_table("site_results.csv", pd.DataFrame(rows))
        if isinstance(crowns, vector.GeoDataFrame):
            results = vector.GeoDataFrame(results, crs=getattr(crowns, "crs", None))
        return results

    # ------------------------------------------------------------------
    def save_checkpoint(self, path):
        meta = {
            "classes": self.classes,
            "label_dict": self.label_to_index,
            "scheduler_state": self.scheduler.state_dict(),
        }
        return checkpoints.save_checkpoint(path, self.variables, meta)

    def load_checkpoint(self, path):
        tree, meta = checkpoints.load_checkpoint(path)
        self.variables = jax.tree_util.tree_map(jnp.asarray, tree)
        if "scheduler_state" in meta:
            self.scheduler.load_state_dict(meta["scheduler_state"])
        return self
