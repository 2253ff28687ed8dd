"""MultiStage: 5-level hierarchical species classifier (the flagship model).

Capability parity with reference src/models/multi_stage.py:17-485, TPU-first:
each level is a vmapped multi-year LearnedEnsemble trained by its own jit
step (one compiled program per level — class counts differ), with optax Adam
+ host-side plateau scheduling per level, inverse-frequency loss weights, and
static-shape padded batches. The taxonomy levels:

  L0  PIPA2 vs OTHER                (binary gate for the dominant pine)
  L1  CONIFER vs BROADLEAF          (remaining stems)
  L2  broadleaf species + OAK       (oaks collapsed)
  L3  evergreen species             (PICL/PIEL/PITA)
  L4  oak species                   (QU*)

Per-level subsampling ceilings follow the reference's dataset builders
(reference src/models/multi_stage.py:82-219); the decision-tree ensemble and
evaluation tables are host-side pandas, as in the reference.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from deeptreeattention_tpu.data.dataset import Loader, TreeDataset
from deeptreeattention_tpu.models.year import LearnedEnsemble
from deeptreeattention_tpu.parallel import gather_to_host
from deeptreeattention_tpu.train import checkpoints, metrics as M, optim, steps
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)

CONIFERS = ["PICL", "PIEL", "PITA"]
PINE_GATE = "PIPA2"


class MultiStage:
    def __init__(self, train_df, test_df, crowns, config, train_mode=True, seed=0,
                 mesh=None):
        self.config = config
        self.crowns = crowns
        self.rng = np.random.RandomState(seed)
        self.key = jax.random.PRNGKey(seed)
        # data-parallel mesh: batches shard on the leading axis, params
        # replicate; GSPMD inserts the gradient all-reduce over ICI
        from deeptreeattention_tpu.ops.preprocess import make_augmenter
        from deeptreeattention_tpu.parallel import resolve_mesh

        self.mesh = resolve_mesh(config, mesh)
        # opt-in extended augmentation (flips are already in the dataset)
        self._augmenter = make_augmenter(config.get("augmentations"))

        self.train_df = train_df.copy() if train_df is not None else None
        self.test_df = test_df.copy() if test_df is not None else None
        for df in (self.train_df, self.test_df):
            if df is not None and "individual" not in df.columns and "individualID" in df.columns:
                df["individual"] = df["individualID"]

        # canonical year keys are strings (see data/dataset.py)
        self.years = (
            [str(y) for y in pd.unique(self.train_df.tile_year)]
            if self.train_df is not None
            else []
        )
        self.species_label_dict = (
            self.train_df[["taxonID", "label"]]
            .drop_duplicates()
            .set_index("taxonID")
            .to_dict()["label"]
        )
        self.index_to_label = {v: k for k, v in self.species_label_dict.items()}
        self.level_label_dicts = []
        self.label_to_taxonIDs = []
        self.level_names = ["pine_gate", "conifer_broadleaf", "broadleaf", "evergreen", "oak"]

        if train_mode:
            self.train_datasets, self.test_datasets = self.create_datasets()
            self.levels = len(self.train_datasets)
            self.classes = len(self.train_df.label.unique())
            self._build_models()

    # ------------------------------------------------------------------
    # level dataset construction
    # ------------------------------------------------------------------
    def _level_frames(self, df, train):
        """Return list of 5 level dataframes with level-local labels."""
        cfg = self.config
        frames = []

        # L0: PIPA2 vs OTHER (ceiling on OTHER individuals when training)
        d0 = df.copy()
        if train:
            pine = d0[d0.taxonID == PINE_GATE]
            other = d0[d0.taxonID != PINE_GATE]
            keep_ids = (
                other.groupby("individual", sort=False)
                .head(1)
                .groupby("taxonID", sort=False)
                .head(cfg["other_sampling_ceiling"])
                .individual
            )
            other = other[other.individual.isin(keep_ids)]
            d0 = pd.concat([pine, other])
        d0.loc[d0.taxonID != PINE_GATE, "taxonID"] = "OTHER"
        d0["label"] = d0.taxonID.map(self.level_label_dicts[0])
        frames.append(d0)

        # L1: conifer vs broadleaf among non-PIPA2
        d1 = df[df.taxonID != PINE_GATE].copy()
        is_conifer = d1.taxonID.isin(CONIFERS)
        if train:
            conifer_ids = d1[is_conifer].individual
            per_species_cap = max(int(math.ceil(len(conifer_ids) / 11)), 1)
            broadleaf = d1[~is_conifer]
            keep = (
                broadleaf.groupby("label", sort=False, group_keys=False)
                .apply(
                    lambda g: g.sample(frac=1, random_state=self.rng)
                    .groupby("individual", sort=False)
                    .head(1)
                    .head(per_species_cap)
                )
                .individual
            )
            ids = np.concatenate([np.asarray(keep), np.asarray(conifer_ids)])
            d1 = d1[d1.individual.isin(ids)].reset_index(drop=True)
            is_conifer = d1.taxonID.isin(CONIFERS)
        d1.loc[~is_conifer, "taxonID"] = "BROADLEAF"
        d1.loc[is_conifer, "taxonID"] = "CONIFER"
        d1["label"] = d1.taxonID.map(self.level_label_dicts[1])
        frames.append(d1)

        # L2: broadleaf species with oaks collapsed
        d2 = df[~df.taxonID.isin(CONIFERS + [PINE_GATE])].copy()
        is_oak = d2.taxonID.str.contains("QU")
        if train:
            # NOTE: the oak cap counts ROWS (not individuals) on both sides,
            # unlike L1/L4's per-individual dedup — this mirrors the
            # reference exactly (src/models/multi_stage.py:155-158)
            non_oak_ids = d2[~is_oak].individual
            oak_cap = max(int(len(non_oak_ids) / 5), 1)
            oak_keep = (
                d2[is_oak]
                .groupby("label", sort=False, group_keys=False)
                .apply(lambda g: g.sample(frac=1, random_state=self.rng).head(oak_cap))
                .individual
            )
            ids = np.concatenate([np.asarray(oak_keep), np.asarray(non_oak_ids)])
            d2 = d2[d2.individual.isin(ids)].reset_index(drop=True)
            is_oak = d2.taxonID.str.contains("QU")
        d2.loc[is_oak, "taxonID"] = "OAK"
        d2["label"] = d2.taxonID.map(self.level_label_dicts[2])
        frames.append(d2)

        # L3: evergreen species
        d3 = df[df.taxonID.isin(CONIFERS)].copy().reset_index(drop=True)
        if train:
            d3 = (
                d3.groupby("taxonID", sort=False, group_keys=False)
                .head(cfg["evergreen_ceiling"])
                .reset_index(drop=True)
            )
        d3["label"] = d3.taxonID.map(self.level_label_dicts[3])
        frames.append(d3)

        # L4: oak species
        d4 = df[df.taxonID.str.contains("QU")].copy().reset_index(drop=True)
        if train:
            keep = (
                d4.groupby("taxonID", sort=False, group_keys=False)
                .apply(
                    lambda g: g.sample(frac=1, random_state=self.rng)
                    .groupby("individual", sort=False)
                    .head(1)
                    .head(cfg["oaks_sampling_ceiling"])
                )
                .individual
            )
            d4 = d4[d4.individual.isin(keep)].reset_index(drop=True)
        d4["label"] = d4.taxonID.map(self.level_label_dicts[4])
        frames.append(d4)

        # level dicts are built from TRAIN species; a test-only species maps
        # to NaN and would crash the int32 label cast in the Loader — drop
        # such rows loudly (they cannot be scored at that level)
        out = []
        for i, d in enumerate(frames):
            missing = d.label.isna()
            if missing.any():
                log.warning(
                    "level %d: dropping %d rows whose taxa are outside the "
                    "level dict (species absent from training)",
                    i, int(missing.sum()),
                )
                d = d[~missing].reset_index(drop=True)
            out.append(d)
        return out

    def create_datasets(self):
        species = list(self.species_label_dict.keys())
        broadleaf = {
            t: i
            for i, t in enumerate(
                [s for s in species if s not in CONIFERS + [PINE_GATE] and "QU" not in s]
            )
        }
        broadleaf["OAK"] = len(broadleaf)
        evergreen = {t: i for i, t in enumerate([s for s in species if s in CONIFERS])}
        oak = {t: i for i, t in enumerate([s for s in species if "QU" in s])}
        self.level_label_dicts = [
            {PINE_GATE: 0, "OTHER": 1},
            {"CONIFER": 0, "BROADLEAF": 1},
            broadleaf,
            evergreen,
            oak,
        ]
        self.label_to_taxonIDs = [{v: k for k, v in d.items()} for d in self.level_label_dicts]

        self.train_frames = self._level_frames(self.train_df, train=True)
        self.test_frames = self._level_frames(self.test_df, train=False)
        self.num_classes = [max(len(d), 2) for d in self.level_label_dicts]

        train_ds = [
            TreeDataset(df=f, config=self.config, train=True, years=self.years)
            for f in self.train_frames
        ]
        # validation datasets carry labels (train=True also applies the same
        # deterministic flips as training, reference behavior)
        test_ds = [
            TreeDataset(df=f, config=self.config, train=True, years=self.years)
            for f in self.test_frames
        ]
        return train_ds, test_ds

    # ------------------------------------------------------------------
    # models / optimizers
    # ------------------------------------------------------------------
    def _build_models(self):
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else jnp.float32
        self.models = []
        self.variables = []
        self.opt_states = []
        self.optimizers = []
        self.schedulers = []
        self.loss_weights = []
        self._train_steps = []
        self._eval_steps = []
        self._val_steps = []

        # optional pre-trained spectral backbone broadcast into every year
        # slot of every level (reference src/models/year.py:17-18)
        backbone = None
        pre = cfg.get("pretrain_state_dict")
        if pre:
            backbone = self._load_backbone(pre)

        sample = jnp.zeros(
            (1, len(self.years), cfg["image_size"], cfg["image_size"], cfg["bands"]),
            jnp.float32,
        )
        # "batch" is bit-faithful to the reference's x.sum()==0 year skip;
        # "sample" (recommended, config.yml) masks missing years per sample,
        # making predictions independent of batch composition
        mask_mode = cfg.get("mask_mode", "batch")
        self.mask_mode = mask_mode
        for level in range(self.levels):
            classes = self.num_classes[level]
            model = LearnedEnsemble(
                years=len(self.years), classes=classes, bands=cfg["bands"], dtype=dtype,
                mask_mode=mask_mode,
            )
            self.key, sub = jax.random.split(self.key)
            variables = model.init(sub, sample)
            if backbone is not None:
                from deeptreeattention_tpu.models.year import load_year_backbones

                variables = load_year_backbones(variables, backbone, len(self.years))
            lr = cfg.get("lr_{}".format(level), 1e-5)
            optimizer = optim.adam_with_plateau(lr)
            opt_state = optimizer.init(variables["params"])
            labels = self.train_frames[level].label.values
            lw = steps.compute_loss_weights(labels, classes, cfg.get("min_loss_weight"))

            self.models.append(model)
            self.variables.append(dict(variables))
            self.optimizers.append(optimizer)
            self.opt_states.append(opt_state)
            self.schedulers.append(optim.ReduceLROnPlateau(lr))
            self.loss_weights.append(lw)
            self._train_steps.append(steps.make_train_step(
                model.apply, optimizer, donate=True, remat=cfg.get("remat", False)))
            self._eval_steps.append(steps.make_eval_step(self._eval_apply(model)))
            self._val_steps.append(steps.make_loss_eval_step(model.apply))
        self._build_eval_all()

    def _eval_apply(self, model):
        """Inference forward: the MXU-fused eval path (models/fused.py) when
        config["fused_inference"] is set, else the module apply."""
        from deeptreeattention_tpu.models import fused

        return fused.eval_apply(model, self.config)

    def _build_eval_all(self):
        """One jitted forward for ALL levels (fused.multistage_eval): the
        levels share their input, so their year-ladders fuse into
        full-lane-width convs — the 5-level stack was the tile-inference
        bound (docs/PERF.md round 3). None when fused_inference is off."""
        if not self.config.get("fused_inference"):
            self._eval_all = None
            return
        from deeptreeattention_tpu.models import fused

        mask_mode = getattr(self, "mask_mode", "batch")
        dtype = (
            jnp.bfloat16
            if self.config.get("compute_dtype") == "bfloat16"
            else jnp.float32
        )

        @jax.jit
        def eval_all(variables_list, images):
            outs = fused.multistage_eval(
                variables_list, images, mask_mode=mask_mode, dtype=dtype
            )
            return tuple(jax.nn.softmax(o, axis=-1) for o in outs)

        self._eval_all = eval_all

    @staticmethod
    def _load_backbone(path):
        """Backbone variables from a torch .pt state_dict or one of our
        checkpoint directories."""
        import os

        if os.path.isdir(path):
            tree, _ = checkpoints.load_checkpoint(path)
            return tree
        from deeptreeattention_tpu.train import torch_import

        return torch_import.import_spectral_only(path)

    # ------------------------------------------------------------------
    # loaders
    # ------------------------------------------------------------------
    def train_dataloader(self):
        workers = self.config.get("workers", 0)
        return [
            Loader(ds, self.config["batch_size"], shuffle=True,
                   seed=int(self.rng.randint(0, 2**31)),
                   pad_to_batch=self.config.get("pad_batches", True),
                   workers=workers)
            for ds in self.train_datasets
        ]

    def val_dataloader(self):
        workers = self.config.get("workers", 0)
        return [
            Loader(ds, self.config["batch_size"], shuffle=False,
                   pad_to_batch=self.config.get("pad_batches", True),
                   workers=workers)
            for ds in self.test_datasets
        ]

    def predict_dataloader(self, ds):
        # decode overlaps device compute (reference DataLoader num_workers
        # analogue); the crop-file predict path is the main beneficiary
        # since predict.py forces preload_images off
        if isinstance(ds, pd.DataFrame):
            # same convenience as predict(): the model's canonical year
            # axis drives the stacking, not the frame's tile_years
            ds = TreeDataset(df=ds, config=self.config, train=False,
                             years=self.years)
        return Loader(ds, self.config["predict_batch_size"], shuffle=False,
                      pad_to_batch=self.config.get("pad_batches", True),
                      workers=self.config.get("workers", 0))

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def fit(self, epochs=None, experiment=None, fast_dev_run=None,
            checkpoint_dir=None, checkpoint_every=10, resume_from=None):
        """Train all levels; optional periodic checkpoints enable mid-training
        recovery (resume_from: path of a periodic checkpoint)."""
        cfg = self.config
        epochs = epochs if epochs is not None else cfg["epochs"]
        fast = cfg.get("fast_dev_run") if fast_dev_run is None else fast_dev_run
        if fast:
            epochs = 1
        start_epoch = 0
        if resume_from:
            restored = MultiStage.load_from_checkpoint(resume_from, config=cfg)
            self.variables = restored.variables
            self.schedulers = restored.schedulers
            self.opt_states = restored.opt_states  # Adam moments + current lr
            _, meta = checkpoints.load_checkpoint(resume_from)
            start_epoch = int(meta.get("epoch", -1)) + 1
            log.info("resumed from %s at epoch %d", resume_from, start_epoch)
        # AFTER any restore: checkpoint loads land on local device 0 and must
        # be re-replicated before they can feed a pod-mesh jit
        self._ensure_global_state()
        history = []
        for epoch in range(start_epoch, epochs):
            train_losses = self._train_epoch(max_batches=1 if fast else None)
            val = self.validate(max_batches=1 if fast else None)
            for level in range(self.levels):
                sched = self.schedulers[level]
                new_lr = sched.step(val["val_loss"][level])
                self.opt_states[level] = optim.set_learning_rate(self.opt_states[level], new_lr)
            rec = {"epoch": epoch, "train_loss": train_losses, **val}
            history.append(rec)
            if experiment:
                for level in range(self.levels):
                    experiment.log_metric(
                        "train_loss_{}".format(level), train_losses[level], epoch=epoch
                    )
                    experiment.log_metric(
                        "val_loss_{}".format(level), val["val_loss"][level], epoch=epoch
                    )
                    # learning-rate monitor equivalent (reference train.py:88)
                    experiment.log_metric(
                        "lr_{}".format(level), self.schedulers[level].lr, epoch=epoch
                    )
                for level, md in enumerate(val["metrics"]):
                    experiment.log_metrics(md, prefix="level_{}".format(level), epoch=epoch)
            log.info(
                "epoch %d train_loss=%s val_loss=%s",
                epoch,
                ["%.3f" % l for l in train_losses],
                ["%.3f" % l for l in val["val_loss"]],
            )
            if checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
                path = self.save_checkpoint(
                    "{}/epoch_{}".format(checkpoint_dir, epoch)
                )
                self._stamp_epoch(path, epoch)
        return history

    def _stamp_epoch(self, path, epoch):
        import json
        import os

        if jax.process_count() > 1 and jax.process_index() != 0:
            # save_checkpoint only writes on process 0 (shared FS); reading
            # meta.json here would race with (or precede) that write
            return
        meta_path = os.path.join(path, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["epoch"] = epoch
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=1)

    def _ensure_global_state(self):
        """On a mesh spanning processes (pod training), model/optimizer
        state must be global arrays: a tree committed to this host's device
        0 (model.init / checkpoint load) cannot feed a pod-mesh jit. Every
        process holds identical state (seeded init / same checkpoint), so
        replication assembles without cross-host transfers. No-op on
        single-host meshes."""
        from deeptreeattention_tpu.parallel import replicate, spans_processes

        if self.mesh is None:
            return
        if "model" in self.mesh.axis_names and self.mesh.shape["model"] > 1:
            # 2-D data x model mesh (config model_parallel): shard the
            # year-stacked LearnedEnsemble leaves over "model" (when the
            # year count divides the axis), replicate the rest; GSPMD
            # derives the step's collectives from these placements
            from deeptreeattention_tpu.parallel.train import place_variables

            self.variables = place_variables(self.variables, self.mesh)
            self.opt_states = place_variables(self.opt_states, self.mesh)
            self.loss_weights = place_variables(self.loss_weights, self.mesh)
            return
        if not spans_processes(self.mesh):
            return
        self.variables = replicate(self.variables, self.mesh)
        self.opt_states = replicate(self.opt_states, self.mesh)
        self.loss_weights = replicate(self.loss_weights, self.mesh)

    def _iter_batches(self, loader):
        """Loader -> double-buffered device batch stream: H2D copies (and the
        mesh sharding, when one is configured) overlap the previous step's
        compute instead of serializing with it (replaces the reference's
        DataLoader worker pool, src/models/multi_stage.py:221-246)."""
        from deeptreeattention_tpu.parallel import prefetch_to_device

        return prefetch_to_device(iter(loader), size=2, mesh=self.mesh)

    def _train_epoch(self, max_batches=None):
        loaders = self.train_dataloader()
        iters = [self._iter_batches(l) for l in loaders]
        n_steps = max(len(l) for l in loaders)
        if max_batches:
            n_steps = min(n_steps, max_batches)
        # losses accumulate on device; ONE host sync per epoch (a per-step
        # float() would add a host round-trip per step, which on the remote
        # TPU relay dominates the step time). Python-scalar init: a device-
        # committed zero would clash with pod-mesh global loss arrays.
        sums = [0.0 for _ in range(self.levels)]
        counts = np.zeros(self.levels)
        for step_i in range(n_steps):
            for level in range(self.levels):
                try:
                    batch = next(iters[level])
                except StopIteration:
                    iters[level] = self._iter_batches(loaders[level])
                    try:
                        batch = next(iters[level])
                    except StopIteration:
                        continue
                images, labels, mask = batch["HSI"], batch["label"], batch["mask"]
                if self._augmenter is not None:
                    self.key, sub = jax.random.split(self.key)
                    images = self._augmenter(images, sub)
                params, stats, opt_state, loss = self._train_steps[level](
                    self.variables[level]["params"],
                    self.variables[level].get("batch_stats", {}),
                    self.opt_states[level],
                    images, labels, mask,
                    self.loss_weights[level],
                )
                self.variables[level] = {"params": params, "batch_stats": stats}
                self.opt_states[level] = opt_state
                sums[level] = sums[level] + loss
                counts[level] += 1
        totals = np.asarray(jax.device_get(sums), dtype=np.float64)
        return (totals / np.maximum(counts, 1)).tolist()

    def validate(self, max_batches=None):
        self._ensure_global_state()
        val_losses = []
        level_metrics = []
        for level, loader in enumerate(self.val_dataloader()):
            losses = []
            mc = M.MetricCollection(self.num_classes[level])
            preds, targets = [], []
            for bi, batch in enumerate(self._iter_batches(loader)):
                if max_batches and bi >= max_batches:
                    break
                loss, probs = self._val_steps[level](
                    self.variables[level]["params"],
                    self.variables[level].get("batch_stats", {}),
                    batch["HSI"],
                    batch["label"],
                    batch["mask"],
                    self.loss_weights[level],
                )
                losses.append(float(loss))
                probs = gather_to_host(probs)  # full batch even on a pod mesh
                mask = gather_to_host(batch["mask"]).astype(bool)
                labels = gather_to_host(batch["label"])
                mc.update(probs[mask], labels[mask])
                preds.append(np.argmax(probs[mask], 1))
                targets.append(labels[mask])
            val_losses.append(float(np.mean(losses)) if losses else float("nan"))
            md = mc.compute()
            if preds:
                p = np.concatenate(preds)
                t = np.concatenate(targets)
                acc = M.per_class_accuracy(p, t, self.num_classes[level])
                prec = M.per_class_precision(p, t, self.num_classes[level])
                for taxon, idx in self.level_label_dicts[level].items():
                    md["Epoch_{}_accuracy".format(taxon)] = float(acc[idx])
                    md["Epoch_{}_precision".format(taxon)] = float(prec[idx])
            level_metrics.append(md)
        return {"val_loss": val_losses, "metrics": level_metrics}

    # ------------------------------------------------------------------
    # prediction / ensembling
    # ------------------------------------------------------------------
    def predict(self, loader):
        """Run every level on each batch -> list of (individuals, [probs]).

        Batches stream through the prefetch pipeline; with a mesh configured
        the batch axis is sharded over it (params replicated) so the
        landscape sweep runs data-parallel over ICI (SURVEY §5).

        Accepts a crowns DataFrame directly (wrapped in a TreeDataset +
        predict Loader) as a convenience; anything else must be an iterable
        of batch dicts from predict_dataloader()."""
        if isinstance(loader, pd.DataFrame):
            loader = self.predict_dataloader(
                # the model's canonical year axis must drive the stacking:
                # a frame whose tile_years are a subset (or a different
                # order) of the training years would otherwise build a
                # wrong-width stack (vmap error) or silently map years to
                # wrong parameter slots
                TreeDataset(df=loader, config=self.config, train=False,
                            years=self.years)
            )
        self._ensure_global_state()
        outputs = []
        for batch in self._iter_batches(loader):
            images = batch["HSI"]
            individuals = np.asarray(batch["individual"])  # strings stay host-side
            n = len(individuals)
            mask = gather_to_host(batch["mask"]).astype(bool)[:n]
            if getattr(self, "_eval_all", None) is not None:
                # all levels in one fused program (full MXU lane width)
                probs_all = self._eval_all(tuple(self.variables), images)
                level_probs = [gather_to_host(p)[:n][mask] for p in probs_all]
            else:
                level_probs = []
                for level in range(self.levels):
                    probs = self._eval_steps[level](
                        self.variables[level]["params"],
                        self.variables[level].get("batch_stats", {}),
                        images,
                    )
                    level_probs.append(gather_to_host(probs)[:n][mask])
            outputs.append((individuals[mask], level_probs))
        return outputs

    def gather_predictions(self, predict_df):
        """Pivot raw predictions to one row per individual with per-level
        argmax label/score (max across an individual's duplicate rows).

        Vectorized: one groupby-idxmax per level over the concatenated batch
        outputs — O(N log N) host work instead of the reference's per-row
        Python loop (reference src/models/multi_stage.py:368-402), which at
        landscape scale runs per tile x ~20 model replicates."""
        if not predict_df:
            return pd.DataFrame({"individual": []})
        inds = np.concatenate([np.asarray(b[0]) for b in predict_df])
        individuals, inv = np.unique(inds, return_inverse=True)
        data = {"individual": individuals}
        for level in range(self.levels):
            probs = np.concatenate([b[1][level] for b in predict_df])
            row_max = probs.max(axis=1)
            row_arg = probs.argmax(axis=1)
            # first-occurrence max per individual == the reference's argmax
            # over the stacked rows in appearance order
            best = pd.Series(row_max).groupby(inv).idxmax().values
            data["pred_label_top1_level_{}".format(level)] = row_arg[best].astype(int)
            data["top1_score_level_{}".format(level)] = row_max[best].astype(float)
        results = pd.DataFrame(data)
        for level, label_dict in enumerate(self.label_to_taxonIDs):
            results["pred_taxa_top1_level_{}".format(level)] = results[
                "pred_label_top1_level_{}".format(level)
            ].map(label_dict)
        return results

    def ensemble(self, results):
        """Decision-tree over the level heads -> final taxonID/label/score
        (reference src/models/multi_stage.py:404-434).

        Vectorized with boolean masks — at landscape scale this runs per tile
        x ~20 model replicates over ~10^5 crowns, where a per-row Python loop
        is the same host bottleneck gather_predictions had."""
        results = results.copy()
        is_pine = (results["pred_taxa_top1_level_0"] == PINE_GATE).values
        is_broad = (results["pred_taxa_top1_level_1"] == "BROADLEAF").values
        is_oak = (results["pred_taxa_top1_level_2"] == "OAK").values

        # default: needleleaf branch -> level 3 (evergreen species)
        taxa = results["pred_taxa_top1_level_3"].values.copy()
        scores = results["top1_score_level_3"].values.astype(float).copy()
        # broadleaf, non-oak -> level 2 species
        sel = ~is_pine & is_broad & ~is_oak
        taxa[sel] = results["pred_taxa_top1_level_2"].values[sel]
        scores[sel] = results["top1_score_level_2"].values[sel]
        # broadleaf oak -> level 4 oaks
        sel = ~is_pine & is_broad & is_oak
        taxa[sel] = results["pred_taxa_top1_level_4"].values[sel]
        scores[sel] = results["top1_score_level_4"].values[sel]
        # level-0 pine gate wins outright
        taxa[is_pine] = PINE_GATE
        scores[is_pine] = results["top1_score_level_0"].values[is_pine]

        results["ensembleTaxonID"] = taxa
        results["ens_score"] = scores
        # dict lookup keeps the historical None (not NaN) for unknown taxa
        results["ens_label"] = [self.species_label_dict.get(t) for t in taxa]
        return results

    def evaluation_scores(self, ensemble_df, experiment=None):
        ensemble_df = ensemble_df.groupby("individual", sort=False, group_keys=False).head(1)
        n = len(self.species_label_dict)
        preds = ensemble_df.ens_label.fillna(-1).astype(int).values
        target = ensemble_df.label.astype(int).values
        acc = M.per_class_accuracy(preds, target, n)
        prec = M.per_class_precision(preds, target, n)
        taxon_labels = sorted(self.species_label_dict)
        species_table = pd.DataFrame(
            {
                "taxonID": taxon_labels,
                "accuracy": [acc[self.species_label_dict[t]] for t in taxon_labels],
                "precision": [prec[self.species_label_dict[t]] for t in taxon_labels],
            }
        )
        if experiment:
            experiment.log_metrics(
                species_table.set_index("taxonID").accuracy.to_dict(), prefix="accuracy"
            )
            experiment.log_metrics(
                species_table.set_index("taxonID").precision.to_dict(), prefix="precision"
            )
            if "siteID" in ensemble_df.columns:
                site_rows = []
                for name, group in ensemble_df.groupby("siteID"):
                    gm = M.micro_accuracy(group.ens_label.values, group.label.values)
                    gM = M.macro_accuracy(
                        group.ens_label.fillna(-1).astype(int).values,
                        group.label.astype(int).values, n,
                    )
                    experiment.log_metric("{}_micro".format(name), gm)
                    experiment.log_metric("{}_macro".format(name), gM)
                    site_rows.append({"Site": name, "Micro Recall": gm, "Macro Recall": gM})
                experiment.log_table("site_results.csv", pd.DataFrame(site_rows))
            experiment.log_table("species_table.csv", species_table)
        return ensemble_df

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------
    def save_checkpoint(self, path, include_opt=True, save_dtype=None):
        """include_opt=False drops the Adam moments (prediction-only
        snapshot, ~3x smaller — the loader re-inits them at the scheduler
        lr); save_dtype="bfloat16" halves on-disk floats (committed
        artifacts)."""
        from flax import serialization

        tree = {
            "levels": {str(i): self.variables[i] for i in range(self.levels)},
            "loss_weights": {str(i): self.loss_weights[i] for i in range(self.levels)},
        }
        if include_opt:
            # Adam moments + injected lr — without them a resumed run steps a
            # converged model with zeroed moments at the base config lr
            tree["opt_states"] = {
                str(i): serialization.to_state_dict(self.opt_states[i])
                for i in range(self.levels)
            }
        meta = {
            "years": [str(y) for y in self.years],
            "species_label_dict": self.species_label_dict,
            "level_label_dicts": self.level_label_dicts,
            "num_classes": self.num_classes,
            "bands": self.config["bands"],
            "image_size": self.config["image_size"],
            "mask_mode": getattr(self, "mask_mode", self.config.get("mask_mode", "batch")),
            "scheduler_state": [s.state_dict() for s in self.schedulers],
        }
        return checkpoints.save_checkpoint(path, tree, meta,
                                           save_dtype=save_dtype)

    @classmethod
    def load_from_checkpoint(cls, path, config, train_df=None, test_df=None, crowns=None):
        from deeptreeattention_tpu.parallel import resolve_mesh

        tree, meta = checkpoints.load_checkpoint(path)
        obj = cls.__new__(cls)
        obj.config = config
        obj.crowns = crowns
        obj.mesh = resolve_mesh(config)
        from deeptreeattention_tpu.ops.preprocess import make_augmenter

        obj._augmenter = make_augmenter(config.get("augmentations"))
        obj.rng = np.random.RandomState(0)
        obj.key = jax.random.PRNGKey(0)
        obj.train_df = train_df
        obj.test_df = test_df
        obj.years = meta["years"]
        obj.species_label_dict = {k: int(v) for k, v in meta["species_label_dict"].items()}
        obj.index_to_label = {v: k for k, v in obj.species_label_dict.items()}
        obj.level_label_dicts = [
            {k: int(v) for k, v in d.items()} for d in meta["level_label_dicts"]
        ]
        obj.label_to_taxonIDs = [{v: k for k, v in d.items()} for d in obj.level_label_dicts]
        obj.level_names = ["pine_gate", "conifer_broadleaf", "broadleaf", "evergreen", "oak"]
        obj.num_classes = [int(x) for x in meta["num_classes"]]
        obj.levels = len(obj.num_classes)

        cfg = dict(config)
        cfg["bands"] = int(meta["bands"])
        cfg["image_size"] = int(meta["image_size"])
        obj.config = cfg
        dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else jnp.float32

        obj.models, obj.variables, obj.optimizers = [], [], []
        obj.opt_states, obj.schedulers, obj.loss_weights = [], [], []
        obj._train_steps, obj._eval_steps, obj._val_steps = [], [], []
        # Precedence: what the model trained with wins. Metas that predate
        # the key come from checkpoints trained under the only semantics
        # that existed then ('batch') — defaulting to the config value would
        # silently change year-mask behavior on reload.
        obj.mask_mode = meta.get("mask_mode") or "batch"
        for level in range(obj.levels):
            model = LearnedEnsemble(
                years=len(obj.years), classes=obj.num_classes[level],
                bands=cfg["bands"], dtype=dtype, mask_mode=obj.mask_mode,
            )
            # bf16-stored committed snapshots restore to f32 (compute dtype
            # is the model's `dtype` arg, params stay full precision)
            variables = jax.tree_util.tree_map(
                lambda x: (jnp.asarray(x, jnp.float32)
                           if jnp.issubdtype(np.asarray(x).dtype, jnp.floating)
                           else jnp.asarray(x)),
                tree["levels"][str(level)],
            )
            lr = cfg.get("lr_{}".format(level), 1e-5)
            optimizer = optim.adam_with_plateau(lr)
            obj.models.append(model)
            obj.variables.append(variables)
            obj.optimizers.append(optimizer)
            opt_state = optimizer.init(variables["params"])
            saved_opt = tree.get("opt_states", {}).get(str(level))
            sched = optim.ReduceLROnPlateau(lr)
            state = meta.get("scheduler_state")
            if state:
                sched.load_state_dict(state[level])
            if saved_opt is not None:
                from flax import serialization

                opt_state = serialization.from_state_dict(opt_state, saved_opt)
            else:
                # pre-opt-state checkpoint: at least resume at the
                # scheduler's current lr, not the base config lr
                opt_state = optim.set_learning_rate(opt_state, sched.lr)
            obj.opt_states.append(opt_state)
            obj.schedulers.append(sched)
            obj.loss_weights.append(
                jnp.asarray(tree["loss_weights"][str(level)], jnp.float32))
            obj._train_steps.append(steps.make_train_step(
                model.apply, optimizer, donate=True, remat=cfg.get("remat", False)))
            obj._eval_steps.append(steps.make_eval_step(obj._eval_apply(model)))
            obj._val_steps.append(steps.make_loss_eval_step(model.apply))
        obj._build_eval_all()
        return obj
