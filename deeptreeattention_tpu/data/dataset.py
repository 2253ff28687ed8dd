"""TreeDataset: year-stacked per-crown HSI crops + batched host loader.

Capability parity with reference src/data.py:239-311 (TreeDataset) re-shaped
for TPU feeding: an item is (individual, images[Y, S, S, C] float32, label)
with missing years zero-filled, and the loader collates fixed-shape numpy
batches (optionally padded to a static batch size so every training step hits
the same compiled program). `preload=True` materializes the whole dataset as
one [N, Y, S, S, C] array — batching becomes pure slicing.
"""
import os

import numpy as np
import pandas as pd

from deeptreeattention_tpu.ops.preprocess import load_image


class TreeDataset:
    def __init__(self, df=None, csv_file=None, config=None, train=True, years=None):
        if csv_file is not None:
            self.annotations = pd.read_csv(csv_file)
        else:
            self.annotations = df.copy()
        self.config = config
        self.train = train
        self.image_size = config["image_size"]
        self.bands = config["bands"]
        # canonical year key is str: filenames yield "2019" while csv
        # round-trips yield ints — normalize so lookups never silently miss
        # canonical str years; floats from pandas csv inference ('2019.0')
        # would silently miss every lookup against '2019'
        if self.annotations.tile_year.isna().any():
            # int(nan) inside the map would raise an opaque ValueError; name
            # the problem instead
            n_bad = int(self.annotations.tile_year.isna().sum())
            raise ValueError(
                "{} annotation rows have a missing tile_year (e.g. individuals "
                "{})".format(
                    n_bad,
                    list(
                        self.annotations[self.annotations.tile_year.isna()]
                        .individual.head(3)
                    ),
                )
            )
        self.annotations["tile_year"] = self.annotations.tile_year.map(
            lambda v: str(int(v)) if isinstance(v, float) and v == int(v) else str(v)
        )
        # year axis: order of first appearance (reference semantics)
        if years is None:
            self.years = list(pd.unique(self.annotations.tile_year))
        else:
            self.years = [str(y) for y in years]
        self.individuals = list(pd.unique(self.annotations.individual))
        by_ind = self.annotations.groupby("individual")
        self.image_paths = {
            ind: dict(zip(g.tile_year, g.image_path)) for ind, g in by_ind
        }
        if train:
            self.labels = self.annotations.set_index("individual").label.to_dict()
        else:
            self.labels = None
        # site metadata (for the metadata-fusion models) when present
        self.sites = (
            self.annotations.groupby("individual", sort=False).site.first().to_dict()
            if "site" in self.annotations.columns
            else None
        )

        self._preloaded = None
        if config.get("preload_images"):
            if self.individuals:
                self._preloaded = np.stack(
                    [self._load_individual(ind) for ind in self.individuals]
                )
            else:
                # np.stack([]) raises; an empty hierarchy level (e.g. a site
                # with no oaks) must still construct
                s, c = self.image_size, self.bands
                self._preloaded = np.zeros(
                    (0, len(self.years), s, s, c), np.float32
                )

    def __len__(self):
        return len(self.individuals)

    def _load_individual(self, individual):
        """[Y, S, S, C] float32; zeros for missing years; train-time flips."""
        s, c = self.image_size, self.bands
        images = np.zeros((len(self.years), s, s, c), np.float32)
        paths = self.image_paths.get(individual, {})
        for yi, year in enumerate(self.years):
            path = paths.get(year)
            if path is None:
                continue
            full = os.path.join(self.config["crop_dir"], path)
            try:
                img = load_image(full, image_size=s, augment=self.train)
            except (ValueError, FileNotFoundError, OSError):
                continue
            if img.shape[-1] == c:
                images[yi] = img
            elif img.shape[-1] > c:
                images[yi] = img[..., :c]
            else:
                images[yi, ..., : img.shape[-1]] = img
        return images

    def __getitem__(self, index):
        individual = self.individuals[index]
        if self._preloaded is not None:
            images = self._preloaded[index]
        else:
            images = self._load_individual(individual)
        if self.train:
            return individual, images, int(self.labels[individual])
        return individual, images


class Loader:
    """Batched iterator over a TreeDataset with optional static-shape padding.

    Yields dict batches: {"individual": np.array[str], "HSI": [B, Y, S, S, C],
    "label": [B] (train), "mask": [B] bool (True = real sample)}. When
    `pad_to_batch` is set, the final partial batch is padded so jit sees one
    shape; padded rows carry mask=False and are excluded downstream.

    workers > 0 decodes items through a readahead thread pool (the
    replacement for the reference's DataLoader worker processes,
    reference src/models/multi_stage.py:221-246): with preload off, crop
    decode otherwise runs serially on one core while the device idles.
    Items are submitted in index order and consumed in index order, so
    batch ordering and content are identical to the serial path
    (tests/test_data.py::test_loader_workers_identical).
    """

    def __init__(self, dataset, batch_size, shuffle=False, seed=0, pad_to_batch=False,
                 drop_last=False, workers=0):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.pad = pad_to_batch
        self.drop_last = drop_last
        # a preloaded dataset is pure slicing — threads would only add
        # overhead
        self.workers = 0 if getattr(dataset, "_preloaded", None) is not None else int(workers or 0)

    def __len__(self):
        n = len(self.ds)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _items(self, idx):
        if not self.workers:
            for i in idx:
                yield self.ds[int(i)]
            return
        import collections
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self.workers) as ex:
            pending = collections.deque()
            it = iter(idx)

            def fill():
                while len(pending) < self.workers * 4:
                    try:
                        i = next(it)
                    except StopIteration:
                        return
                    pending.append(ex.submit(self.ds.__getitem__, int(i)))

            fill()
            while pending:
                yield pending.popleft().result()  # in-order consumption
                fill()

    def __iter__(self):
        idx = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(idx)
        bs = self.batch_size
        items = []
        for it in self._items(idx):
            items.append(it)
            if len(items) == bs:
                yield self._collate(items)
                items = []
        if items and not self.drop_last:
            yield self._collate(items)

    def _collate(self, items):
        bs = self.batch_size
        individuals = np.array([it[0] for it in items])
        images = np.stack([it[1] for it in items])
        batch = {"individual": individuals, "HSI": images}
        if self.ds.train:
            batch["label"] = np.array([it[2] for it in items], np.int32)
        if getattr(self.ds, "sites", None) is not None:
            batch["site"] = np.array(
                [int(self.ds.sites.get(i, 0)) for i in individuals], np.int32
            )
        mask = np.ones(len(items), bool)
        if self.pad and len(items) < bs:
            padn = bs - len(items)
            batch["HSI"] = np.concatenate(
                [batch["HSI"], np.zeros((padn,) + images.shape[1:], images.dtype)]
            )
            if "label" in batch:
                batch["label"] = np.concatenate([batch["label"], np.zeros(padn, np.int32)])
            if "site" in batch:
                batch["site"] = np.concatenate([batch["site"], np.zeros(padn, np.int32)])
            batch["individual"] = np.concatenate([individuals, np.array(["__pad__"] * padn)])
            mask = np.concatenate([mask, np.zeros(padn, bool)])
        batch["mask"] = mask
        return batch
