"""TreeData: the end-to-end ETL orchestrator (data module).

Capability parity with reference src/data.py:312-539 (TreeData
LightningDataModule): raw NEON csv -> filter -> megaplot merge -> CHM filter
-> crown detection -> per-year crops -> train/test split -> label dicts, with
phase outputs written to the data dir so a rerun resumes from completed
stages, and a `use_data_commit` fast path that loads a finished artifact.
"""
import glob
import os

import numpy as np
import pandas as pd

from deeptreeattention_tpu.data import chm as chm_mod
from deeptreeattention_tpu.data import crops as crops_mod
from deeptreeattention_tpu.data import crowns as crowns_mod
from deeptreeattention_tpu.data import megaplot as megaplot_mod
from deeptreeattention_tpu.data.filter import filter_data
from deeptreeattention_tpu.data.split import train_test_split
from deeptreeattention_tpu.geo import vector
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)


class TreeData:
    def __init__(self, csv_file, config, HSI=True, metadata=False, client=None,
                 data_dir=None, comet_logger=None, debug=False):
        self.csv_file = csv_file
        self.config = config
        self.client = client
        self.comet_logger = comet_logger
        self.debug = debug
        self.data_dir = data_dir or config.get("data_dir", ".")
        if config.get("use_data_commit"):
            if data_dir is None:
                # the commit value locates the artifact (reference
                # train.py:30-31 joins data_dir with the commit id): accept
                # either a full artifact path or a commit id under
                # config["data_dir"] — no second knob has to agree with it
                commit = str(config["use_data_commit"])
                self.data_dir = commit if os.path.isdir(commit) else \
                    os.path.join(config.get("data_dir", "."), commit)
        else:
            # boxes/ only exists for the regenerate path (crown detection
            # writes there); a loaded artifact dir may be read-only
            os.makedirs(os.path.join(self.data_dir, "boxes"), exist_ok=True)

        from deeptreeattention_tpu.utils.profiling import StageTimer

        self.timer = StageTimer()
        self.predicted_dead = pd.DataFrame()  # populated by dead scoring
        if config.get("use_data_commit"):
            with self.timer.stage("load_artifact"):
                self._load_artifact()
        else:
            self._regenerate()
            self.timer.log(
                getattr(self.comet_logger, "experiment", self.comet_logger)
                if self.comet_logger else None
            )

    # ------------------------------------------------------------------
    def setup(self, stage=None):
        """Lightning-surface no-op: the reference's TreeData (a
        LightningDataModule, reference src/data.py:312-318) runs its ETL in
        __init__ and inherits setup() as a no-op; callers porting
        `dm.setup()` invocations keep working."""
        return None

    # ------------------------------------------------------------------
    def _log_param(self, name, value):
        if self.comet_logger is not None:
            exp = getattr(self.comet_logger, "experiment", self.comet_logger)
            exp.log_parameter(name, value)

    def _regenerate(self):
        cfg = self.config
        if cfg.get("replace", True):
            with self.timer.stage("filter"):
                df = filter_data(self.csv_file, config=cfg)

            IFAS = None
            if cfg.get("megaplot_dir"):
                mega = megaplot_mod.load(directory=cfg["megaplot_dir"], config=cfg, site="OSBS")
                if mega is None or mega.empty:
                    log.warning(
                        "megaplot_dir %s produced no plots — skipping megaplot ingest",
                        cfg["megaplot_dir"],
                    )
                    mega = None
            else:
                mega = None
            if mega is not None:
                mega.loc[mega.taxonID == "MAGR4", "taxonID"] = "MAGNO"
                if "filename" in mega.columns:
                    is_ifas = mega.filename.astype(str).str.contains("IFAS")
                    IFAS = mega[is_ifas].copy()
                    if not IFAS.empty:
                        IFAS["geometry"] = [g.envelope for g in IFAS.geometry]
                        IFAS["box_id"] = list(range(len(IFAS)))
                        IFAS = IFAS[
                            ["geometry", "taxonID", "individual", "plotID", "siteID", "box_id"]
                        ]
                    mega = mega[~is_ifas]
                df = pd.concat([mega, df])

            if not self.debug:
                # cap contributions from non-OSBS sites per species
                osbs = df[df.siteID == "OSBS"]
                other = df[df.siteID != "OSBS"]
                other = other[other.taxonID.isin(osbs.taxonID.unique())]
                other = other.groupby("taxonID", sort=False, group_keys=False).head(
                    cfg["samples_from_other_sites"]
                )
                df = pd.concat([osbs, other])

            self._log_param("Species before CHM filter", df.taxonID.nunique())
            self._log_param("Samples before CHM filter", len(df))

            with self.timer.stage("chm_filter"):
                df = chm_mod.filter_CHM(
                    df, CHM_pool=cfg["CHM_pool"], min_CHM_height=cfg["min_CHM_height"],
                max_CHM_diff=cfg["max_CHM_diff"], CHM_height_limit=cfg["CHM_height_limit"],
            )
            self.canopy_points = vector.GeoDataFrame(df)
            self.canopy_points.to_file(os.path.join(self.data_dir, "canopy_points.shp"))
            self._log_param("Species after CHM filter", df.taxonID.nunique())
            self._log_param("Samples after CHM filter", len(df))

            with self.timer.stage("crowns"):
                self.crowns = crowns_mod.points_to_crowns(
                    field_data=os.path.join(self.data_dir, "canopy_points.shp"),
                rgb_dir=cfg["rgb_sensor_pool"],
                savedir=os.path.join(self.data_dir, "boxes"),
                raw_box_savedir=os.path.join(self.data_dir, "boxes"),
                client=self.client,
                config=cfg,
            )
            if IFAS is not None and not IFAS.empty:
                # ignore_index: duplicate index labels would make the dead-
                # score .loc writeback select more rows than values
                self.crowns = vector.GeoDataFrame(
                    pd.concat([self.crowns, IFAS], ignore_index=True)
                )
            self.crowns = vector.GeoDataFrame(self.crowns.reset_index(drop=True))
            self._log_param("Species after crown prediction", self.crowns.taxonID.nunique())
            self._log_param("Samples after crown prediction", len(self.crowns))
            # score BEFORE writing crowns.shp so the dead annotations persist
            # (and survive a replace=False resume)
            self._score_and_log_dead()
            self.crowns.to_file(os.path.join(self.data_dir, "crowns.shp"))
        else:
            self.crowns = vector.read_file(os.path.join(self.data_dir, "crowns.shp"))
            self.canopy_points = vector.read_file(
                os.path.join(self.data_dir, "canopy_points.shp")
            )
            # resume path: rebuild predicted_dead from the persisted columns
            # (or score now if the artifact predates dead scoring)
            if "dead_label" in self.crowns.columns:
                self.predicted_dead = self.crowns[
                    self.crowns.dead_label.astype(float) == 1
                ]
            else:
                self._score_and_log_dead()

        with self.timer.stage("crops"):
            annotations = crops_mod.generate_crops(
                self.crowns,
            savedir=self.config["crop_dir"],
            sensor_glob=self.config["HSI_sensor_pool"],
            convert_h5=self.config["convert_h5"],
            rgb_glob=self.config["rgb_sensor_pool"],
            HSI_tif_dir=self.config.get("HSI_tif_dir"),
            client=self.client,
            replace=self.config.get("replace", True),
        )
        annotations.to_csv(os.path.join(self.data_dir, "annotations.csv"), index=False)
        self._log_param("Species after crop generation", annotations.taxonID.nunique())
        self._log_param("Samples after crop generation", len(annotations))

        if self.config.get("new_train_test_split", True):
            with self.timer.stage("split"):
                self.train, self.test = train_test_split(
                    annotations, config=self.config, client=self.client
            )
        else:
            prev_train = pd.read_csv(os.path.join(self.data_dir, "train.csv"))
            prev_test = pd.read_csv(os.path.join(self.data_dir, "test.csv"))
            self.train = annotations[annotations.individual.isin(prev_train.individual)]
            self.test = annotations[annotations.individual.isin(prev_test.individual)]

        # novel species: crops that made it through ETL but aren't in either split
        used = np.concatenate([self.train.individual.unique(), self.test.individual.unique()])
        novel = annotations[~annotations.individual.isin(used)]
        split_taxa = np.concatenate([self.train.taxonID.unique(), self.test.taxonID.unique()])
        self.novel = novel[~novel.taxonID.isin(split_taxa)]
        self.novel.to_csv(os.path.join(self.data_dir, "novel_species.csv"), index=False)

        self._finalize_labels()
        self.train.to_csv(os.path.join(self.data_dir, "train.csv"), index=False)
        self.test.to_csv(os.path.join(self.data_dir, "test.csv"), index=False)
        log.info(
            "train: %d records / %d species / %d sites; test: %d records / %d species",
            len(self.train), self.train.label.nunique(), self.train.site.nunique(),
            len(self.test), self.test.label.nunique(),
        )

    def _score_and_log_dead(self):
        """Optional ETL-time alive/dead scoring + dead-crown image logging
        (reference src/data.py:405-419 — there the feature is latent:
        `predicted_dead` is never assigned, so its loop always lands in the
        except; here it works when config["dead_model"] points at an
        AliveDead checkpoint). Sets self.predicted_dead; logs a review image
        per predicted-dead crown to the experiment."""
        self.predicted_dead = pd.DataFrame()
        cfg = self.config
        if not cfg.get("dead_model"):
            return
        try:
            with self.timer.stage("dead_scoring"):
                from deeptreeattention_tpu.models import dead as dead_mod
                from deeptreeattention_tpu.predict.tiles import predict_dead

                model = dead_mod.AliveDead.load_from_checkpoint(
                    cfg["dead_model"], config=cfg
                )
                crowns = self.crowns[self.crowns.RGB_tile.notna()] \
                    if "RGB_tile" in self.crowns.columns else self.crowns
                if crowns.empty:
                    return
                label, score = predict_dead(
                    crowns=crowns, config=cfg, dead_model=model
                )
                self.crowns.loc[crowns.index, "dead_label"] = label
                self.crowns.loc[crowns.index, "dead_score"] = score
                # parameter names mirror the reference verbatim (src/data.py:
                # 407-408) — like there, no rows are dropped at this stage
                # (dead crowns are ANNOTATED here and masked at predict time)
                self._log_param("Species after dead filtering", self.crowns.taxonID.nunique())
                self._log_param("Samples after dead filtering", len(self.crowns))
                dead_rows = crowns[np.asarray(label) == 1]
                self.predicted_dead = dead_rows.assign(
                    dead_label=np.asarray(label)[np.asarray(label) == 1],
                    dead_score=np.asarray(score)[np.asarray(label) == 1],
                )
            if self.comet_logger is None or self.predicted_dead.empty:
                return
            exp = getattr(self.comet_logger, "experiment", self.comet_logger)
            from deeptreeattention_tpu.data import neon_paths
            from deeptreeattention_tpu.geo import raster

            rgb_pool = glob.glob(cfg["rgb_sensor_pool"], recursive=True)
            for _, row in self.predicted_dead.iterrows():
                left, bottom, right, top = row["geometry"].bounds
                img_path = neon_paths.find_sensor_path(
                    lookup_pool=rgb_pool, bounds=row["geometry"].bounds
                )
                with raster.open_raster(img_path) as src:
                    img = src.read_bounds(
                        left - 4, bottom - 4, right + 4, top + 4, boundless=True
                    )
                img = np.moveaxis(img, 0, -1)
                exp.log_image(
                    image_data=img,
                    name="Dead: {} ({:.2f}) {}".format(
                        row["dead_label"], row["dead_score"], row["individual"]
                    ),
                )
        except Exception:
            # best-effort, like every reference ETL observability hook
            log.warning("ETL dead scoring/logging failed", exc_info=True)

    def _load_artifact(self):
        log.info("Loading previous data commit from %s", self.data_dir)
        self.train = pd.read_csv(os.path.join(self.data_dir, "train.csv"))
        self.test = pd.read_csv(os.path.join(self.data_dir, "test.csv"))
        for df in (self.train, self.test):
            if "individual" not in df.columns and "individualID" in df.columns:
                df["individual"] = df["individualID"]
        self.crowns = vector.read_file(os.path.join(self.data_dir, "crowns.shp"))
        self.canopy_points = vector.read_file(os.path.join(self.data_dir, "canopy_points.shp"))
        if "dead_label" in self.crowns.columns:
            self.predicted_dead = self.crowns[
                self.crowns.dead_label.astype(float) == 1
            ]
        # the regenerate path always provides self.novel — load it from the
        # artifact too (empty frame when the artifact predates it)
        novel_csv = os.path.join(self.data_dir, "novel_species.csv")
        self.novel = (
            pd.read_csv(novel_csv) if os.path.exists(novel_csv) else pd.DataFrame()
        )
        self._finalize_labels()

    def _finalize_labels(self):
        species = np.unique(
            np.concatenate([self.train.taxonID.unique(), self.test.taxonID.unique()])
        )
        species = np.sort(species)
        self.num_classes = len(species)
        self.species_label_dict = {t: i for i, t in enumerate(species)}
        self.label_to_taxonID = {v: k for k, v in self.species_label_dict.items()}

        sites = np.unique(
            np.concatenate([self.train.siteID.unique(), self.test.siteID.unique()])
        )
        self.site_label_dict = {s: i for i, s in enumerate(sites)}
        self.num_sites = len(self.site_label_dict)

        self.train = self.train.copy()
        self.test = self.test.copy()
        self.train["label"] = self.train.taxonID.map(self.species_label_dict)
        self.train["site"] = self.train.siteID.map(self.site_label_dict)
        self.test["label"] = self.test.taxonID.map(self.species_label_dict)
        self.test["site"] = self.test.siteID.map(self.site_label_dict)
