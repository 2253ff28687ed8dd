"""Entry point: full training run (equivalent of reference train.py:1-142).

    python train.py <branch> <commit> [-d '{"key": value}']

Builds (or reuses) the data artifact, trains the 5-level MultiStage hierarchy,
predicts the test set, ensembles, logs evaluation tables and the confusion
matrix to the experiment directory.
"""
import glob
import os
import sys

from deeptreeattention_tpu import cluster
from deeptreeattention_tpu.data.datamodule import TreeData
from deeptreeattention_tpu.data.dataset import TreeDataset
from deeptreeattention_tpu.models.multi_stage import MultiStage
from deeptreeattention_tpu.utils import visualize
from deeptreeattention_tpu.utils.config import read_config
from deeptreeattention_tpu.utils.logging import comet_experiment, get_logger

log = get_logger("train")


def main():
    git_branch = sys.argv[1] if len(sys.argv) > 1 else "local"
    git_commit = sys.argv[2] if len(sys.argv) > 2 else "none"

    # pod/multi-slice runs: one call per host before any jax use (no-op for
    # single-process; SLURM_NTASKS/SLURM_PROCID are picked up automatically,
    # like the reference's SLURM-provisioned cluster, reference train.py:36).
    # resolve_mesh then spans all hosts and training is synchronized
    # data-parallel over the global batch.
    from deeptreeattention_tpu.parallel import distributed

    distributed.initialize()

    config = read_config("config.yml")
    import jax

    if jax.process_count() > 1 and not config.get("use_data_commit"):
        raise SystemExit(
            "multi-host training requires use_data_commit: build the data "
            "artifact once (single host, cluster.pool fan-out), then launch "
            "the pod run against it"
        )
    experiment = comet_experiment(project_name="DeepTreeAttention-TPU", workspace=config.get("comet_workspace"))
    experiment.add_tag(git_branch)
    experiment.log_parameter("git branch", git_branch)
    experiment.log_parameter("commit hash", git_commit)
    experiment.log_parameters(config)

    if config.get("use_data_commit"):
        config["crop_dir"] = os.path.join(config["data_dir"], config["use_data_commit"])
        client = None
        data_dir = config["crop_dir"]
    else:
        data_dir = os.path.join(config["data_dir"], experiment.get_key())
        os.makedirs(data_dir, exist_ok=True)
        config["crop_dir"] = data_dir
        client = cluster.start(cpus=config.get("workers", 4))

    data_module = TreeData(
        csv_file=config.get("csv_file", "data/raw/neon_vst_data_2022.csv"),
        data_dir=data_dir, config=config, client=client, comet_logger=experiment,
    )
    if client:
        client.close()

    experiment.log_parameter("num_species", data_module.num_classes)
    experiment.log_table("train.csv", data_module.train)
    experiment.log_table("test.csv", data_module.test)

    train = data_module.train.copy()
    test = data_module.test.copy()
    crowns = data_module.crowns.copy()
    # contributed 'graves' megaplot records are excluded from model training
    train = train[~train.individual.astype(str).str.contains("graves")].reset_index(drop=True)
    test = test[~test.individual.astype(str).str.contains("graves")].reset_index(drop=True)

    m = MultiStage(train, test, config=config, crowns=crowns)
    for level, frame in enumerate(m.train_frames):
        experiment.log_table("train_level_{}.csv".format(level), frame)
    for level, frame in enumerate(m.test_frames):
        experiment.log_table("test_level_{}.csv".format(level), frame)

    m.fit(experiment=experiment)

    snapshot_dir = config.get("snapshot_dir", "snapshots")
    os.makedirs(snapshot_dir, exist_ok=True)
    m.save_checkpoint(os.path.join(snapshot_dir, experiment.get_key()))

    ds = TreeDataset(df=test, train=False, config=config, years=m.years)
    predictions = m.predict(m.predict_dataloader(ds))
    results = m.gather_predictions(predictions)
    results_with_data = results.merge(crowns, on="individual")
    experiment.log_table("nested_predictions.csv", results_with_data)

    ensemble_df = m.ensemble(results)
    ensemble_df = ensemble_df.merge(
        test.groupby("individual", sort=False, group_keys=False).head(1)[
            [c for c in ["individual", "label", "taxonID", "siteID"] if c in test.columns]
        ],
        on="individual",
    )
    ensemble_df = m.evaluation_scores(ensemble_df, experiment=experiment)
    experiment.log_table("ensemble_df.csv", ensemble_df)

    ensemble_df = ensemble_df.reset_index(drop=True)
    ensemble_df["pred_taxa_top1"] = ensemble_df.ensembleTaxonID
    ensemble_df["pred_label_top1"] = ensemble_df.ens_label
    rgb_pool = glob.glob(config["rgb_sensor_pool"], recursive=True)
    visualize.confusion_matrix(
        comet_experiment=experiment,
        results=ensemble_df.dropna(subset=["pred_label_top1"]),
        species_label_dict=data_module.species_label_dict,
        test=test.groupby("individual", sort=False, group_keys=False).head(1).reset_index(drop=True),
        test_points=data_module.canopy_points,
        test_crowns=crowns,
        rgb_pool=rgb_pool,
        max_examples=config.get("plot_n_individuals", 0),
    )
    log.info("run %s complete; outputs in %s", experiment.get_key(), experiment.dir)
    return experiment


if __name__ == "__main__":
    main()
