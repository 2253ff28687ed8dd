"""Entry point: alive/dead classifier training (reference train_dead.py:1-41).

    python train_dead.py [-d '{"dead": {...}}']
"""
import os

import numpy as np

from deeptreeattention_tpu.models import dead
from deeptreeattention_tpu.utils.config import read_config
from deeptreeattention_tpu.utils.logging import comet_experiment, get_logger

log = get_logger("train_dead")


def main():
    # no-op single-process; on a pod every host joins the same runtime so
    # jax.devices()/process_index are coherent with the other entry points
    from deeptreeattention_tpu.parallel import distributed

    distributed.initialize()
    config = read_config("config.yml")
    experiment = comet_experiment(project_name="DeepTreeAttention-TPU", workspace=config.get("comet_workspace"))
    experiment.add_tag("DeadAlive")

    model = dead.AliveDead(config=config)
    model.fit(experiment=experiment)

    # PR curve over the validation set — scored with the production
    # (train-mode BN) semantics so config["dead_threshold"] read off this
    # curve matches predict_dead's score distribution
    val_ds = model._folder("test", augment=False)
    true_class, predicted = model.dataset_confusion(
        val_ds, batch_size=config["dead"]["batch_size"], use_batch_stats=True
    )
    y_true = np.argmax(true_class, 1)
    dead_scores = predicted[:, 1]
    thresholds = np.linspace(0.05, 0.95, 19)
    rows = []
    for t in thresholds:
        pred = (dead_scores > t).astype(int)
        tp = int(((pred == 1) & (y_true == 1)).sum())
        fp = int(((pred == 1) & (y_true == 0)).sum())
        fn = int(((pred == 0) & (y_true == 1)).sum())
        precision = tp / (tp + fp) if tp + fp else 0.0
        recall = tp / (tp + fn) if tp + fn else 0.0
        rows.append({"threshold": t, "precision": precision, "recall": recall})
        experiment.log_metric("dead_precision@{:.2f}".format(t), precision)
        experiment.log_metric("dead_recall@{:.2f}".format(t), recall)
    import pandas as pd

    experiment.log_table("dead_pr_curve.csv", pd.DataFrame(rows))
    experiment.log_confusion_matrix(
        y_true, np.argmax(predicted, 1), labels=["Alive", "Dead"]
    )

    savedir = config["dead"]["savedir"]
    os.makedirs(savedir, exist_ok=True)
    path = model.save_checkpoint(os.path.join(savedir, experiment.get_key()))
    log.info("saved %s", path)


if __name__ == "__main__":
    main()
