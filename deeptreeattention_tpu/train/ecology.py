"""Ecology-specific evaluation metrics.

Capability parity with reference src/metrics.py:8-106: within-site confusion
(what share of misclassifications involve co-occurring species), within-genus
confusion, and out-of-distribution activation scoring for novel species.
"""
import numpy as np
import pandas as pd


def site_confusion(y_true, y_pred, site_lists):
    """Proportion of errors where true and predicted species co-occur at a
    site. site_lists: taxonID -> list of sites."""
    within = cross = 0
    for t, p in zip(y_true, y_pred):
        if t == p:
            continue
        true_sites = site_lists[t]
        pred_sites = site_lists[p]
        if any(s in pred_sites for s in true_sites):
            within += 1
        else:
            cross += 1
    total = within + cross
    return within / total if total else 0


def genus_confusion(y_true, y_pred, scientific_dict):
    """Proportion of errors within the same genus. scientific_dict:
    taxonID -> [scientific name] (genus = first word)."""
    within = cross = 0
    for t, p in zip(y_true, y_pred):
        if t == p:
            continue
        true_genus = scientific_dict[t][0].split()[0]
        pred_genus = scientific_dict[p][0].split()[0]
        if true_genus == pred_genus:
            within += 1
        else:
            cross += 1
    total = within + cross
    return within / total if total else 0


def novel_prediction(model, csv_file, config):
    """Score a dataset of species absent from training: top pre-softmax
    activation and top softmax score per individual (OOD diagnostics)."""
    import jax.numpy as jnp

    from deeptreeattention_tpu.data.dataset import Loader, TreeDataset

    # train=False: novel-species csvs have no label column by construction
    # (generate_crops keeps only the annotation schema). The model's
    # canonical year axis must drive the dataset: the csv's own year order
    # can differ (or be a subset), silently mapping years to wrong slots.
    ds = TreeDataset(csv_file=csv_file, config=config, train=False,
                     years=getattr(model, "years", None))
    loader = Loader(ds, config["batch_size"], pad_to_batch=config.get("pad_batches", True))

    individuals, top_scores, softmax_scores = [], [], []
    for batch in loader:
        mask = batch["mask"]
        probs = np.asarray(model.predict(jnp.asarray(batch["HSI"])))[mask]
        # model.predict returns softmax; recover a monotonic activation proxy
        softmax_scores.append(probs.max(axis=1))
        top_scores.append(np.log(np.clip(probs, 1e-12, 1)).max(axis=1))
        individuals.append(batch["individual"][mask])
    features = pd.DataFrame(
        {
            "individualID": np.concatenate(individuals),
            "top_score": np.concatenate(top_scores),
            "softmax_score": np.concatenate(softmax_scores),
        }
    )
    original = pd.read_csv(csv_file)
    if "individualID" not in original.columns and "individual" in original.columns:
        original = original.rename(columns={"individual": "individualID"})
    return features.merge(original)
