"""Feature-embedding visualization (equivalent of reference
notebooks/embeddings.py): extract a level's spectral features for a dataset,
project with TSNE, and plot colored by label.

    python scripts/embeddings.py <checkpoint_dir> [level] [-d '{...}']
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def extract_features(m, ds, level=4):
    """Per-individual final-stage softmax features for one hierarchy level."""
    import jax.numpy as jnp

    feats, labels, individuals = [], [], []
    for batch in m.predict_dataloader(ds):
        probs = m._eval_steps[level](
            m.variables[level]["params"],
            m.variables[level].get("batch_stats", {}),
            jnp.asarray(batch["HSI"]),
        )
        mask = batch["mask"]
        feats.append(np.asarray(probs)[mask])
        individuals.append(batch["individual"][mask])
        if "label" in batch:
            labels.append(batch["label"][mask])
    feats = np.concatenate(feats)
    individuals = np.concatenate(individuals)
    labels = np.concatenate(labels) if labels else None
    return feats, labels, individuals


def plot_tsne(feats, labels, out_path="results/embeddings.png", perplexity=15):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    proj = TSNE(
        n_components=2, perplexity=min(perplexity, max(len(feats) - 1, 2) / 3)
    ).fit_transform(feats)
    fig, ax = plt.subplots(figsize=(8, 8))
    scatter = ax.scatter(
        proj[:, 0], proj[:, 1], c=labels if labels is not None else "k",
        cmap="tab20", alpha=0.6, s=14,
    )
    if labels is not None:
        fig.colorbar(scatter, ax=ax, label="label")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120)
    return out_path


def main():
    from deeptreeattention_tpu.data.dataset import TreeDataset
    from deeptreeattention_tpu.models.multi_stage import MultiStage
    from deeptreeattention_tpu.utils.config import read_config

    ckpt = sys.argv[1]
    level = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 4
    config = read_config("config.yml")
    m = MultiStage.load_from_checkpoint(ckpt, config=config)

    import pandas as pd

    test = pd.read_csv(os.path.join(config["data_dir"], config["use_data_commit"], "test.csv"))
    ds = TreeDataset(df=test, config=config, train=True, years=m.years)
    feats, labels, _ = extract_features(m, ds, level=level)
    out = plot_tsne(feats, labels)
    print("wrote", out)


if __name__ == "__main__":
    main()
