"""MultiStage robustness: sites whose species set leaves levels empty."""
import numpy as np
import pytest

from deeptreeattention_tpu.models.multi_stage import MultiStage


def _subset(dm, taxa):
    train = dm.train[dm.train.taxonID.isin(taxa)].reset_index(drop=True).copy()
    test = dm.test[dm.test.taxonID.isin(taxa)].reset_index(drop=True).copy()
    labels = {t: i for i, t in enumerate(sorted(taxa))}
    for df in (train, test):
        df["label"] = df.taxonID.map(labels)
    return train, test


def test_no_oaks_site(dm, config):
    """A site with no QU* species: levels 2/4 degrade gracefully."""
    train, test = _subset(dm, ["PIPA2", "PITA", "ACRU"])
    m = MultiStage(train_df=train, test_df=test, crowns=dm.crowns, config=config)
    history = m.fit(epochs=1, fast_dev_run=True)
    assert np.all(np.isfinite([l for l in history[0]["train_loss"] if not np.isnan(l)]))

    from deeptreeattention_tpu.data.dataset import TreeDataset

    ds = TreeDataset(df=test, config=config, train=False, years=m.years)
    results = m.gather_predictions(m.predict(m.predict_dataloader(ds)))
    ensemble_df = m.ensemble(results)
    # every prediction resolves to a real taxon (or None when an empty level
    # would have been required)
    valid = set(m.species_label_dict) | {None}
    assert set(ensemble_df.ensembleTaxonID.dropna()) <= set(m.species_label_dict)


def test_conifer_only_site(dm, config):
    train, test = _subset(dm, ["PITA", "PIEL"])
    m = MultiStage(train_df=train, test_df=test, crowns=dm.crowns, config=config)
    history = m.fit(epochs=1, fast_dev_run=True)
    finite = [l for l in history[0]["train_loss"] if not np.isnan(l)]
    assert len(finite) >= 2  # levels with data trained
