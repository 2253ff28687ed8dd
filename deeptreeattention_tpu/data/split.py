"""Plot-level train/test split search.

Capability parity with reference src/data.py:108-236 (sample_plots /
train_test_split): greedily accumulate test plots until every species clears
a 5%-of-counts floor, repeat for N random iterations (fanned out over the
futures pool — the dask replacement), keep the split with the most test
species, break ties toward the largest train set.
"""
import numpy as np

from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)


def sample_plots(shp, min_train_samples=5, min_test_samples=3, iteration=1, seed=None):
    """One randomized plot-level split attempt -> (train, test)."""
    rng = np.random.RandomState(seed if seed is not None else None)
    single_year = shp.groupby("individual", sort=False, group_keys=False).head(1)

    plot_ids = list(shp.plotID.unique())
    if len(plot_ids) <= 2:
        test = shp[shp.plotID == plot_ids[0]]
        train = shp[shp.plotID == plot_ids[1]] if len(plot_ids) > 1 else shp[0:0]
        return train, test

    osbs_plots = shp[shp.siteID == "OSBS"].plotID.unique() if "siteID" in shp.columns else []
    candidates = np.array(osbs_plots if len(osbs_plots) else plot_ids)
    rng.shuffle(candidates)

    # a species is "covered" once test holds 5% of its individuals (floored)
    floor = single_year.taxonID.value_counts() * 0.05
    floor[floor < min_test_samples] = min_test_samples
    floor = floor.to_dict()

    to_cover = set(shp.taxonID.unique())
    test_plots = []
    counts = {}
    for plot in candidates:
        plot_rows = single_year[single_year.plotID == plot]
        if not to_cover.intersection(plot_rows.taxonID.unique()):
            continue
        test_plots.append(plot)
        for t, c in plot_rows.taxonID.value_counts().items():
            counts[t] = counts.get(t, 0) + c
        to_cover = {t for t in shp.taxonID.unique() if counts.get(t, 0) <= floor[t]}
        if not to_cover:
            break

    test = shp[shp.plotID.isin(test_plots)]
    train = shp[~shp.plotID.isin(test_plots)]

    # fixed fallback boxes never belong in test
    if "box_id" in test.columns:
        fixed = test.box_id.astype(str).str.contains("fixed").fillna(False)
        test = test[~fixed]

    def enough(df, minimum):
        ok = (
            df.groupby("individual", sort=False, group_keys=False)
            .head(1)
            .groupby("taxonID")
            .filter(lambda g: len(g) >= minimum)
            .individual
        )
        return df[df.individual.isin(ok)]

    test = enough(test, min_test_samples)
    train = enough(train, min_train_samples)
    train = train[train.taxonID.isin(test.taxonID)]
    test = test[test.taxonID.isin(train.taxonID)]
    return train, test


def train_test_split(shp, config, client=None):
    """Search `iterations` random splits; maximize test species coverage."""
    min_sampled = config["min_train_samples"] + config["min_test_samples"]
    counts = shp.taxonID.value_counts()
    shp = shp[shp.taxonID.isin(counts[counts > min_sampled].index)]
    log.info(
        "splitting %d points / %d species (min %d samples)",
        len(shp), shp.taxonID.nunique(), min_sampled,
    )

    iterations = int(config["iterations"])
    seeds = np.random.RandomState(config.get("seed", 0)).randint(0, 2**31, size=iterations)

    def attempt(i):
        return sample_plots(
            shp=shp,
            min_train_samples=config["min_train_samples"],
            min_test_samples=config["min_test_samples"],
            iteration=i,
            seed=int(seeds[i]),
        )

    if client is not None:
        futures = [client.submit(attempt, i) for i in range(iterations)]
        client.wait(futures)
        results = [f.result() for f in futures if f.exception() is None]
    else:
        results = [attempt(i) for i in range(iterations)]

    best_species = -1
    ties = []
    for train, test in results:
        n = test.taxonID.nunique()
        if n > best_species:
            best_species = n
            ties = [(train, test)]
        elif n == best_species:
            ties.append((train, test))
    if not ties:
        raise ValueError("no valid split found")
    if len(ties) > 1:
        log.info("%d splits tied at %d species; keeping largest train", len(ties), best_species)
    train, test = max(ties, key=lambda tt: len(tt[0]))

    train = train.copy()
    test = test.copy()
    train["point_id"] = train.index.values
    test["point_id"] = test.index.values
    return train, test
