"""Entry point: uncertainty-propagated abundance permutations
(reference sample_multinomial.py: 100 multinomial runs over the tile set).

    python sample_multinomial.py -d '{"experiment_key": "...", "n_permutations": 100}'
"""
from deeptreeattention_tpu import cluster
from deeptreeattention_tpu.predict import multinomial
from deeptreeattention_tpu.utils.config import read_config


def main():
    config = read_config("config.yml")
    client = cluster.start(cpus=config.get("workers", 4))
    # tile-major: each worker loads its tile once and draws every
    # permutation in memory (identical outputs to per-iteration wrapper()
    # calls at ~1/n_permutations of the IO)
    multinomial.wrapper_all(
        client=client,
        n_permutations=int(config.get("n_permutations", 100)),
        experiment_key=config["experiment_key"],
        shp_dir=config.get("results_dir", "results"),
        savedir=config.get("results_dir", "results"),
        confusion_path=config.get("confusion_path", "results/confusion_matrix.csv"),
        overlay_bounds=config.get("overlay_bounds"),
        year=config.get("predict_year"),
    )
    client.close()


if __name__ == "__main__":
    main()
