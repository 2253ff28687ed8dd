"""End-to-end learning test: the fixture species carry distinct spectral
signatures, so a few epochs of MultiStage training must beat chance — this
exercises gradients, optimizers, BN updates, and the eval path together."""
import numpy as np
import pytest

from deeptreeattention_tpu.models.multi_stage import MultiStage


@pytest.mark.slow
def test_multistage_learns_signal(dm, config):
    cfg = dict(config)
    cfg["preload_images"] = True
    cfg["batch_size"] = 32
    # usable learning rates for the tiny fixture (the reference's production
    # LRs are tuned for 70 epochs on real data)
    for level in range(5):
        cfg["lr_{}".format(level)] = 1e-3
    cfg["min_loss_weight"] = None

    m = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns,
                   config=cfg, seed=1)
    history = m.fit(epochs=8)

    final = history[-1]["metrics"]
    # level 0 (PIPA2 vs OTHER) must clearly beat the trivial majority rate,
    # and the pine/oak fine levels must beat coin-flip
    assert final[0]["Micro Accuracy"] > 0.85, final[0]
    assert final[3]["Micro Accuracy"] > 0.7, final[3]
    assert final[4]["Micro Accuracy"] > 0.7, final[4]
    # losses decreased
    assert history[-1]["train_loss"][0] < history[0]["train_loss"][0]
