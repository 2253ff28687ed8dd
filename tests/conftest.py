"""Test fixtures.

Forces an 8-virtual-device CPU platform BEFORE jax initializes so sharding
tests exercise a real multi-device mesh without TPU hardware (mirrors the
reference's no-GPU-in-CI strategy, reference tests/conftest.py:83).

Fixture strategy follows reference tests/conftest.py:26-116: a committed
miniature data artifact + config override + session-scoped datamodule/model,
with the live DeepForest download replaced by a deterministic stub detector.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize force-registers the TPU platform and resets
# jax_platforms at interpreter boot; override it here so the suite runs on
# the 8-device virtual CPU mesh (jax is not yet backend-initialized at
# conftest import time, so this takes effect).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ROOT():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def fixtures_dir(ROOT, tmp_path_factory):
    """Generate the synthetic miniature data artifact once per session."""
    from tests.make_fixtures import ensure_fixtures

    out = os.path.join(ROOT, "tests", "data")
    ensure_fixtures(out)
    return out


@pytest.fixture(scope="session")
def config(ROOT, fixtures_dir):
    from tests.make_fixtures import fixture_config

    return fixture_config(fixtures_dir)


@pytest.fixture(scope="session")
def dm(config, fixtures_dir):
    from deeptreeattention_tpu.data.datamodule import TreeData

    artifact = os.path.join(fixtures_dir, "artifact")
    return TreeData(
        csv_file=os.path.join(artifact, "train.csv"),
        config=config,
        data_dir=artifact,
        debug=True,
    )


@pytest.fixture(scope="session")
def m(config, dm):
    from deeptreeattention_tpu.models.multi_stage import MultiStage

    return MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns, config=config)


@pytest.fixture(scope="session")
def experiment(tmp_path_factory):
    from deeptreeattention_tpu.utils.logging import Experiment

    return Experiment(savedir=str(tmp_path_factory.mktemp("exp")))
