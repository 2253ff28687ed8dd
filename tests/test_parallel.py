"""Multi-device tests on the 8-device virtual CPU mesh: data-parallel
sharding, year-model parallelism, prefetch, and single-vs-multi-device
numerical equivalence of a training step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeptreeattention_tpu.models.year import LearnedEnsemble
from deeptreeattention_tpu.parallel import mesh as mesh_mod
from deeptreeattention_tpu.parallel import train as ptrain
from deeptreeattention_tpu.train import optim, steps


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_make_mesh_and_shard_batch(eight_devices):
    mesh = mesh_mod.make_mesh(8)
    batch = {"HSI": np.random.rand(12, 4, 4, 3).astype(np.float32),
             "label": np.arange(12, dtype=np.int32),
             "individual": np.array(["i%d" % i for i in range(12)])}
    placed = mesh_mod.shard_batch(batch, mesh)
    # padded to a multiple of 8 and sharded on the leading axis
    assert placed["HSI"].shape[0] == 16
    assert len(placed["HSI"].sharding.device_set) == 8
    # strings stay host-side
    assert isinstance(placed["individual"], np.ndarray)


def test_prefetch_to_device(eight_devices):
    mesh = mesh_mod.make_mesh(8)
    batches = [{"x": np.full((8, 2), i, np.float32)} for i in range(5)]
    out = list(mesh_mod.prefetch_to_device(iter(batches), size=2, mesh=mesh))
    assert len(out) == 5
    assert float(out[3]["x"][0, 0]) == 3.0


def test_sharded_step_matches_single_device(eight_devices):
    """One DP x year-parallel step == the same step on one device."""
    years, classes, bands, batch = 4, 3, 6, 16
    model = LearnedEnsemble(years=years, classes=classes, bands=bands)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, years, 11, 11, bands), jnp.float32)
    y = jnp.asarray(rng.randint(0, classes, batch), jnp.int32)
    mask = jnp.ones(batch)
    weights = jnp.ones(classes)

    variables = model.init(jax.random.PRNGKey(0), x[:1])
    optimizer = optim.adam_with_plateau(1e-3)
    opt_state = optimizer.init(variables["params"])
    step = steps.make_train_step(model.apply, optimizer)

    # single device
    p1, s1, o1, loss1 = step(variables["params"], variables["batch_stats"], opt_state,
                             x, y, mask, weights)

    # 4 data x 2 model mesh
    mesh = ptrain.make_mesh_2d(8, model_parallel=2)
    with mesh:
        params = ptrain.place_variables(variables["params"], mesh)
        stats = ptrain.place_variables(variables["batch_stats"], mesh)
        opt = ptrain.place_variables(optimizer.init(variables["params"]), mesh)
        placed = ptrain.place_batch({"x": x, "y": y, "m": mask}, mesh)
        p2, s2, o2, loss2 = step(params, stats, opt,
                                 placed["x"], placed["y"], placed["m"], weights)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    k1 = np.asarray(p1["year_models"]["conv1"]["conv"]["kernel"])
    k2 = np.asarray(jax.device_get(p2["year_models"]["conv1"]["conv"]["kernel"]))
    np.testing.assert_allclose(k1, k2, rtol=1e-4, atol=1e-6)


def test_multistage_trains_on_mesh(eight_devices, dm, config):
    from deeptreeattention_tpu.models.multi_stage import MultiStage

    mesh = mesh_mod.make_mesh(8)
    m = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns,
                   config=config, mesh=mesh)
    history = m.fit(epochs=1, fast_dev_run=True)
    assert all(np.isfinite(history[0]["train_loss"]))


def test_shard_map_inference_matches_single(eight_devices):
    from deeptreeattention_tpu.models.hang2020 import SpectralNetwork
    from deeptreeattention_tpu.parallel.inference import sharded_predict

    model = SpectralNetwork(bands=6, classes=4)
    x = jnp.asarray(np.random.RandomState(0).rand(13, 11, 11, 6), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    apply_fn = lambda v, im: model.apply(v, im, train=False)

    single = np.asarray(jax.nn.softmax(apply_fn(variables, x)[-1], axis=-1))
    mesh = mesh_mod.make_mesh(8)
    sharded = sharded_predict(apply_fn, mesh, variables, x)
    assert sharded.shape == (13, 4)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_year_params_actually_sharded(eight_devices):
    years, bands = 4, 6
    model = LearnedEnsemble(years=years, classes=3, bands=bands)
    x = jnp.zeros((1, years, 11, 11, bands))
    variables = model.init(jax.random.PRNGKey(0), x)
    mesh = ptrain.make_mesh_2d(8, model_parallel=2)
    placed = ptrain.place_variables(variables["params"], mesh)
    kernel = placed["year_models"]["conv1"]["conv"]["kernel"]
    spec = kernel.sharding.spec
    assert spec[0] == "model"


def test_multistage_predict_on_mesh_matches_single(eight_devices, dm, config):
    """The production predict path (Loader -> prefetch -> eval steps) gives
    identical gathered predictions with the batch axis sharded over the mesh."""
    from deeptreeattention_tpu.data.dataset import TreeDataset
    from deeptreeattention_tpu.models.multi_stage import MultiStage

    m1 = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns,
                    config=config, seed=0)
    mesh = mesh_mod.make_mesh(8)
    m2 = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns,
                    config=config, seed=0, mesh=mesh)
    ds = TreeDataset(df=dm.test, train=False, config=config, years=m1.years)
    g1 = m1.gather_predictions(m1.predict(m1.predict_dataloader(ds)))
    g2 = m2.gather_predictions(m2.predict(m2.predict_dataloader(ds)))
    assert list(g1.individual) == list(g2.individual)
    for level in range(m1.levels):
        assert list(g1["pred_label_top1_level_%d" % level]) == \
            list(g2["pred_label_top1_level_%d" % level])
        np.testing.assert_allclose(
            g1["top1_score_level_%d" % level], g2["top1_score_level_%d" % level],
            atol=1e-5,
        )


def test_tile_predictor_sharded_matches_single(eight_devices):
    """make_tile_predictor(mesh=...) shards the window axis via shard_map and
    reproduces the single-device per-crown scores."""
    from deeptreeattention_tpu.geo.affine import from_origin
    from deeptreeattention_tpu.models.hang2020 import SpectralNetwork
    from deeptreeattention_tpu.ops import windows as W

    bands_raw, bands, classes = 28, 8, 3
    rng = np.random.RandomState(2)
    tile = jnp.asarray(rng.randint(0, 10000, (64, 64, bands_raw)), jnp.float32)
    model = SpectralNetwork(bands=bands, classes=classes)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 11, 11, bands)))
    t = from_origin(0.0, 64.0, 1.0, 1.0)
    bounds = [(5.0, 50.0, 9.0, 55.0), (30.0, 20.0, 34.0, 25.0)]
    anchors, ids, mask = W.crown_pixel_anchors(bounds, t, budget=64)
    apply_fn = lambda v, x: model.apply(v, x, train=False)

    single = np.asarray(
        W.make_tile_predictor(apply_fn)(variables, tile, anchors, ids, mask, 2)
    )
    mesh = mesh_mod.make_mesh(8)
    sharded = np.asarray(
        W.make_tile_predictor(apply_fn, mesh=mesh)(variables, tile, anchors, ids, mask, 2)
    )
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_global_batch_crc_verification(monkeypatch):
    """DTA_VERIFY_GLOBAL_BATCH guard: identical batches pass the CRC
    all-gather; a divergent host raises instead of silently assembling an
    inconsistent global array (advisor round-3 finding)."""
    import numpy as np

    from deeptreeattention_tpu.parallel import mesh as pmesh

    b = {"x": np.arange(12, dtype=np.float32).reshape(3, 4),
         "y": np.ones(3, np.int32)}
    crc = pmesh._batch_crc(b)
    assert crc == pmesh._batch_crc(
        {"y": np.ones(3, np.int32),
         "x": np.arange(12, dtype=np.float32).reshape(3, 4)})
    b2 = {"x": b["x"].copy(), "y": b["y"].copy()}
    b2["x"][0, 0] += 1
    assert pmesh._batch_crc(b2) != crc

    from jax.experimental import multihost_utils

    # agreeing hosts: no raise
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda a: np.array([crc, crc], np.int64))
    pmesh._verify_global_batch(b)
    # diverging host: loud failure
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda a: np.array([crc, crc ^ 1], np.int64))
    with pytest.raises(RuntimeError, match="disagree on the global batch"):
        pmesh._verify_global_batch(b)


def test_model_parallel_config_plumbing(eight_devices, dm, config):
    """config["model_parallel"]=2 reaches production: resolve_mesh builds the
    2-D ("data","model") mesh, MultiStage trains and predicts on it, and the
    results match pure single-device execution (no dryrun-only topology)."""
    from deeptreeattention_tpu.models.multi_stage import MultiStage
    from deeptreeattention_tpu.parallel import resolve_mesh

    cfg = dict(config)
    cfg["model_parallel"] = 2
    cfg["mesh_devices"] = -1
    mesh = resolve_mesh(cfg)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2

    # batches shard over "data" only; padding is to the data-axis size
    batch = mesh_mod.shard_batch({"x": np.ones((6, 3), np.float32)}, mesh)
    assert batch["x"].shape[0] == 8  # padded to a multiple of 4, given 6 -> 8
    spec = batch["x"].sharding.spec
    assert spec[0] == "data" and "model" not in str(spec)

    m = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns,
                   config=cfg)
    assert m.mesh is mesh or m.mesh.axis_names == ("data", "model")

    # same seeded init, no mesh: predictions must agree bit-for-bit-ish
    single = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns,
                        config=dict(config), mesh=None)
    a = m.predict(dm.test.head(6))
    b = single.predict(dm.test.head(6))
    for (ia, pa), (ib, pb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        for la, lb in zip(pa, pb):
            np.testing.assert_allclose(la, lb, atol=2e-5)

    history = m.fit(epochs=1, fast_dev_run=True)
    assert all(np.isfinite(history[0]["train_loss"]))
