"""Year-ensemble tests: stacked-param vmap forward + masked year mean
(pattern: reference tests/test_year.py — zero-image years excluded)."""
import jax
import jax.numpy as jnp
import numpy as np

from deeptreeattention_tpu.models.year import LearnedEnsemble


def _make(years=3, classes=4, bands=8, mask_mode="batch"):
    model = LearnedEnsemble(years=years, classes=classes, bands=bands, mask_mode=mask_mode)
    x = jnp.ones((2, years, 11, 11, bands))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_forward_shape():
    model, variables = _make()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 11, 11, 8), jnp.float32)
    out = model.apply(variables, x)
    assert out.shape == (2, 4)


def test_zero_year_excluded_from_mean():
    model, variables = _make()
    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 11, 11, 8).astype(np.float32)
    x[:, 1] = 0.0  # year 1 missing for the whole batch
    full = model.apply(variables, jnp.asarray(x))

    # manual mean over years 0 and 2 only
    per_year = []
    for y in (0, 2):
        xi = np.zeros_like(x)
        xi[:, y] = x[:, y]
        # isolate: run with only year y nonzero, multiply back by 2/1 logic
        per_year.append(np.asarray(model.apply(variables, jnp.asarray(xi))))
    # with one valid year the output equals that year's scores; so the
    # two-year mean must average them
    manual = (per_year[0] * 1 + per_year[1] * 1) / 2  # placeholder structure
    # per_year[i] used a single valid year => equals that year's scores
    np.testing.assert_allclose(np.asarray(full), manual, rtol=1e-4, atol=1e-5)


def test_all_zero_input_is_finite():
    model, variables = _make()
    out = model.apply(variables, jnp.zeros((2, 3, 11, 11, 8)))
    assert np.all(np.isfinite(np.asarray(out)))


def test_sample_mask_mode_differs_per_sample():
    model, variables = _make(mask_mode="sample")
    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 11, 11, 8).astype(np.float32)
    x[0, 1] = 0.0  # sample 0 missing year 1; sample 1 has all years
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    # sample 0's scores change when its year-1 image is filled in
    x2 = x.copy()
    x2[0, 1] = rng.rand(11, 11, 8)
    out2 = np.asarray(model.apply(variables, jnp.asarray(x2)))
    assert not np.allclose(out[0], out2[0])
    np.testing.assert_allclose(out[1], out2[1], atol=1e-6)


def test_years_have_independent_params():
    model, variables = _make()
    kernel = variables["params"]["year_models"]["conv1"]["conv"]["kernel"]
    assert kernel.shape[0] == 3  # stacked year axis
    assert not np.allclose(np.asarray(kernel[0]), np.asarray(kernel[1]))


def test_sample_mode_batch_composition_invariant():
    """In sample mode a crown's prediction is identical whether it is scored
    alone or alongside crowns that DO carry its missing year; in batch mode
    it is not (the reference's whole-batch skip quirk, reference
    src/models/year.py:27-31)."""
    rng = np.random.RandomState(3)
    a = rng.rand(3, 11, 11, 8).astype(np.float32)
    a[1] = 0.0  # year 1 missing for crown A
    b = rng.rand(3, 11, 11, 8).astype(np.float32)  # all years present

    for mode, invariant in (("sample", True), ("batch", False)):
        model, variables = _make(mask_mode=mode)
        alone = np.asarray(model.apply(variables, jnp.asarray(a[None])))[0]
        together = np.asarray(
            model.apply(variables, jnp.asarray(np.stack([a, b])))
        )[0]
        if invariant:
            np.testing.assert_allclose(alone, together, atol=1e-6)
        else:
            assert not np.allclose(alone, together, atol=1e-6)


def test_multistage_plumbs_mask_mode(m, config):
    """The config.yml default plumbs through MultiStage to every level model
    and survives a checkpoint round-trip."""
    import os
    import tempfile

    from deeptreeattention_tpu.models.multi_stage import MultiStage

    assert config.get("mask_mode", "batch") == "sample"
    assert m.mask_mode == "sample"
    assert all(mod.mask_mode == "sample" for mod in m.models)
    with tempfile.TemporaryDirectory() as d:
        path = m.save_checkpoint(os.path.join(d, "ck"))
        # a config that says "batch" does NOT override what the model
        # trained with
        cfg = dict(config)
        cfg["mask_mode"] = "batch"
        loaded = MultiStage.load_from_checkpoint(path, config=cfg)
        assert loaded.mask_mode == "sample"
        assert all(mod.mask_mode == "sample" for mod in loaded.models)
