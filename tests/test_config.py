"""Config compose / interpolation / override tests
(behavioral parity with reference sres/base/util/config.py)."""
from sres_tpu.config import ConfigContext, cfg, compose


def test_compose_groups_and_overrides():
    c = compose("sres", {
        "platform": "local", "task": "SST-tiles-48", "model": "rcan-10-20-64",
        "dataset": "swot_20-20e", "task.nepochs": 7,
    })
    assert c.model.name == "rcan"
    assert c.model.nblocks == 20
    assert c.task.nepochs == 7
    assert c.task.batch_size == 36
    assert c.task.tile_size["x"] == 48
    assert c.pipeline.precision == "bf16"


def test_relative_interpolation():
    c = compose("sres", {"platform": "local", "task": "SST-tiles-48",
                         "model": "edsr", "dataset": "swot_20-20e"})
    assert c.platform.results == "./.sres_data/results"
    assert c.platform.cache.endswith("/cache")


def test_runtime_template_mutation():
    """The SWOT loader writes varname/index into cfg().dataset and then reads
    dataset_files — interpolation must resolve lazily (swot/raw.py:126-135)."""
    c = compose("sres", {"platform": "local", "task": "SST-tiles-48",
                         "model": "edsr", "dataset": "swot_20-20e"})
    c.dataset["varname"] = "SST"
    c.dataset["index"] = 42
    assert c.dataset.dataset_files == "raw/SST/SST.00042.shrunk"


def test_context_manager_cid_and_activation():
    ConfigContext.set_defaults(platform="local", task="SST-tiles-48",
                               dataset="swot_20-20e", pipeline="sres")
    with ConfigContext("sres", model="rcan-10-20-64", **{"task.nepochs": 3}) as cc:
        assert cfg().task.nepochs == 3
        assert cfg().task.training_version == "sres-rcan-10-20-64-swot_20-20e-SST-tiles-48"
        assert cfg().task.name == "SST-tiles-48"
        assert cc.cid == cfg().task.training_version
    assert ConfigContext.cfg is None


def test_missing_group_raises():
    import pytest
    with pytest.raises(ValueError):
        compose("sres", {"platform": "local"})


def test_cfg2meta_and_coord_helpers(tmp_path):
    from sres_tpu.config import ConfigContext, cfg2meta
    from sres_tpu.util.larray import (LArray, cdelta, closest_value,
                                      get_coord_bounds, get_data_coords,
                                      get_data_indices, index_of_value)
    import numpy as np

    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    with ConfigContext("sres", model="edsr", **{"platform.root": str(tmp_path)}):
        class Meta:
            batch_size = 0
            lr = 0.0
        # on_missing='skip' copies only attributes that already exist
        # (reference semantics: config.py:109-125)
        m = cfg2meta("task", Meta(), on_missing="skip")
        assert m.batch_size == 36 and float(m.lr) == 1e-4
        assert not hasattr(m, "__nonexistent__")
        m2 = cfg2meta("task", Meta(), on_missing="ignore")
        assert m2.nepochs == cfg().task.nepochs   # ignore copies everything
        assert cfg2meta("nonexistent", Meta()) is None

    coord = np.array([0.0, 0.5, 1.0, 1.5])
    assert index_of_value(coord, 0.6) == 1
    assert closest_value(coord, 1.2) == 1.0
    assert get_coord_bounds(coord) == (0.0, 2.0)
    arr = LArray(np.zeros((4, 3), np.float32), ["y", "x"],
                 coords=dict(y=coord, x=np.array([10.0, 20.0, 30.0])))
    assert get_data_coords(arr, {"y": 0.7, "x": 24.0}) == {"y": 0.5, "x": 20.0}
    assert get_data_indices(arr, {"y": 0.7, "x": 24.0}) == {"y": 1, "x": 1}
    assert cdelta(arr) == {"y": 0.5, "x": 10.0}


def test_pipeline_device_forces_backend():
    """pipeline.device / SRES_PLATFORM forces the JAX backend at context
    activation — required because an installed platform plugin can
    force-register an accelerator and override the JAX_PLATFORMS env var
    (CLAUDE.md). Idempotent when the backend is already initialized to the
    requested platform; a conflicting late request is ignored with a log,
    never an exception."""
    import jax
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    with ConfigContext("sres", model="edsr", **{"pipeline.device": "cpu"}):
        assert jax.default_backend() == "cpu"
    # conflicting request after backend init: no exception, no backend
    # change (JAX accepts the config update but the backend is already
    # materialized)
    with ConfigContext("sres", model="edsr", **{"pipeline.device": "tpu"}):
        assert jax.default_backend() == "cpu"
    jax.config.update("jax_platforms", "cpu")   # restore for later tests
