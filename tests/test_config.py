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
