"""Reproducibility: identical seeds → identical training trajectories
(seeded data shuffles + xyflip + deterministic compiled steps replace the
reference's process-global random/torch.manual_seed, SURVEY.md §5.2)."""
import numpy as np

from sres_tpu.config import ConfigContext
from sres_tpu.data.inference_io import TSet
from sres_tpu.data.tiles import TileIterator
from sres_tpu.trainer import ModelTrainer


def _ctx(tmp_path, tag):
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": str(tmp_path / tag),
        "dataset.image_size": {"y": 144, "x": 96},
        "dataset.ntimes": 3, "dataset.nan_fraction": 0.1,
        "task.tile_size": {"x": 12, "y": 12}, "task.batch_size": 4,
        "task.ttsplit": {"train": 1.0, "valid": 0.0, "test": 0.0},
        "model.nfeatures": 8, "model.nlayers": 1,
        "pipeline.precision": "f32",
    }
    return ConfigContext("sres", model="edsr", **over)


def _run(tmp_path, tag, seed):
    with _ctx(tmp_path, tag) as cc:
        t = ModelTrainer(cc, seed=seed)
        t.train(nepochs=3, refresh_state=True, seed=seed)
        return [r.loss for r in t.results_accum.results if r.tset == TSet.Train]


def test_same_seed_same_trajectory(tmp_path):
    a = _run(tmp_path, "a", seed=7)
    b = _run(tmp_path, "b", seed=7)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_different_seed_different_trajectory(tmp_path):
    a = _run(tmp_path, "c", seed=7)
    b = _run(tmp_path, "d", seed=8)
    assert any(abs(x - y) > 1e-9 for x, y in zip(a, b))


def test_tile_iterator_loss_registry():
    """register/accumulate per-epoch loss API (reference: tiles.py:22-28)."""
    import random
    from sres_tpu.config import ConfigContext, cfg
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    with ConfigContext("sres", model="edsr"):
        it = TileIterator.get_iterator(ntiles=10, randomize=True,
                                       rng=random.Random(0))
        batches = list(iter(it))
        assert [b["start"] for b in batches] == [0]  # 10 tiles < batch_size 36
        it.register_loss("model", 1.0)
        it.register_loss("model", 3.0)
        assert it.accumulate_loss("model") == 2.0
        assert np.isnan(it.accumulate_loss("model"))  # cleared after accumulate
