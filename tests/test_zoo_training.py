"""Every architecture must train end-to-end through the real trainer
(synthetic data, tiny hyperparameters): catches batch-stats threading,
multiscale losses, transposed-conv geometry, attention shape constraints."""
import numpy as np
import pytest

from sres_tpu.config import ConfigContext
from sres_tpu.trainer import ModelTrainer

# (model cfg name, overrides) — tile sizes respect each arch's constraints:
# UNet/MSCNN need 2^depth divisibility, ESRT needs H*W % 4 == 0.
ZOO = [
    ("rcan-10-10-64", {"model.nlayers": 1, "model.nblocks": 2, "model.nfeatures": 16}),
    ("vdsr", {"model.nlayers": 3, "model.nfeatures": 16}),
    ("dbpn", {"model.depth": 2, "model.nfeatures": 16, "model.nprojectionfeatures": 8}),
    ("latticenet", {"model.nfeatures": 16, "model.ndiff": 4}),
    ("srdn", {"model.nlayers": 1,
              "model.nfeatures": {"hidden": 16, "upscale": 16},
              "model.kernel_size": {"features": 3, "hidden": 3, "output": 5}}),
    ("unet", {"model.nlayers": 2, "model.nfeatures": 8}),
    ("mscnn", {"model.nlayers": 2, "model.nfeatures": 8}),
    ("esrt", {"model.nlayers": 1, "model.nfeatures": 16}),
]


@pytest.mark.parametrize("model,mover", ZOO, ids=[m for m, _ in ZOO])
def test_zoo_trains(tmp_path, model, mover):
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": str(tmp_path),
        "dataset.image_size": {"y": 96, "x": 96},
        "dataset.ntimes": 2,
        "dataset.nan_fraction": 0.0,
        "task.tile_size": {"x": 12, "y": 12},
        "task.batch_size": 4,
        "task.ttsplit": {"train": 1.0, "valid": 0.0, "test": 0.0},
        "pipeline.precision": "f32",
    }
    over.update(mover)
    with ConfigContext("sres", model=model, **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        out = trainer.train(nepochs=2, refresh_state=True, seed=0)
        assert np.isfinite(out["prediction"]), f"{model} produced non-finite loss"


def test_swinir_trains(tmp_path):
    """Transformer SR config (BASELINE #4): windowed attention with shifted
    windows on window-divisible tiles."""
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": str(tmp_path),
        "dataset.image_size": {"y": 128, "x": 64},
        "dataset.ntimes": 2,
        "dataset.nan_fraction": 0.0,
        "task.tile_size": {"x": 16, "y": 16},
        "task.batch_size": 2,
        "task.ttsplit": {"train": 1.0, "valid": 0.0, "test": 0.0},
        "model.nlayers": 1, "model.nblocks": 2, "model.nfeatures": 32,
        "model.window_size": 8, "model.num_heads": 2, "model.fused_attention": True,
        "pipeline.precision": "f32",
    }
    with ConfigContext("sres", model="swinir", **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        out = trainer.train(nepochs=2, refresh_state=True, seed=0)
        assert np.isfinite(out["prediction"])
