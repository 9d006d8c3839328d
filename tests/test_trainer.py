"""End-to-end training-engine tests on synthetic data (CPU, 8 virtual
devices): loss decreases, interp baseline computed, checkpoint/resume works,
loss CSV written, eval + best-val tracking, image assembly, zarr export
(SURVEY.md §4 test pyramid, level 3)."""
import os

import numpy as np
import pytest

from sres_tpu.config import ConfigContext, cfg
from sres_tpu.data.inference_io import TSet
from sres_tpu.trainer import ModelTrainer
from sres_tpu.trainer.results import ResultsAccumulator


def synth_ctx(tmp_path, model="edsr", **over):
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    base = {
        "platform.root": str(tmp_path),
        "dataset.image_size": {"y": 192, "x": 144},
        "dataset.ntimes": 4,
        "dataset.nan_fraction": 0.1,
        "task.tile_size": {"x": 12, "y": 12},
        "task.batch_size": 4,
        "task.lr": 3e-3,
        "task.ttsplit": {"train": 0.75, "valid": 0.25, "test": 0.0},
        "model.nfeatures": 16,
        "model.nlayers": 2,
        "pipeline.precision": "f32",
    }
    base.update(over)
    return ConfigContext("sres", model=model, **base)


def test_train_loss_decreases_and_artifacts(tmp_path):
    with synth_ctx(tmp_path) as cc:
        trainer = ModelTrainer(cc, seed=0)
        trainer.train(nepochs=4, refresh_state=True, seed=0, interp_loss=True)
        recs = trainer.results_accum.results
        train_losses = [r.loss for r in recs if r.tset == TSet.Train]
        assert len(train_losses) >= 6
        assert train_losses[-1] < train_losses[0] * 0.9, \
            f"loss did not decrease: {train_losses[0]} -> {train_losses[-1]}"
        # interp baseline recorded
        assert all(np.isfinite(r.ref_loss) for r in recs)
        # checkpoints on disk
        ckpt_dir = f"{cfg().platform.results}/checkpoints"
        names = os.listdir(ckpt_dir)
        assert any(n.endswith(".train.ckpt") for n in names)
        assert any(n.endswith(".valid.ckpt") for n in names)
        # loss CSV written in the reference's format
        accum = ResultsAccumulator(cc)
        accum.load_results()
        assert len(accum.results) >= len(train_losses)
        x, y = accum.get_plot_data()
        assert len(x["model-train"]) > 0


def test_checkpoint_resume(tmp_path):
    with synth_ctx(tmp_path) as cc:
        t1 = ModelTrainer(cc, seed=0)
        t1.train(nepochs=3, refresh_state=True, seed=0)
        t1.checkpoint_manager.flush()
        p1 = np.asarray(
            __import__("jax").tree.leaves(t1.state.params)[0])
    with synth_ctx(tmp_path) as cc2:
        t2 = ModelTrainer(cc2, seed=1)
        meta = t2.checkpoint_manager.load_checkpoint(t2.state, TSet.Train, update_model=True)
        assert meta and meta["epoch"] >= 1
        p2 = np.asarray(__import__("jax").tree.leaves(meta["state"].params)[0])
        np.testing.assert_array_equal(p1, p2)


def test_evaluate_and_process_image(tmp_path):
    with synth_ctx(tmp_path) as cc:
        trainer = ModelTrainer(cc, seed=0)
        trainer.train(nepochs=2, refresh_state=True, seed=0)
        results, losses = trainer.evaluate(TSet.Validation, update_model=True)
        assert {"model", "interpolated"}.issubset(losses)
        assert results["model"].dims == ("tiles", "channels", "y", "x")
        assert results["model"].sizes["y"] == 48           # HR tile
        assert results["input"].sizes["y"] == 12           # LR tile
        images, im_losses = trainer.process_image(TSet.Validation, 0)
        img = images["SST"]["model"]
        # full region mosaic: grid 4x3 of 48px HR tiles
        assert img.shape == (192, 144)
        assert np.isnan(img.data).any()  # dropped land tiles are NaN-filled
        tgt = images["SST"]["target"]
        assert np.isfinite(tgt.data).sum() > 0


def test_multiscale_model_training(tmp_path):
    """LapSRN returns a pyramid — the multiscale loss path must train."""
    with synth_ctx(tmp_path, model="lapsrn", **{"model.nfeatures": 8}) as cc:
        trainer = ModelTrainer(cc, seed=0)
        out = trainer.train(nepochs=2, refresh_state=True, seed=0)
        assert np.isfinite(out["prediction"])


def test_to_zarr_roundtrip(tmp_path):
    from sres_tpu.util.zarrlite import read_zarr
    with synth_ctx(tmp_path) as cc:
        trainer = ModelTrainer(cc, seed=0)
        store = trainer.to_zarr(name="synthtest")
        data = read_zarr(store)
        assert data.shape == (4, 1, 192, 144)
        assert np.isnan(data).any() and np.isfinite(data).any()


def test_fresh_run_without_refresh_trains(tmp_path):
    """A fresh run (no checkpoint on disk, refresh_state=False) must train
    nepochs epochs — the reference adds epoch0 to nepochs on every non-refresh
    run (dual_trainer.py:290-293). Regression: this used to train 0 epochs."""
    with synth_ctx(tmp_path) as cc:
        trainer = ModelTrainer(cc, seed=0)
        trainer.train(nepochs=1, refresh_state=False, seed=0)
        recs = [r for r in trainer.results_accum.results if r.tset == TSet.Train]
        assert len(recs) == 3  # 3 train timeslices x 1 epoch


def test_aqt_int8_training_refused(tmp_path):
    """model.quantization: 'int8' (AQT) is serving-only — round 3 found its
    conv blocks gradients (frozen trunk), so ModelTrainer.train refuses it
    up front with a pointer to int8_fused/int8_full."""
    import pytest
    with synth_ctx(tmp_path, model="rcan-10-10-64",
                   **{"model.nblocks": 2, "model.quantization": "int8",
                      "model.lane_pack": 1}) as cc:
        trainer = ModelTrainer(cc, seed=0)
        with pytest.raises(ValueError, match="SERVING-ONLY"):
            trainer.train(nepochs=1, refresh_state=True, seed=0)
        # the serving path (evaluate) still works with the AQT forward
        trainer.dataset.load_timeslice(0)
        _, losses = trainer.evaluate(TSet.Validation, update_model=False,
                                     update_checkpoint=False)
        assert np.isfinite(losses["model"])
