"""Data-layer tests: tiling, NaN filtering, six norm schemes + denorm
round-trip, xyflip, SWOT binary reader on a generated fixture, batch
iteration, and inference NetCDF round-trip (SURVEY.md §4)."""
import numpy as np
import pytest

from sres_tpu.config import ConfigContext, cfg
from sres_tpu.data.batch import BatchDataset, xyflip
from sres_tpu.data.norm import denorm, normalize_batch
from sres_tpu.data.swot import assemble_hemispheres, invert_template, mds2d
from sres_tpu.data.tiles import TileGrid, TileIterator
from sres_tpu.util.larray import LArray


def synth_ctx(tmp_path, **over):
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over.setdefault("platform.root", str(tmp_path))
    over.setdefault("dataset.image_size", {"y": 576, "x": 384})
    over.setdefault("dataset.ntimes", 3)
    return ConfigContext("sres", model="edsr", **over)


# ---------------------------------------------------------------- norm schemes
@pytest.mark.parametrize("scheme", ["lnorm", "lscale"])
def test_local_norm_denorm_roundtrip(scheme):
    rng = np.random.default_rng(0)
    batch = rng.normal(10.0, 3.0, (4, 2, 8, 8)).astype(np.float32)
    normed, stats = normalize_batch(batch, scheme, (0, 4))
    if scheme == "lnorm":
        assert abs(normed.mean()) < 1e-5 and abs(normed.std() - 1) < 1e-4
    else:
        assert normed.min() >= 0 and normed.max() <= 1.0 + 1e-6
    back = denorm(normed, stats)
    np.testing.assert_allclose(back, batch, rtol=1e-4, atol=1e-4)


def test_tnorm_uses_sidecar_tile_slice():
    rng = np.random.default_rng(1)
    batch = rng.normal(size=(3, 1, 4, 4)).astype(np.float32)
    sidecar = {"SST": np.stack([np.arange(10, dtype=np.float64),          # mean
                                np.ones(10) * 4.0,                         # var
                                np.full(10, 50.0), np.full(10, -50.0)], axis=1)}
    normed, stats = normalize_batch(batch, "tnorm", (2, 5), sidecar, None, ["SST"])
    expect = (batch[:, 0] - np.array([2, 3, 4]).reshape(-1, 1, 1)) / 2.0
    np.testing.assert_allclose(normed[:, 0], expect, rtol=1e-5)
    np.testing.assert_allclose(denorm(normed, stats), batch, rtol=1e-4, atol=1e-5)


def test_gnorm_gscale():
    batch = np.ones((2, 1, 4, 4), np.float32) * 7.0
    gstats = {"SST": np.array([5.0, 4.0, 9.0, 1.0])}  # mean, var, max, min
    n1, _ = normalize_batch(batch, "gnorm", (0, 2), None, gstats, ["SST"])
    np.testing.assert_allclose(n1, (7 - 5) / 2.0)
    n2, _ = normalize_batch(batch, "gscale", (0, 2), None, gstats, ["SST"])
    np.testing.assert_allclose(n2, (7 - 1) / 8.0)


# ------------------------------------------------------------------ xyflip
def test_xyflip_deterministic_and_invertible():
    data = np.arange(2 * 1 * 4 * 4, dtype=np.float32).reshape(2, 1, 4, 4)
    arr = LArray(data, ["tiles", "channels", "y", "x"])
    rng = np.random.default_rng(5)
    out = xyflip(arr, rng, enabled=True)
    assert 0 <= out.attrs["xyflip"] < 8
    assert out.data.shape == data.shape
    off = xyflip(arr, rng, enabled=False)
    assert off.attrs["xyflip"] == 0
    np.testing.assert_array_equal(off.data, data)


# ---------------------------------------------------------------- mds2d / swot
def test_mds2d_shapes_and_assembly():
    nx = 8
    d = np.arange(13 * nx * nx, dtype=np.float32)
    east, west = mds2d(d)
    assert east.shape == (3 * nx, 2 * nx)
    assert west.shape == (2 * nx, 3 * nx)
    panel = assemble_hemispheres(east, west)
    assert panel.shape == (3 * nx, 4 * nx)


def test_invert_template():
    assert invert_template("SST.000*.shrunk", "SST.0007.shrunk") == 7
    assert invert_template("SST.000*.shrunk", "SSS.0007.shrunk") is None


def test_swot_loader_end_to_end(tmp_path):
    from sres_tpu.data.swot import SWOTRawDataLoader
    from sres_tpu.data.synthetic import write_swot_fixture
    root = str(tmp_path / "swotdata")
    write_swot_fixture(root, nx=32, ntimes=3)
    ConfigContext.set_defaults(platform="local", task="SST-tiles-48",
                               dataset="swot", pipeline="sres")
    over = {"platform.root": str(tmp_path), "dataset.dataset_root": root,
            "task.tile_size": {"x": 8, "y": 8}}
    with ConfigContext("sres", model="edsr", **over):
        loader = SWOTRawDataLoader(cfg().task)
        idxs = loader.get_dset_time_indices()
        assert idxs == [0, 1, 2]
        ts = loader.load_timeslice(0)
        # region (96, 128), HR tile 32x32 → 3x4 grid = 12 candidate tiles
        assert ts.dims == ("tiles", "channels", "y", "x")
        assert ts.shape[2:] == (32, 32)
        assert np.isfinite(ts.data).all()
        batch = loader.select_batch((0, 4))
        assert batch.shape[0] <= 4 and "mean" in batch.attrs


# --------------------------------------------------- lazy sidecar norm stats
@pytest.mark.parametrize("scheme", ["tnorm", "gscale"])
def test_lazy_sidecar_compute_does_not_move_timeslice(tmp_path, scheme):
    """Regression (round-1 verdict): computing the norm-stats sidecar lazily
    from inside select_batch iterated timeslices via load_timeslice, leaving
    the current-timeslice pointer on the LAST dataset timeslice — every batch
    of the epoch after the first silently trained on wrong tiles. Batches on
    a fresh (lazily-computed) sidecar must equal batches with a pre-existing
    cache."""
    from sres_tpu.data.synthetic import SyntheticDataLoader

    over = {"task.norm": scheme, "task.batch_size": 4,
            "task.tile_size": {"x": 12, "y": 12}, "dataset.nan_fraction": 0.0,
            "dataset.image_size": {"y": 144, "x": 144}, "dataset.ntimes": 3}
    with synth_ctx(tmp_path, **over):
        # pass 1: no sidecar on disk → select_batch triggers the lazy compute
        fresh = SyntheticDataLoader(cfg().task)
        assert fresh.sidecar.load() is None
        fresh.load_timeslice(0)
        b0_fresh = fresh.select_batch((0, 4))
        assert fresh.time_index == 0, "sidecar compute moved the timeslice pointer"
        b1_fresh = fresh.select_batch((4, 8))

        # pass 2: sidecar cached on disk → no lazy compute, known-good path
        warm = SyntheticDataLoader(cfg().task)
        assert warm.sidecar.load() is not None
        warm.load_timeslice(0)
        b0_warm = warm.select_batch((0, 4))
        b1_warm = warm.select_batch((4, 8))

        np.testing.assert_array_equal(b0_fresh.data, b0_warm.data)
        np.testing.assert_array_equal(b1_fresh.data, b1_warm.data)


def test_tnorm_trainer_path_values(tmp_path):
    """Value-level check of the tnorm path: batches coming out of the loader
    equal hand-computed (tiles - sidecar_mean) / sidecar_std for the right
    tile slice of the right timeslice."""
    from sres_tpu.data.synthetic import SyntheticDataLoader

    over = {"task.norm": "tnorm", "task.tile_size": {"x": 12, "y": 12},
            "dataset.nan_fraction": 0.0,
            "dataset.image_size": {"y": 144, "x": 144}, "dataset.ntimes": 3}
    with synth_ctx(tmp_path, **over):
        loader = SyntheticDataLoader(cfg().task)
        # hand-compute the sidecar: mean-of-means / mean-of-vars over time
        slices = [loader._load_tiles(t).data for t in loader.get_dset_time_indices()]
        means = np.stack([s.mean(axis=(2, 3)) for s in slices]).mean(axis=0)  # (ntiles, C)
        vars_ = np.stack([s.var(axis=(2, 3)) for s in slices]).mean(axis=0)
        raw_t1 = loader.load_timeslice(1).data
        batch = loader.select_batch((2, 6))
        expect = (raw_t1[2:6] - means[2:6, :, None, None]) / np.sqrt(vars_[2:6, :, None, None])
        np.testing.assert_allclose(batch.data, expect, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------ tiles + dataset
def test_tilegrid_geometry(tmp_path):
    with synth_ctx(tmp_path):
        grid = TileGrid()
        assert grid.get_full_tile_size() == dict(x=192, y=192)
        ishape = dict(c=1, y=576, x=384)
        assert grid.get_grid_shape(image_shape=ishape) == dict(x=2, y=3)
        assert grid.get_active_region(image_shape=ishape)["y"] == (0, 576)


def test_synthetic_batchdataset(tmp_path):
    over = {"task.batch_size": 4, "task.tile_size": {"x": 24, "y": 24},
            "dataset.nan_fraction": 0.1}
    with synth_ctx(tmp_path, **over):
        ds = BatchDataset(cfg().task, seed=0)
        times = ds.get_batch_time_coords()
        assert sorted(times) == [0, 1, 2]
        ts = ds.load_timeslice(times[0])
        assert ts.sizes["y"] == 96 and ts.shape[0] >= 1
        it = TileIterator.get_iterator(ntiles=ts.shape[0], randomize=True)
        nseen = 0
        for ctile in it:
            batch = ds.get_batch_array(ctile, times[0])
            if batch is None:
                break
            assert batch.data.shape[1:] == (1, 96, 96)
            assert np.isfinite(batch.data).all()
            nseen += batch.shape[0]
        assert nseen == ts.shape[0]


def test_inference_io_roundtrip(tmp_path):
    from sres_tpu.data.inference_io import (ResultStructure, load_inference_results,
                                            save_inference_results)
    with synth_ctx(tmp_path):
        rng = np.random.default_rng(0)
        results = {
            "input": LArray(rng.normal(size=(4, 48, 48)).astype(np.float32), ["tiles", "y", "x"]),
            "target": LArray(rng.normal(size=(4, 192, 192)).astype(np.float32), ["tiles", "y", "x"]),
            "model": LArray(rng.normal(size=(4, 192, 192)).astype(np.float32), ["tiles", "y", "x"]),
        }
        losses = dict(model=0.125, interpolated=0.25)
        save_inference_results("SST", ResultStructure.Tiles, results, 3, losses)
        loaded, lls = load_inference_results("SST", ResultStructure.Tiles, 3)
        assert lls == losses
        np.testing.assert_allclose(loaded["target"].data, results["target"].data)
        assert loaded["input"].dims == ("tiles", "y", "x")


# ------------------------------------------------------------------- FMBatch
def test_fmbatch_date_window_merging(tmp_path):
    """FMBatch merges days_per_batch daily datasets along 'tiles', splits
    constants (no-tiles vars + task.constants time-means), and serves
    batch_steps windows (reference: sres/base/source/batch.py:100-113,
    209-239)."""
    from datetime import datetime

    from sres_tpu.data.fmbatch import (BatchType, FMBatch,
                                       merge_temporal_batch)

    steps_per_day = 4  # hours_per_step 6

    class Loader:
        def load_const_dataset(self, **kw):
            return {"oro": LArray(np.full((6, 6), 2.0, np.float32), ["y", "x"])}

        def load_dataset(self, day, vres="high"):
            base = float(day.day)
            dyn = np.arange(steps_per_day, dtype=np.float32).reshape(-1, 1, 1)
            return {
                "sst": LArray(np.broadcast_to(base + dyn, (steps_per_day, 6, 6)).copy(),
                              ["tiles", "y", "x"]),
                "mask": LArray(np.full((steps_per_day, 6, 6), base, np.float32),
                               ["tiles", "y", "x"]),
                "lat": LArray(np.zeros((6,), np.float32), ["y"]),
            }

    with synth_ctx(tmp_path, **{
            "task.hours_per_step": 6, "task.nsteps_input": 2,
            "task.train_steps": [1, 2], "task.constants": ["mask"]}):
        fmb = FMBatch(BatchType.Training, Loader())
        # batch_steps = 2 input + 2 target = 4; days/batch = 1 + ceil(3/4) = 2
        assert fmb.batch_steps == 4 and fmb.days_per_batch == 2
        fmb.load(datetime(2020, 1, 5))
        b = fmb.current_batch
        # dynamics concatenated over both days
        assert b["sst"].shape == (2 * steps_per_day, 6, 6)
        assert b["sst"].data[0, 0, 0] == 5.0 and b["sst"].data[steps_per_day, 0, 0] == 6.0
        # 'mask' is in task.constants -> time-averaged, tiles dim dropped
        assert b["mask"].dims == ("y", "x")
        np.testing.assert_allclose(b["mask"].data, 5.0)  # day-5 slice mean
        # no-tiles var and loader constants preserved
        assert b["lat"].dims == ("y",) and b["oro"].data[0, 0] == 2.0
        # offset window
        win = fmb.get_train_data(3)
        assert win["sst"].shape == (4, 6, 6) and win["sst"].data[0, 0, 0] == 8.0
        ts = fmb.get_time_slice(1)
        assert ts["sst"].dims == ("y", "x") and ts["sst"].data[0, 0] == 6.0
        # feature stacking: trailing sorted-name features dim
        feat = FMBatch.to_feature_array({"sst": win["sst"],
                                         "ssh": win["sst"].copy()})
        assert feat.dims[-1] == "features"
        assert list(feat.coords["features"]) == ["ssh", "sst"]
        # merge precedence: dynamics override constants on collision
        clash = merge_temporal_batch(
            [Loader().load_dataset(datetime(2020, 1, 1))],
            {"sst": LArray(np.zeros((6, 6), np.float32), ["y", "x"])})
        assert "tiles" in clash["sst"].dims


def test_fmbatch_time_dim_var_dropped(tmp_path):
    """A variable with a 'time' dim but no 'tiles' dim is dropped, never
    promoted to a constant (reference: source/batch.py:106 drops time-dim
    vars before promotion; round-2 advisor finding)."""
    from sres_tpu.data.fmbatch import merge_temporal_batch

    sl = {
        "sst": LArray(np.ones((2, 4, 4), np.float32), ["tiles", "y", "x"]),
        "clim": LArray(np.ones((3, 4), np.float32), ["time", "y"]),
    }
    with synth_ctx(tmp_path):
        merged = merge_temporal_batch([sl], {})
    assert "clim" not in merged
    assert merged["sst"].dims == ("tiles", "y", "x")
