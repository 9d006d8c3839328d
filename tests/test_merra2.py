"""MERRA2 subsystem: preprocessing → daily caches + per-level stats →
loader → FMBatch → MERRA2Dataset (rebuild of the reference's dead legacy
pipeline: sres/base/source/merra2/{loader,preprocess}.py,
sres/data/merra2.py, sres/controller/rescale.py — see data/merra2.py
docstring for the revival notes). Raw collections are synthesized in both
container formats the pipeline reads: NetCDF3 (scipy) and netCDF4/HDF5
(h5py with dimension scales)."""
from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pytest

from sres_tpu.config import ConfigContext, cfg

LON = np.linspace(-180.0, -172.5, 16)
LAT = np.linspace(-30.0, -24.5, 12)
LEV = np.array([700.0, 850.0, 925.0, 1000.0])
DAY0 = datetime(2000, 1, 1, tzinfo=timezone.utc)
EPOCH0 = int(DAY0.timestamp())

VARS3D = ["T", "QV", "U", "V"]
VARS2D = ["SLP", "T2M", "PRECLS"]


def _field3d(vi: int, tsec: np.ndarray) -> np.ndarray:
    """Deterministic synthetic (time, lev, lat, lon) field."""
    t = (tsec[:, None, None, None] - EPOCH0) / 3600.0
    lev = LEV[None, :, None, None]
    lat = LAT[None, None, :, None]
    lon = LON[None, None, None, :]
    return (200.0 + 20.0 * vi + 0.25 * t + 0.05 * lev
            + 0.3 * lat + 0.1 * lon).astype(np.float64)


def _field2d(vi: int, tsec: np.ndarray) -> np.ndarray:
    t = (tsec[:, None, None] - EPOCH0) / 3600.0
    lat = LAT[None, :, None]
    lon = LON[None, None, :]
    return (50.0 + 10.0 * vi + 0.5 * t + 0.2 * lat + 0.05 * lon).astype(np.float64)


def _write_nc3(path: str, coords: dict, varspecs: dict) -> None:
    from scipy.io import netcdf_file
    os.makedirs(os.path.dirname(path), exist_ok=True)
    f = netcdf_file(path, "w")
    for cn, cv in coords.items():
        f.createDimension(cn, cv.size)
        v = f.createVariable(cn, "f8", (cn,))
        v[:] = cv
    for vn, (dims, data) in varspecs.items():
        v = f.createVariable(vn, "f8", tuple(dims))
        v[:] = data
    f.close()


def _write_h5(path: str, coords: dict, varspecs: dict) -> None:
    import h5py
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with h5py.File(path, "w") as f:
        for cn, cv in coords.items():
            ds = f.create_dataset(cn, data=cv)
            ds.make_scale(cn)
        for vn, (dims, data) in varspecs.items():
            ds = f.create_dataset(vn, data=data)
            for i, d in enumerate(dims):
                ds.dims[i].attach_scale(f[d])
            ds.attrs["fmissing_value"] = 1.0e15


def _build_raw(root: str, ndays: int = 2) -> None:
    for iday in range(ndays):
        day0 = EPOCH0 + iday * 86400
        # 3-hourly 3D collection as netCDF4/HDF5 (exercises the h5py reader)
        t3 = np.array([day0 + 3600 * h for h in range(0, 24, 3)], np.float64)
        _write_h5(
            f"{root}/Y2000/M01/MERRA2.inst3_3d_asm_Np.200001{iday + 1:02d}.nc4",
            dict(time=t3, lev=LEV, lat=LAT, lon=LON),
            {v: (("time", "lev", "lat", "lon"), _field3d(i, t3))
             for i, v in enumerate(VARS3D)})
        # hourly 2D collection as NetCDF3 (exercises the scipy reader)
        t1 = np.array([day0 + 3600 * h for h in range(24)], np.float64)
        _write_nc3(
            f"{root}/Y2000/M01/MERRA2.inst1_2d_asm_Nx.200001{iday + 1:02d}.nc4",
            dict(time=t1, lat=LAT, lon=LON),
            {v: (("time", "lat", "lon"), _field2d(i, t1))
             for i, v in enumerate(VARS2D)})
    # constants
    tc = np.array([float(EPOCH0)])
    frland = np.clip(0.5 + 0.4 * np.sin(LAT)[None, :, None]
                     + 0.1 * np.cos(LON)[None, None, :], 0, 1)
    _write_nc3(f"{root}/MERRA2.const_2d_ctm_Nx.00000000.nc4",
               dict(time=tc, lat=LAT, lon=LON),
               dict(FRLAND=(("time", "lat", "lon"), frland)))


TEST_LEVELS = [850.0, 925.0, 1000.0]


def _mk_ctx(overrides: dict) -> ConfigContext:
    return ConfigContext("sres", platform="local", task="merra2-sr",
                         model="rcan-10-20-64", dataset="merra2",
                         preprocess="merra2-sres", **overrides)


@pytest.fixture(scope="module")
def m2env(tmp_path_factory):
    """Raw collections + one full preprocessing pass, shared by the module
    (context activation is per test, below: the conftest autouse fixture
    clears the global ConfigContext around every test)."""
    tmp = tmp_path_factory.mktemp("merra2")
    raw = str(tmp / "raw")
    processed = str(tmp / "processed")
    _build_raw(raw)
    overrides = {
        "dataset.dataset_root": raw,
        "platform.processed": processed,
        "preprocess.levels": TEST_LEVELS,
        "preprocess.vars": {"inst3_3d_asm_Np": VARS3D,
                            "inst1_2d_asm_Nx": VARS2D,
                            "const_2d_ctm_Nx": ["FRLAND"]},
        "preprocess.extensive": ["PRECLS"],
        "task.levels": TEST_LEVELS,
    }
    ConfigContext.deactivate()
    with _mk_ctx(overrides):
        from sres_tpu.data.merra2_preprocess import MERRA2DataProcessor
        from sres_tpu.util.dates import date_list
        proc = MERRA2DataProcessor()
        written = proc.process_dates(date_list(datetime(2000, 1, 1), 2))
    ConfigContext.deactivate()
    return dict(overrides=overrides, raw=raw, processed=processed,
                written=written)


@pytest.fixture()
def m2(m2env):
    """Per-test activated context over the shared preprocessed tree."""
    with _mk_ctx(m2env["overrides"]):
        yield m2env


def _read_cache(d: datetime, vres: str = "high"):
    from sres_tpu.data.merra2 import cache_filepath
    from sres_tpu.util.io import read_dataset_nc
    return read_dataset_nc(cache_filepath(True, d, vres))


def test_preprocess_writes_both_resolutions_and_const(m2):
    # 2 days × (high, low) + const × (high, low) = 6 files
    assert m2["written"] == 6
    from sres_tpu.data.merra2 import cache_filepath
    for vres in ("high", "low"):
        for day in (1, 2):
            assert os.path.exists(cache_filepath(True, datetime(2000, 1, day), vres))
        assert os.path.exists(cache_filepath(False, vres=vres))
    # sres format low-res caches carry the .us{scale} tag (io/loader.py:41-48)
    assert cache_filepath(True, DAY0, "low").endswith(".us4.nc")


def test_time_resample_mean_and_extensive_sum(m2):
    cache = _read_cache(datetime(2000, 1, 1))
    # 6h cache: 4 steps/day
    assert cache["SLP"].sizes["tiles"] == 4
    t1 = np.array([EPOCH0 + 3600 * h for h in range(24)], np.float64)
    raw_slp = _field2d(0, t1)
    # intensive → mean of each 6-hour bin (reference rescale.py:130-133)
    np.testing.assert_allclose(cache["SLP"].data[1], raw_slp[6:12].mean(axis=0),
                               rtol=1e-6)
    # extensive (PRECLS) → sum
    raw_pr = _field2d(2, t1)
    np.testing.assert_allclose(cache["PRECLS"].data[2], raw_pr[12:18].sum(axis=0),
                               rtol=1e-6)
    # 3-hourly 3D var → mean of 2 samples per bin, levels subset to TEST_LEVELS
    t3 = np.array([EPOCH0 + 3600 * h for h in range(0, 24, 3)], np.float64)
    raw_t = _field3d(0, t3)[:, 1:, :, :]   # levels 850,925,1000 of LEV
    assert cache["T"].sizes["z"] == 3
    np.testing.assert_allclose(cache["T"].data[0], raw_t[0:2].mean(axis=0),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cache["T"].coords["z"]), TEST_LEVELS)


def test_low_res_is_block_reduced_high(m2):
    hi = _read_cache(datetime(2000, 1, 1), "high")
    lo = _read_cache(datetime(2000, 1, 1), "low")
    scale = 4  # prod(rcan downscale_factors [2,2])
    assert lo["T"].sizes["x"] == hi["T"].sizes["x"] // scale
    blocks = hi["T"].data.reshape(4, 3, 12 // scale, scale, 16 // scale, scale)
    np.testing.assert_allclose(lo["T"].data, blocks.mean(axis=(3, 5)), rtol=1e-6)
    # coarsened coords take the block-min (coord_func="min", rescale.py:139)
    np.testing.assert_allclose(np.asarray(lo["T"].coords["x"]), LON[::scale])


def test_progress_features_match_closed_form(m2):
    from sres_tpu.data.merra2_preprocess import SEC_PER_DAY, _AVG_DAY_PER_YEAR
    cache = _read_cache(datetime(2000, 1, 2))
    tsec = np.asarray(cache["T"].coords["tiles"], np.float64)
    yp = np.mod(tsec / SEC_PER_DAY / _AVG_DAY_PER_YEAR, 1.0)
    np.testing.assert_allclose(cache["year_progress"].data, yp, rtol=1e-6)
    np.testing.assert_allclose(cache["year_progress_sin"].data,
                               np.sin(yp * 2 * np.pi), atol=1e-6)
    dp = np.mod((tsec[:, None] % SEC_PER_DAY) / SEC_PER_DAY
                + np.deg2rad(LON)[None, :] / (2 * np.pi), 1.0)
    assert cache["day_progress"].dims == ("tiles", "x")
    np.testing.assert_allclose(cache["day_progress"].data, dp, atol=1e-6)


def test_stats_are_per_level_and_weighted(m2):
    from sres_tpu.data.merra2 import Merra2DataLoader
    loader = Merra2DataLoader("high")
    mu = loader.load_stats("mean")
    sd = loader.load_stats("std")
    # 3-D var stats keep the z axis (reference stats.py:52-56)
    assert mu["temperature"].shape == (3,)
    assert sd["temperature"].shape == (3,)
    assert mu["mean_sea_level_pressure"].shape == ()
    # weighted mean over both days == mean over the concatenated caches
    both = np.concatenate([_read_cache(datetime(2000, 1, d))["T"].data
                           for d in (1, 2)], axis=0)
    np.testing.assert_allclose(mu["temperature"], both.mean(axis=(0, 2, 3)),
                               rtol=1e-6)


def test_norm_data_merges_predef_progress_stats(m2):
    from sres_tpu.data.merra2 import Merra2DataLoader
    norms = Merra2DataLoader("high").load_merra2_norm_data()
    assert set(norms) == {"mean_by_level", "stddev_by_level",
                          "diffs_stddev_by_level"}
    assert float(norms["stddev_by_level"]["day_progress_sin"]) == 0.707
    assert "temperature" in norms["mean_by_level"]


def test_loader_renames_and_subsets(m2):
    from sres_tpu.data.merra2 import Merra2DataLoader
    dset = Merra2DataLoader("high").load_dataset(datetime(2000, 1, 1))
    assert "temperature" in dset and "T" not in dset
    # PRECLS is cached but not a model input/forcing/target → dropped
    assert "PRECLS" not in dset
    assert "year_progress_sin" in dset     # forcing survives the subset
    const = Merra2DataLoader("high").load_const_dataset()
    assert "land_sea_mask" in const and "tiles" not in const["land_sea_mask"].dims


def test_dataset_extraction_shapes_and_leadtimes(m2):
    from sres_tpu.data.merra2 import MERRA2Dataset
    ds = MERRA2Dataset(train_dates=[datetime(2000, 1, 1)])
    assert len(ds) == 4  # 24h / 6h offsets
    inputs, base, targets = ds[0]
    # channels: 4 z-vars × 3 levels + SLP + T2M + land_sea_mask + 4 forcings
    assert inputs.dims == ("channels", "tiles", "y", "x")
    assert inputs.shape == (4 * 3 + 2 + 1 + 4, 2, 12, 16)
    assert base.dims == ("channels", "y", "x")
    assert base.shape == (2 * 3, 12, 16)          # targets at t0, per level
    assert targets.shape == (2 * 3, 2, 12, 16)    # lead times 6h, 12h
    chans = list(inputs.coords["channels"])
    assert "temperature~0" in chans and "day_progress_sin" in chans
    assert "land_sea_mask" in chans

    # lead-time alignment: window steps 0..3, zero at step1 → targets 2,3
    cache = _read_cache(datetime(2000, 1, 1))
    from sres_tpu.data.merra2 import Merra2DataLoader
    loader = Merra2DataLoader("high")
    mu = loader.load_stats("mean")
    sd = loader.load_stats("std")
    want = (cache["T"].data[2:4, 0] - mu["temperature"][0]) / sd["temperature"][0]
    got = targets.data[list(targets.coords["channels"]).index("temperature~0")]
    np.testing.assert_allclose(got, want, rtol=2e-5)

    # base = normalized target vars at the last input step (step 1)
    want_b = (cache["T"].data[1, 0] - mu["temperature"][0]) / sd["temperature"][0]
    got_b = base.data[list(base.coords["channels"]).index("temperature~0")]
    np.testing.assert_allclose(got_b, want_b, rtol=2e-5)


def test_dataset_iterates_across_day_boundary(m2):
    from sres_tpu.data.merra2 import MERRA2Dataset
    ds = MERRA2Dataset(train_dates=[datetime(2000, 1, 1)])
    items = list(iter(ds))
    assert len(items) == 4
    # offset 3: window = steps 3..6 of the 2-day batch → targets are steps
    # 5,6 = day-2 steps 1,2
    targets = items[3][2]
    cache2 = _read_cache(datetime(2000, 1, 2))
    from sres_tpu.data.merra2 import Merra2DataLoader
    loader = Merra2DataLoader("high")
    mu, sd = loader.load_stats("mean"), loader.load_stats("std")
    want = (cache2["T"].data[1:3, 0] - mu["temperature"][0]) / sd["temperature"][0]
    got = targets.data[list(targets.coords["channels"]).index("temperature~0")]
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_input_iterator_triple_and_cycling(m2):
    from sres_tpu.data.merra2 import MERRA2InputIterator
    from datetime import datetime as _dt
    it = iter(MERRA2InputIterator(train_dates=[_dt(2000, 1, 1)]))
    inputs, targets, forcings = next(it)
    # inputs EXCLUDE the forcing features in the triple API
    assert "day_progress_sin" not in list(inputs.coords["channels"])
    assert inputs.shape[0] == 4 * 3 + 2 + 1          # 15 input channels
    assert targets.shape == (2 * 3, 2, 12, 16)
    # forcings are provided at the target lead times
    assert forcings.shape == (4, 2, 12, 16)
    assert sorted(forcings.coords["channels"]) == [
        "day_progress_cos", "day_progress_sin",
        "year_progress_cos", "year_progress_sin"]
    # cycling: 4 offsets then wraps to item 0 without StopIteration
    for _ in range(4):
        next(it)
    assert it.ds.i == 1


def test_forcing_target_overlap_raises(m2):
    from sres_tpu.data.merra2 import MERRA2Dataset
    task = cfg().task
    saved = task.get("forcing_variables")
    task["forcing_variables"] = ["temperature"]
    try:
        ds = MERRA2Dataset(train_dates=[datetime(2000, 1, 1)])
        with pytest.raises(ValueError, match="should not overlap"):
            ds[0]
    finally:
        task["forcing_variables"] = saved


def test_roi_subset_origin_extent(m2):
    from sres_tpu.data.merra2 import Merra2DataLoader
    task = cfg().task
    try:
        task["origin"] = {"train": {"x": float(LON[4]), "y": float(LAT[2])}}
        task["extent"] = {"x": float(LON[12]), "y": float(LAT[10])}
        task["tile_size"] = {"x": 2, "y": 2}
        hi = Merra2DataLoader("high").load_dataset(datetime(2000, 1, 1))
        assert hi["temperature"].sizes == dict(tiles=4, z=3, y=8, x=8)
        np.testing.assert_allclose(np.asarray(hi["temperature"].coords["x"]),
                                   LON[4:12])
        lo = Merra2DataLoader("low").load_dataset(datetime(2000, 1, 1))
        assert lo["temperature"].sizes["x"] == 2  # origin + tile_size
    finally:
        for k in ("origin", "extent", "tile_size"):
            task.raw().pop(k, None)


def test_npz_packed_dataset_roundtrip(tmp_path):
    from sres_tpu.util.io import read_dataset_npz, write_dataset_npz
    from sres_tpu.util.larray import LArray
    arrays = {
        "a": LArray(np.arange(24, dtype=np.float32).reshape(2, 3, 4),
                    ["tiles", "y", "x"],
                    {"tiles": np.array([0.0, 6.0]), "x": np.arange(4.0)},
                    {"units": "K"}),
        "c": LArray(np.ones((3, 4), np.float32), ["y", "x"]),
    }
    path = str(tmp_path / "day.npz")
    write_dataset_npz(path, arrays)
    back = read_dataset_npz(path)
    assert set(back) == {"a", "c"}
    np.testing.assert_array_equal(back["a"].data, arrays["a"].data)
    assert back["a"].dims == ("tiles", "y", "x")
    np.testing.assert_array_equal(back["a"].coords["tiles"], [0.0, 6.0])
    assert back["a"].attrs["units"] == "K"


def test_stats_accumulator_vector_save_roundtrip(tmp_path):
    from sres_tpu.trainer.stats import StatsAccumulator
    from sres_tpu.util.io import read_dataset_nc
    acc = StatsAccumulator("high")
    data = np.random.default_rng(0).normal(size=(4, 3, 8, 8))
    acc.add_entry("T", data, istemporal=True, level_axis=1)
    acc.add_entry("SLP", data[:, 0], istemporal=True)
    path = str(tmp_path / "stats" / "mean")
    acc.save("mean", path)
    back = read_dataset_nc(path)
    np.testing.assert_allclose(np.squeeze(back["T"].data),
                               data.mean(axis=(0, 2, 3)), rtol=1e-6)
    assert np.squeeze(back["SLP"].data).shape == ()
