"""MERRA2 OPeNDAP acquisition chain with a mocked opener (VERDICT r4 item
#5; reference contrib/merra2.py:27-210 + extract_merra2.py). No network:
the opener serves synthetic collection dicts shaped like the four GES-DISC
collections, and the tests verify URL construction, subsetting, the
20-channel order, the ITCWV sum + −30 min shift, grid interpolation, and
the 'fields' H5 layout end-to-end (incl. hand-off to the merra2_h5
yearly datapipe)."""
import numpy as np
import pytest

from sres_tpu.data.merra2_acquire import (CHANNELS, COLLECTIONS, acquire_day,
                                          extract_collections,
                                          get_merra_urls, interp_channels,
                                          target_grid)

NLAT, NLON = 12, 24


def _src_grid():
    # native-ish MERRA2 grid, coarser than the target to exercise interp
    return np.linspace(-90, 90, 9), np.linspace(-180, 179.375, 16)


def _mk_dataset(key):
    spec = COLLECTIONS[key]
    lat, lon = _src_grid()
    ntime = {"surface": 24, "uvtrh": 8, "h": 4, "tcwv": 24}[key]
    step = {"surface": 1, "uvtrh": 3, "h": 6, "tcwv": 1}[key]
    t0 = np.datetime64("2021-08-29T00:00")
    times = t0 + np.arange(ntime) * np.timedelta64(step, "h")
    if key == "tcwv":  # tavg collection: period-centered stamps at :30
        times = times + np.timedelta64(30, "m")
    levs = np.array([1000, 850, 700, 500, 250, 50], np.float64)
    rng = np.random.default_rng(abs(hash(key)) % 2**32)
    vars_ = {}
    for i, v in enumerate(spec["variables"]):
        if spec["levels"] is not None:
            vars_[v] = rng.normal(float(i), 1.0,
                                  (ntime, len(levs), len(lat), len(lon)))
        else:
            vars_[v] = rng.normal(float(i), 1.0, (ntime, len(lat), len(lon)))
    coords = dict(time=times, lat=lat, lon=lon)
    if spec["levels"] is not None:
        coords["lev"] = levs
    return {"vars": vars_, "coords": coords}


def _opener(url, variables):
    for key in COLLECTIONS:
        if COLLECTIONS[key]["tag"] in url:
            ds = _mk_dataset(key)
            assert set(variables) <= set(ds["vars"]), (url, variables)
            return ds
    raise AssertionError(f"unexpected url {url}")


def test_urls_match_reference_layout():
    # 2021-08-29 sits in the Jun-Sep 2021 reprocessing window, so the
    # inferred default stream equals the reference's hardcoded MERRA2_401
    urls = get_merra_urls("20210829")
    assert urls["surface"] == ("https://goldsmr4.gesdisc.eosdis.nasa.gov/opendap/"
                               "MERRA2/M2I1NXASM.5.12.4/2021/08/"
                               "MERRA2_401.inst1_2d_asm_Nx.20210829.nc4")
    assert urls["uvtrh"].startswith("https://goldsmr5")
    assert "M2I3NPASM" in urls["uvtrh"] and "inst3_3d_asm_Np" in urls["uvtrh"]
    assert "M2I6NPANA" in urls["h"] and "tavg1_2d_int_Nx" in urls["tcwv"]
    # HH suffix tolerated like the reference's YYYYMMDDHH timestamps
    assert get_merra_urls("2021082906") == urls


def test_stream_inference_and_override():
    """Decade-dependent GES-DISC streams: the reference hardcodes one stream
    and 404s outside its window; the default here follows the publication
    layout, with an explicit override for reprocessed sub-streams."""
    assert "MERRA2_100.inst1" in get_merra_urls("19850701")["surface"]
    assert "MERRA2_200.inst1" in get_merra_urls("19950315")["surface"]
    assert "MERRA2_300.inst1" in get_merra_urls("20050315")["surface"]
    assert "MERRA2_400.inst1" in get_merra_urls("20150315")["surface"]
    assert "MERRA2_400.inst1" in get_merra_urls("20210501")["surface"]
    assert "MERRA2_401.inst1" in get_merra_urls("20210715")["surface"]
    assert "MERRA2_401.inst1" in get_merra_urls(
        "20150315", stream="MERRA2_401")["surface"]


def test_extract_subsets_times_and_levels():
    colls = extract_collections(_opener, get_merra_urls("20210829"))
    assert colls["surface"]["vars"]["U10M"].shape[0] == 4   # hourly -> 6-hourly
    assert colls["uvtrh"]["vars"]["U"].shape[0] == 4        # 3-hourly -> 6-hourly
    assert list(colls["uvtrh"]["coords"]["lev"]) == [1000, 850, 500]
    assert list(colls["h"]["coords"]["lev"]) == [1000, 850, 500, 50]
    assert colls["h"]["vars"]["H"].shape[0] == 4            # native 6-hourly kept
    # 6-hourly instants line up across collections
    np.testing.assert_array_equal(colls["surface"]["coords"]["time"],
                                  colls["uvtrh"]["coords"]["time"])


def test_channel_table_matches_reference_order():
    """The 20-channel layout of interp_variables (merra2.py:180-201)."""
    expect = [("U10M", None), ("V10M", None), ("T2M", None), ("PS", None),
              ("SLP", None), ("U", 1000), ("V", 1000), ("H", 1000),
              ("T", 850), ("U", 850), ("V", 850), ("H", 850), ("RH", 850),
              ("T", 500), ("U", 500), ("V", 500), ("H", 500), ("RH", 500),
              ("H", 50), ("ITCWV", None)]
    assert [(v, l) for _, v, l in CHANNELS] == expect


def test_interp_channels_values_and_itcwv():
    colls = extract_collections(_opener, get_merra_urls("20210829"))
    fields, times = interp_channels(colls, nlat=NLAT, nlon=NLON)
    assert fields.shape == (4, 20, NLAT, NLON)
    assert fields.dtype == np.float32
    np.testing.assert_array_equal(times, colls["surface"]["coords"]["time"])

    lat, lon = target_grid(NLAT, NLON)
    src_lat, src_lon = _src_grid()

    def ref_bilinear(arr2d):
        """Independent bilinear reference on the rectilinear grid; targets
        beyond the source range are NaN (xarray .interp semantics the
        reference relies on — the lon=180 column lies past MERRA2's max
        179.375)."""
        out = np.empty((NLAT, NLON))
        for yi, yv in enumerate(lat):
            row = np.array([np.interp(yv, src_lat, arr2d[:, xi])
                            for xi in range(arr2d.shape[1])])
            out[yi] = np.interp(lon, src_lon, row)
        out[:, (lon < src_lon[0]) | (lon > src_lon[-1])] = np.nan
        out[(lat < src_lat[0]) | (lat > src_lat[-1]), :] = np.nan
        return out

    # a surface channel (U10M is channel 0)
    exp = ref_bilinear(colls["surface"]["vars"]["U10M"][0])
    np.testing.assert_allclose(fields[0, 0], exp, rtol=1e-6, equal_nan=True)
    # a pressure-level channel: H at 500 is channel 16
    h = colls["h"]
    li = list(h["coords"]["lev"]).index(500)
    exp = ref_bilinear(h["vars"]["H"][0, li])
    np.testing.assert_allclose(fields[0, 16], exp, rtol=1e-6, equal_nan=True)
    # ITCWV (channel 19): six-term DQVDT sum, then interp
    tc = colls["tcwv"]
    raw = sum(tc["vars"][v] for v in COLLECTIONS["tcwv"]["variables"])
    np.testing.assert_allclose(fields[0, 19], ref_bilinear(raw[0]), rtol=1e-6,
                               equal_nan=True)
    # exactly the out-of-range lon wrap column is NaN, everything else finite
    oob = (lon < src_lon[0]) | (lon > src_lon[-1])
    assert oob.sum() == 1 and oob[-1]
    assert np.isnan(fields[:, :, :, oob]).all()
    assert np.isfinite(fields[:, :, :, ~oob]).all()


def test_tavg_time_misalignment_raises():
    def bad_opener(url, variables):
        ds = _opener(url, variables)
        if "tavg1_2d_int_Nx" in url:
            ds["coords"]["time"] = ds["coords"]["time"] + np.timedelta64(1, "h")
        return ds

    with pytest.raises(ValueError, match="do not align"):
        fields, _ = interp_channels(
            extract_collections(bad_opener, get_merra_urls("20210829")),
            nlat=NLAT, nlon=NLON)


def test_acquire_day_writes_fields_h5(tmp_path):
    import h5py

    # yearly-file naming so the datapipe's ????.h5 glob discovers it
    out = str(tmp_path / "2021.h5")
    path = acquire_day("20210829", out, _opener, nlat=NLAT, nlon=NLON)
    with h5py.File(path, "r") as f:
        fields = np.asarray(f["fields"])
        t = np.asarray(f["time"])
    assert fields.shape == (4, 20, NLAT, NLON)
    # the lon=180 wrap column is NaN (past MERRA2's max lon, xarray
    # semantics); every in-range pixel is finite
    assert np.isfinite(fields[..., :-1]).all()
    assert np.isnan(fields[..., -1]).all()
    assert t.shape == (4,) and t[1] - t[0] == 6 * 3600

    # hand-off: the yearly-H5 datapipe reads a directory of such files
    from sres_tpu.data.merra2_h5 import MERRA2H5Datapipe
    pipe = MERRA2H5Datapipe(str(tmp_path), channels=list(range(20)),
                            num_steps=1, batch_size=1, shuffle=False)
    inp, tar = next(iter(pipe))
    assert inp.shape[-3:] == (20, NLAT, NLON)
    pipe.close()
