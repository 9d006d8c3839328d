"""MERRA2 OPeNDAP acquisition chain — raw GES-DISC collections → the
20-channel FourCastNet-style H5 input (VERDICT r4 item #5; closes the last
partial SURVEY row 43).

Reference: /root/reference/sres/base/source/merra2/contrib/merra2.py:27-210
(get_merra_urls / extract_vars_from_url / interp_variables / var_to_h5) and
contrib/extract_merra2.py:1-27 (the driver). The reference hand-writes one
download/interp/assign block per variable over pydap+xarray; here the whole
channel layout is ONE declarative table (``CHANNELS``), the pipeline is
numpy-native (xarray is not a dependency of this framework — LArray and
util/io replace it), and network access happens only through an injectable
``opener``:

    opener(url, variables) -> {"vars": {name: ndarray}, "coords": {...}}

where each var is (T, Y, X) or (T, L, Y, X) and coords carries
``time`` (datetime64), ``lat``, ``lon`` and (for 3D collections) ``lev``.
The real opener wraps pydap + NASA Earthdata credentials and is
import-gated (pydap is not baked into this image); tests mock it
(tests/test_merra2_acquire.py).

Output: an H5 file with ``fields`` of shape (T, 20, nlat, nlon) — exactly
one day of the yearly layout :mod:`sres_tpu.data.merra2_h5` consumes, so
``acquire_day`` over a year + concat feeds the datapipe directly.
"""
from __future__ import annotations

import datetime as _dt
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Collection layout (reference merra2.py:27-37): four GES-DISC OPeNDAP
# collections; MERRA2_401 is the current production stream.
GOLDSMR4 = "https://goldsmr4.gesdisc.eosdis.nasa.gov/opendap/MERRA2/"
GOLDSMR5 = "https://goldsmr5.gesdisc.eosdis.nasa.gov/opendap/MERRA2/"

COLLECTIONS: Dict[str, Dict] = {
    "surface": dict(server=GOLDSMR4, coll="M2I1NXASM.5.12.4",
                    tag="inst1_2d_asm_Nx",
                    variables=("U10M", "V10M", "T2M", "PS", "SLP"),
                    # hourly file -> 6-hourly analysis times
                    time_isel=tuple(range(0, 24, 6)), levels=None),
    "uvtrh": dict(server=GOLDSMR5, coll="M2I3NPASM.5.12.4",
                  tag="inst3_3d_asm_Np",
                  variables=("U", "V", "T", "RH"),
                  # 3-hourly file -> 6-hourly
                  time_isel=tuple(range(0, 8, 2)), levels=(1000, 850, 500)),
    "h": dict(server=GOLDSMR5, coll="M2I6NPANA.5.12.4",
              tag="inst6_3d_ana_Np",
              variables=("H",),
              time_isel=None, levels=(1000, 850, 500, 50)),
    "tcwv": dict(server=GOLDSMR4, coll="M2T1NXINT.5.12.4",
                 tag="tavg1_2d_int_Nx",
                 variables=("DQVDT_ANA", "DQVDT_CHM", "DQVDT_DYN",
                            "DQVDT_MST", "DQVDT_PHY", "DQVDT_TRB"),
                 time_isel=tuple(range(0, 24, 6)), levels=None),
}

# The 20-channel output layout (reference interp_variables: merra2.py:180-201).
# Each row: (collection key, variable, pressure level or None).
# 'ITCWV' is the six-term DQVDT sum (total column water vapor tendency).
CHANNELS: List[Tuple[str, str, Optional[int]]] = [
    ("surface", "U10M", None), ("surface", "V10M", None),
    ("surface", "T2M", None), ("surface", "PS", None),
    ("surface", "SLP", None),
    ("uvtrh", "U", 1000), ("uvtrh", "V", 1000), ("h", "H", 1000),
    ("uvtrh", "T", 850), ("uvtrh", "U", 850), ("uvtrh", "V", 850),
    ("h", "H", 850), ("uvtrh", "RH", 850),
    ("uvtrh", "T", 500), ("uvtrh", "U", 500), ("uvtrh", "V", 500),
    ("h", "H", 500), ("uvtrh", "RH", 500),
    ("h", "H", 50),
    ("tcwv", "ITCWV", None),
]


def target_grid(nlat: int = 720, nlon: int = 1440) -> Tuple[np.ndarray, np.ndarray]:
    """The FourCastNet-style lat/lon target grid (reference merra2.py:9-12)."""
    return np.linspace(-90, 90, nlat), np.linspace(-180, 180, nlon)


def stream_for_date(dtime: _dt.datetime) -> str:
    """GES-DISC production stream for a date. MERRA2 files are named by the
    decade-dependent processing stream (100: 1980-91, 200: 1992-2000,
    300: 2001-10, 400: 2011+); the reference hardcodes one stream and so
    404s outside its own window. The Jun–Sep 2021 files were reprocessed
    and republished as the MERRA2_401 sub-stream (the reference's hardcoded
    choice — its target dates live there); other reprocessed months can be
    selected with an explicit ``stream=`` override."""
    y = dtime.year
    if y <= 1991:
        return "MERRA2_100"
    if y <= 2000:
        return "MERRA2_200"
    if y <= 2010:
        return "MERRA2_300"
    if _dt.datetime(2021, 6, 1) <= dtime <= _dt.datetime(2021, 9, 30):
        return "MERRA2_401"
    return "MERRA2_400"


def get_merra_urls(timestamp: str, stream: Optional[str] = None) -> Dict[str, str]:
    """{collection key: OPeNDAP url} for a YYYYMMDD[HH] timestamp
    (reference get_merra_urls: merra2.py:27-37, which returns a 4-tuple).
    ``stream=None`` infers the decade stream (:func:`stream_for_date`)."""
    dtime = _dt.datetime.strptime(timestamp[:8], "%Y%m%d")
    if stream is None:
        stream = stream_for_date(dtime)
    ym, ymd = dtime.strftime("%Y/%m/"), dtime.strftime("%Y%m%d")
    return {key: f"{c['server']}{c['coll']}/{ym}{stream}.{c['tag']}.{ymd}.nc4"
            for key, c in COLLECTIONS.items()}


def open_url_pydap(username: str, password: str) -> Callable:
    """The real network opener: pydap + Earthdata login, returning the plain
    numpy structure above. Import-gated — pydap is absent in this image; any
    other callable with the same contract (local nc4 files via h5py, mocks)
    plugs into the same chain."""
    try:
        from pydap.cas.urs import setup_session
        from pydap.client import open_url
    except ImportError as e:  # pragma: no cover - depends on env
        raise ImportError(
            "merra2 acquisition needs pydap for the network path "
            "(pip install pydap). The extraction/interp/h5 chain itself is "
            "network-free — pass a custom opener.") from e

    session: Dict[str, object] = {}

    def opener(url: str, variables) -> Dict:  # pragma: no cover - network
        if "s" not in session:  # one CAS session for the whole day
            session["s"] = setup_session(username, password, check_url=url)
        data = open_url(url, session=session["s"])
        coords = {}
        for cn in ("lat", "lon", "lev", "time"):
            if cn in data:
                coords[cn] = np.asarray(data[cn][:].data)
        if "time" in coords:
            # MERRA2 OPeNDAP time = minutes since start-of-day (per file)
            day = _dt.datetime.strptime(url.rsplit(".", 2)[-2], "%Y%m%d")
            coords["time"] = (np.datetime64(day)
                              + coords["time"].astype("timedelta64[m]"))
        out = {}
        for v in variables:
            out[v] = np.asarray(data[v][:].data, np.float64)
        return {"vars": out, "coords": coords}

    return opener


def _sel_levels(ds: Dict, levels) -> Dict:
    lev = np.asarray(ds["coords"]["lev"], np.float64)
    idx = [int(np.argmin(np.abs(lev - float(l)))) for l in levels]
    ds = {"vars": {k: v[:, idx] for k, v in ds["vars"].items()},
          "coords": dict(ds["coords"], lev=lev[idx])}
    return ds


def extract_collections(opener: Callable, urls: Dict[str, str]) -> Dict[str, Dict]:
    """Fetch + subset each collection (reference extract_vars_from_url:
    merra2.py:40-82): select variables, 6-hourly times, and the pressure
    levels the channel table needs."""
    out: Dict[str, Dict] = {}
    for key, spec in COLLECTIONS.items():
        ds = opener(urls[key], spec["variables"])
        if spec["time_isel"] is not None:
            ti = list(spec["time_isel"])
            ds = {"vars": {k: v[ti] for k, v in ds["vars"].items()},
                  "coords": dict(ds["coords"],
                                 time=np.asarray(ds["coords"]["time"])[ti])}
        if spec["levels"] is not None:
            ds = _sel_levels(ds, spec["levels"])
        out[key] = ds
    return out


def _interp_axis(arr: np.ndarray, src: np.ndarray, dst: np.ndarray,
                 axis: int) -> np.ndarray:
    """Linear interpolation along one axis of a rectilinear grid. Targets
    OUTSIDE the source range fill NaN, matching xarray's ``.interp`` default
    the reference relies on (merra2.py:86-201): e.g. the target lon=180
    column lies past MERRA2's max lon 179.375, so the reference-produced H5
    carries a NaN final-longitude column — clamping there would silently
    diverge from reference-produced files. MERRA2's lat grid covers both
    poles, so only the lon wrap column is out of range in practice."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    pos = np.interp(dst, src, np.arange(len(src), dtype=np.float64))
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, len(src) - 2)
    frac = pos - i0
    a0 = np.take(arr, i0, axis=axis)
    a1 = np.take(arr, i0 + 1, axis=axis)
    shape = [1] * arr.ndim
    shape[axis] = len(dst)
    f = frac.reshape(shape)
    out = a0 * (1.0 - f) + a1 * f
    oob = (dst < src[0]) | (dst > src[-1])
    if oob.any():
        out = np.where(oob.reshape(shape), np.nan, out)
    return out


def interp_channels(collections: Dict[str, Dict],
                    nlat: int = 720, nlon: int = 1440
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """CHANNELS table → (T, 20, nlat, nlon) stack on the target grid, in
    output-channel order (reference interp_variables: merra2.py:86-201),
    plus the shared time coordinate. The ITCWV channel is the six-term
    DQVDT sum with the reference's −30 min time-stamp shift (tavg files are
    period-centered; the shift aligns them with the instantaneous
    collections)."""
    lat, lon = target_grid(nlat, nlon)
    tc = collections["tcwv"]
    itcwv = sum(tc["vars"][v] for v in COLLECTIONS["tcwv"]["variables"])
    times = np.asarray(collections["surface"]["coords"]["time"])
    tc_times = (np.asarray(tc["coords"]["time"])
                - np.timedelta64(30, "m"))
    if not np.array_equal(tc_times, times):
        raise ValueError(
            f"tavg times (shifted −30 min: {tc_times}) do not align with "
            f"the instantaneous analysis times ({times})")

    chans = []
    for key, var, lev in CHANNELS:
        if var == "ITCWV":
            arr = itcwv                         # (T, Y, X)
        else:
            ds = collections[key]
            arr = ds["vars"][var]
            if lev is not None:
                levc = np.asarray(ds["coords"]["lev"], np.float64)
                arr = arr[:, int(np.argmin(np.abs(levc - lev)))]
        src_lat = np.asarray(collections[key]["coords"]["lat"])
        src_lon = np.asarray(collections[key]["coords"]["lon"])
        arr = _interp_axis(arr, src_lat, lat, axis=1)
        arr = _interp_axis(arr, src_lon, lon, axis=2)
        chans.append(arr)
    return np.stack(chans, axis=1).astype(np.float32), times


def fields_to_h5(fields: np.ndarray, times: np.ndarray,
                 output_filename: str) -> str:
    """Write the reference's layout: dataset ``fields`` (T, 20, lat, lon)
    (reference var_to_h5: merra2.py:204-210 — its xarray to_netcdf writes an
    HDF5 file with the same single variable). Time stamps ride along as an
    int64 epoch-seconds dataset so day files can be safely concatenated
    into the yearly files sres_tpu/data/merra2_h5.py consumes."""
    import h5py

    with h5py.File(output_filename, "w") as f:
        f.create_dataset("fields", data=np.asarray(fields, np.float32))
        f.create_dataset("time", data=np.asarray(
            times, "datetime64[s]").astype(np.int64))
    return output_filename


def acquire_day(timestamp: str, output_filename: str, opener: Callable,
                nlat: int = 720, nlon: int = 1440,
                stream: Optional[str] = None) -> str:
    """One day end-to-end: urls → extract → interp → H5 (the reference's
    extract_merra2.py driver body). ``stream=None`` infers the
    decade-dependent GES-DISC stream from the date."""
    urls = get_merra_urls(timestamp, stream=stream)
    colls = extract_collections(opener, urls)
    fields, times = interp_channels(colls, nlat=nlat, nlon=nlon)
    return fields_to_h5(fields, times, output_filename)
