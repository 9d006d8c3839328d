"""MERRA-2 raw-collection → daily-cache preprocessor.

Rebuilds the reference's MERRA2 preprocessing pipeline (dead code there:
``sres/base/source/merra2/preprocess.py`` + ``sres/controller/rescale.py``
import the nonexistent ``merra2.model`` module and NVIDIA DALI) as a working
host-side pipeline over plain numpy:

  * ``MERRA2DataProcessor`` — reference ``preprocess.py:65-229``: per-day
    collection discovery from .format templates, per-variable rescale,
    merged daily caches (high + low res for the 'sres' format), constant
    caches, per-level stats accumulation, derived progress features,
  * ``Rescaler`` — reference ``rescale.py:24-186``: intensive/extensive
    aggregation (mean vs sum), time resample to ``data_timestep``, spatial
    coarsening by prod(model.downscale_factors) for the paired-resolution
    'sres' cache format, or x/y regrid at ``xres/yres`` for 'standard',
  * progress features — reference ``preprocess.py:237-267``
    (year/day progress + sin/cos, longitude-phased),
  * missing-value handling — reference ``rescale.py:148-152`` (fmissing →
    NaN) + ``ops.replace_nans`` (linear inpaint along x then y).

TPU-native notes: everything here is offline host code (numpy); outputs are
the NetCDF3/npz caches data/merra2.py streams into jit steps. The
reference's 'dali' cache (per-var .npy + header.nc) becomes one .npz
(util/io.py write_dataset_npz). The raw-time dim is renamed to 'tiles' in
caches — the reference aliases time as 'tiles' throughout its batch layer
(e.g. preprocess.py:261, merra2.py:113).
"""
from __future__ import annotations

import math
import os
from datetime import date
from enum import Enum
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import cfg
from ..trainer.stats import STATNAMES, StatsAccumulator
from ..util.dates import skw
from ..util.io import read_dataset_nc, write_dataset_nc
from ..util.larray import LArray
from ..util.logging import lgm
from .fmbatch import Dataset
from .merra2 import cache_filepath, stats_filepath

SEC_PER_DAY = 86400
_AVG_DAY_PER_YEAR = 365.24219


class QType(Enum):
    """Intensive quantities average on aggregation; extensive ones sum
    (reference: rescale.py:20-22)."""
    Intensive = "intensive"
    Extensive = "extensive"


def nnan(a: np.ndarray) -> int:
    return int(np.count_nonzero(np.isnan(a)))


def replace_nans(a: np.ndarray, axis: int = -1) -> np.ndarray:
    """Linear inpaint along ``axis`` then along the previous axis
    (reference: ops.py:141-147 replace_nans: interpolate_na over x then y,
    extrapolating at the edges)."""
    if nnan(a) == 0:
        return a
    a = _interp_nan_1d(a, axis)
    if nnan(a) > 0:
        a = _interp_nan_1d(a, axis - 1)
    assert nnan(a) == 0, "NaNs remaining after replace_nans()"
    return a


def _interp_nan_1d(a: np.ndarray, axis: int) -> np.ndarray:
    a = np.moveaxis(np.array(a, np.float64), axis, -1)
    flat = a.reshape(-1, a.shape[-1])
    xs = np.arange(a.shape[-1])
    for row in flat:
        bad = np.isnan(row)
        if bad.any() and (~bad).sum() >= 2:
            row[bad] = np.interp(xs[bad], xs[~bad], row[~bad])
    return np.moveaxis(flat.reshape(a.shape), -1, axis)


def _reduce_bins(data: np.ndarray, bins: np.ndarray, nbins: int,
                 qtype: QType) -> np.ndarray:
    """Group-reduce axis 0 by bin index (time resample, reference
    rescale.py:130-133: resampled.mean() or .sum())."""
    out = np.zeros((nbins,) + data.shape[1:], data.dtype)
    np.add.at(out, bins, data)
    if qtype == QType.Intensive:
        counts = np.bincount(bins, minlength=nbins).astype(data.dtype)
        out /= counts.reshape((nbins,) + (1,) * (data.ndim - 1))
    return out


class Rescaler:
    """Per-variable raw → cache-grid rescaling (reference rescale.py
    DataLoader, minus its norm-data coupling)."""

    def __init__(self) -> None:
        pp = cfg().preprocess
        self.nc_format = str(pp.get("nc_format", cfg().task.get("nc_format", "standard")))
        self.tstep_h = int(pp.data_timestep)
        self.dmap: Dict[str, str] = dict(pp.get("dims", {}) or {})
        self.levels = pp.get("levels")
        self.xres, self.yres = pp.get("xres"), pp.get("yres")
        self.xext, self.yext = pp.get("xext"), pp.get("yext")
        self.scale_factor = int(math.prod(cfg().model.downscale_factors))

    # -- raw cleanup (reference rescale.py:143-152) ---------------------------
    def process_raw(self, arr: LArray, global_attrs: Dict[str, Any],
                    isconst: bool) -> LArray:
        dims = [self.dmap.get(d, d) for d in arr.dims]
        coords = {self.dmap.get(k, k): v for k, v in arr.coords.items()}
        attrs = {**arr.attrs, **{k: v for k, v in global_attrs.items()
                                 if isinstance(v, (str, int, float))}}
        data = np.asarray(arr.data, np.float64)
        for key in ("fmissing_value", "missing_value", "fill_value"):
            if key in attrs:
                mv = float(attrs.pop(key))
                data = np.where(np.isclose(data, mv) | (np.abs(data) >= 1e14),
                                np.nan, data)
        if isconst and "time" in dims:
            ax = dims.index("time")
            data = np.take(data, 0, axis=ax)
            dims = [d for d in dims if d != "time"]
            coords.pop("time", None)
        data = replace_nans(data)
        order = [d for d in ("time", "z", "y", "x") if d in dims]
        out = LArray(data, dims, coords, attrs).transpose(*order)
        if self.levels is not None and "z" in out.dims:
            zc = np.asarray(out.coords["z"])
            idx = np.array([int(np.abs(zc - lv).argmin()) for lv in self.levels])
            out = out.isel(z=idx)
        return out

    # -- time resample (reference rescale.py:130-133) -------------------------
    def time_resample(self, arr: LArray, qtype: QType) -> LArray:
        if "time" not in arr.dims:
            return arr
        tsec = np.asarray(arr.coords["time"], np.float64)
        step = self.tstep_h * 3600
        # bin index = day-relative 6h slot + whole days since the first sample
        # (reference resample(tiles=tstep, offset='0h'): bins anchor at 00Z)
        bins = ((tsec % SEC_PER_DAY) // step).astype(np.int64) + \
            (tsec // SEC_PER_DAY - tsec[0] // SEC_PER_DAY).astype(np.int64) * (24 // self.tstep_h)
        nbins = int(bins.max()) + 1
        data = _reduce_bins(arr.data, bins, nbins, qtype)
        newt = np.array([tsec[bins == b][0] // step * step for b in range(nbins)],
                        np.float64)
        coords = dict(arr.coords)
        coords["time"] = newt
        return LArray(data, arr.dims, coords, arr.attrs)

    # -- spatial (reference rescale.py:126-141 upscale / 158-186 subsample) ---
    def coarsen(self, arr: LArray, qtype: QType) -> LArray:
        """Block-reduce x,y by scale_factor with boundary trim and min coord
        (reference rescale.py:136-139)."""
        out = arr
        red = np.mean if qtype == QType.Intensive else np.sum
        for dim in ("x", "y"):
            if dim not in out.dims:
                continue
            ax = out.axis(dim)
            n = out.shape[ax] // self.scale_factor * self.scale_factor
            data = np.take(out.data, np.arange(n), axis=ax)
            shape = list(data.shape)
            shape[ax:ax + 1] = [n // self.scale_factor, self.scale_factor]
            data = red(data.reshape(shape), axis=ax + 1)
            coords = dict(out.coords)
            if dim in coords:
                coords[dim] = np.asarray(coords[dim])[:n:self.scale_factor]
            out = LArray(data, out.dims, coords, out.attrs)
        return out

    def regrid(self, arr: LArray) -> LArray:
        """Linear interp onto the xres/yres grid (reference
        rescale.py:94-117,173-176); no-op without a resolution spec."""
        out = arr
        for dim, res, ext in (("x", self.xres, self.xext), ("y", self.yres, self.yext)):
            if res is None or dim not in out.dims:
                continue
            c0 = np.asarray(out.coords[dim], np.float64)
            lo, hi = (ext if ext is not None else (c0[0], c0[-1]))
            newc = np.arange(lo, hi + (res / 2 if dim == "y" else 0), res)
            out = _interp_axis(out, dim, newc)
        return out

    def rescale(self, arr: LArray, global_attrs: Dict[str, Any], qtype: QType,
                isconst: bool) -> Dict[str, LArray]:
        """→ {'high': ..., 'low': ...} for 'sres', {'high': ...} otherwise
        (reference rescale.py:154-157)."""
        v = self.process_raw(arr, global_attrs, isconst)
        if not isconst:
            v = self.time_resample(v, qtype)
        if self.nc_format == "sres":
            return {"high": v, "low": self.coarsen(v, qtype)}
        return {"high": self.regrid(v)}


def _interp_axis(arr: LArray, dim: str, newc: np.ndarray) -> LArray:
    ax = arr.axis(dim)
    oldc = np.asarray(arr.coords[dim], np.float64)
    moved = np.moveaxis(arr.data, ax, -1)
    flat = moved.reshape(-1, moved.shape[-1])
    out = np.empty((flat.shape[0], newc.size), flat.dtype)
    for i, row in enumerate(flat):
        out[i] = np.interp(newc, oldc, row)
    out = np.moveaxis(out.reshape(moved.shape[:-1] + (newc.size,)), -1, ax)
    coords = dict(arr.coords)
    coords[dim] = newc
    return LArray(out, arr.dims, coords, arr.attrs)


# ---------------------------------------------------------------------------
# Progress features (reference preprocess.py:237-267)
# ---------------------------------------------------------------------------

def get_year_progress(seconds_since_epoch: np.ndarray) -> np.ndarray:
    years = seconds_since_epoch / SEC_PER_DAY / np.float64(_AVG_DAY_PER_YEAR)
    return np.mod(years, 1.0).astype(np.float32)


def get_day_progress(seconds_since_epoch: np.ndarray,
                     longitude: np.ndarray) -> np.ndarray:
    day_progress_greenwich = np.mod(seconds_since_epoch, SEC_PER_DAY) / SEC_PER_DAY
    longitude_offsets = np.deg2rad(longitude) / (2 * np.pi)
    return np.mod(day_progress_greenwich[..., np.newaxis] + longitude_offsets,
                  1.0).astype(np.float32)


def featurize_progress(name: str, dims: Sequence[str], progress: np.ndarray,
                       coords: Dict[str, np.ndarray]) -> Dict[str, LArray]:
    assert len(dims) == progress.ndim, (
        f"feature {name}{tuple(dims)} vs progress{progress.shape}")
    phase = progress * (2 * np.pi)
    sub = {k: v for k, v in coords.items() if k in dims}
    return {name: LArray(progress, dims, sub),
            name + "_sin": LArray(np.sin(phase).astype(np.float32), dims, sub),
            name + "_cos": LArray(np.cos(phase).astype(np.float32), dims, sub)}


def add_derived_vars(dset: Dataset) -> None:
    """In-place progress features over the cache's 'tiles' (time) dim
    (reference preprocess.py:257-267)."""
    sample = next(a for a in dset.values() if "tiles" in a.dims and "x" in a.dims)
    tsec = np.asarray(sample.coords["tiles"], np.float64)
    lon = np.asarray(sample.coords["x"], np.float64)
    coords = {"tiles": tsec, "x": lon}
    pp = cfg().preprocess
    dset.update(featurize_progress(
        pp.get("year_progress", "year_progress"), ("tiles",),
        get_year_progress(tsec), coords))
    dset.update(featurize_progress(
        pp.get("day_progress", "day_progress"), ("tiles", "x"),
        get_day_progress(tsec, lon), coords))


# ---------------------------------------------------------------------------
# Processor (reference preprocess.py:65-229)
# ---------------------------------------------------------------------------

def read_raw_collection(filepath: str) -> Tuple[Dataset, Dict[str, Any]]:
    """Read a raw collection file: NetCDF3 via scipy or netCDF4(=HDF5) via
    h5py (the reference reads via xarray/netCDF4, preprocess.py:211)."""
    try:
        dset = read_dataset_nc(filepath)
        return dset, {}
    except Exception:
        pass
    import h5py
    out: Dataset = {}
    with h5py.File(filepath, "r") as f:
        gattrs = {k: (v.decode() if isinstance(v, bytes) else v)
                  for k, v in f.attrs.items() if np.isscalar(v) or isinstance(v, bytes)}
        dim_scales = {name for name, ds in f.items()
                      if isinstance(ds, h5py.Dataset) and ds.attrs.get("CLASS") == b"DIMENSION_SCALE"}
        coords = {name: np.array(f[name]) for name in dim_scales}
        for name, ds in f.items():
            if not isinstance(ds, h5py.Dataset) or name in dim_scales:
                continue
            dims = []
            for i in range(ds.ndim):
                keys = list(ds.dims[i].keys()) if len(ds.dims[i]) else []
                dims.append(list(ds.dims[i].values())[0].name.strip("/") if keys
                            else f"dim{i}")
            vattrs = {k: (v.decode() if isinstance(v, bytes) else
                          (float(v) if np.isscalar(v) and not isinstance(v, str) else v))
                      for k, v in ds.attrs.items()
                      if np.isscalar(v) or isinstance(v, bytes)}
            out[name] = LArray(np.array(ds), dims,
                               {d: coords[d] for d in dims if d in coords}, vattrs)
    return out, gattrs


class MERRA2DataProcessor:
    """Daily raw collections → merged per-day caches + per-level stats
    (reference preprocess.py:65-229)."""

    def __init__(self) -> None:
        pp = cfg().preprocess
        self.nc_format = str(pp.get("nc_format", cfg().task.get("nc_format", "standard")))
        self.vres_list = ["high", "low"] if self.nc_format == "sres" else ["high"]
        self.vars: Dict[str, List[str]] = {k: list(v) for k, v in pp.vars.items()}
        self.var_file_template: str = cfg().dataset.dataset_files
        self.const_file_template: str = cfg().dataset.get(
            "constant_file", cfg().platform.get("constant_file", ""))
        self.stats = {vres: StatsAccumulator(vres) for vres in self.vres_list}
        self.rescaler = Rescaler()

    @classmethod
    def get_qtype(cls, vname: str) -> QType:
        extensive = cfg().preprocess.get("extensive", []) or []
        return QType.Extensive if vname in extensive else QType.Intensive

    # -- discovery (reference preprocess.py:113-125) --------------------------
    def get_daily_files(self, d: date) -> Tuple[Dict[str, Tuple[str, List[str]]],
                                                Dict[str, Tuple[str, List[str]]]]:
        dsroot: str = cfg().dataset.dataset_root
        dset_files: Dict[str, Tuple[str, List[str]]] = {}
        const_files: Dict[str, Tuple[str, List[str]]] = {}
        for collection, vlist in self.vars.items():
            isconst = collection.startswith("const")
            if isconst:
                fpath = self.const_file_template.format(collection=collection)
            else:
                fpath = self.var_file_template.format(collection=collection, **skw(d))
            file_path = f"{dsroot}/{fpath}"
            if os.path.exists(file_path):
                (const_files if isconst else dset_files)[collection] = (file_path, vlist)
        return dset_files, const_files

    def needs_update(self, dynamic: bool, d: Optional[date], reprocess: bool) -> bool:
        """reference preprocess.py:166-174."""
        if reprocess:
            return True
        for vres in self.vres_list:
            if not os.path.exists(cache_filepath(dynamic, d, vres)):
                return True
        lgm().log(f" ** Skipping {d}: processed files exist")
        return False

    # -- per-day processing (reference preprocess.py:176-229) -----------------
    def load_collection(self, collection: str, file_path: str,
                        dvnames: List[str], d: Optional[date],
                        isconst: bool = False) -> Dict[str, Dataset]:
        raw, gattrs = read_raw_collection(file_path)
        gattrs = dict(collection=collection, **gattrs)
        mvars: Dict[str, Dataset] = {}
        for vname in dvnames:
            if vname not in raw:
                lgm().log(f" !! {collection}: variable {vname} missing in {file_path}")
                continue
            qtype = self.get_qtype(vname)
            ssvars = self.rescaler.rescale(raw[vname], gattrs, qtype, isconst)
            for vres, svar in ssvars.items():
                zax = svar.dims.index("z") if "z" in svar.dims else None
                self.stats[vres].add_entry(
                    vname, svar.data, istemporal="time" in svar.dims,
                    level_axis=zax)
                assert nnan(svar.data) == 0, (
                    f"{nnan(svar.data)} nodata values in {vname} for {d}")
                mvars.setdefault(vres, {})[vname] = svar
        return mvars

    @staticmethod
    def _to_tiles(dset: Dataset) -> Dataset:
        """Rename the time dim to 'tiles' for the cache (see module
        docstring on the reference's time/tiles aliasing)."""
        out: Dataset = {}
        for vn, a in dset.items():
            if "time" in a.dims:
                dims = ["tiles" if d == "time" else d for d in a.dims]
                coords = {("tiles" if k == "time" else k): v
                          for k, v in a.coords.items()}
                out[vn] = LArray(a.data, dims, coords, a.attrs)
            else:
                out[vn] = a
        return out

    def write_daily_files(self, filepath: str, dset: Dataset) -> None:
        """reference preprocess.py:127-136 (one merged file per day+vres;
        float32 payloads, coords as f8)."""
        as32 = {vn: a.copy(data=np.asarray(a.data, np.float32))
                for vn, a in dset.items()}
        write_dataset_nc(filepath, as32)
        lgm().log(f" >> Saved {len(dset)} vars to {filepath}")

    def process_day(self, d: date, reprocess: bool = False) -> int:
        """Returns the number of cache files written."""
        written = 0
        if not self.needs_update(True, d, reprocess):
            return written
        dset_files, const_files = self.get_daily_files(d)
        if not dset_files:
            lgm().log(f"No collections found for date {d}", display=True)
            return written
        vres_dsets: Dict[str, Dataset] = {v: {} for v in self.vres_list}
        for collection, (file_path, dvars) in dset_files.items():
            for vres, dvals in self.load_collection(
                    collection, file_path, dvars, d).items():
                vres_dsets[vres].update(dvals)
        for vres, dset in vres_dsets.items():
            if not dset:
                continue
            dset = self._to_tiles(dset)
            add_derived_vars(dset)
            self.write_daily_files(cache_filepath(True, d, vres), dset)
            written += 1
        if const_files and self.needs_update(False, None, reprocess):
            cdsets: Dict[str, Dataset] = {v: {} for v in self.vres_list}
            for collection, (file_path, dvars) in const_files.items():
                for vres, dvals in self.load_collection(
                        collection, file_path, dvars, d, isconst=True).items():
                    cdsets[vres].update(dvals)
            for vres, dset in cdsets.items():
                if dset:
                    self.write_daily_files(cache_filepath(False, vres=vres),
                                           self._to_tiles(dset))
                    written += 1
        return written

    def process_dates(self, dates: Sequence[date], reprocess: bool = False) -> int:
        written = 0
        for d in dates:
            written += self.process_day(d, reprocess=reprocess)
        self.save_stats()
        return written

    def save_stats(self) -> None:
        """reference preprocess.py:87-97."""
        version = cfg().preprocess.dataset_version
        for vres in self.vres_list:
            for statname in STATNAMES:
                fpath = stats_filepath(version, statname, vres)
                if os.path.exists(fpath):
                    lgm().log(f" -->> stats file exists, skipping: {fpath}")
                    continue
                self.stats[vres].save(statname, fpath)
