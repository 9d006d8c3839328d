"""MERRA-2 daily-cache source + forecast-style training dataset.

Rebuilds the reference's legacy MERRA2 subsystem — **working**. In the
reference tree this code is dead: ``sres/data/merra2.py:15`` and
``sres/base/source/merra2/loader.py`` import ``sres.base.source.merra2.model``,
which does not exist, and the loader path further depends on NVIDIA DALI.
This module re-derives the same capability TPU-natively:

  * path scheme + cache layout — reference ``sres/base/io/loader.py:33-48``
    (data_suffix/path_suffix) and ``sres/base/source/merra2/loader.py:23-33``
    (cache_filepath), ``:75-76`` (stats_filepath),
  * ``Merra2DataLoader`` — reference ``loader.py:20-139`` (rename maps, level
    selection, train-origin ROI, norm-stat loading merged with the predefined
    progress-feature stats),
  * ``MERRA2Dataset`` — reference ``sres/data/merra2.py:34-172`` (date/offset
    indexing over FMBatch windows, input/target lead-time extraction,
    by-level normalization, channel stacking). The DALI ``MERRA2NCDatapipe``
    is replaced by plain iteration: batches are host numpy arrays handed to
    JAX at the jit boundary (data/input_pipeline.py backends).

Deviations from the (dead) reference, each required for the code to run:
  * ``subset_datavars`` keeps forcing/target variables and the derived
    progress features — the reference's version (loader.py:54-56) drops any
    variable not in ``task.input_variables``, which would discard the
    forcing features its own extract path then selects
    (sres/data/merra2.py:148).
  * lead-time arithmetic is integer step indexing instead of pandas
    timedelta coordinate relabeling (sres/data/merra2.py:90-129) — exactly
    equivalent on the uniform ``data_timestep`` grid the caches guarantee.
"""
from __future__ import annotations

import math
import os
from datetime import date, datetime
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from ..config import cfg
from ..util.dates import dstr, year_date_range
from ..util.io import read_dataset_nc
from ..util.larray import LArray, get_data_indices
from ..util.logging import lgm
from .fmbatch import BatchType, Dataset, FMBatch

STATNAMES_BY_LEVEL = {
    "mean": "mean_by_level",
    "std": "stddev_by_level",
    "std_diff": "diffs_stddev_by_level",
}

# Predefined stats for the derived progress features (reference:
# loader.py:66-73 get_predef_norm_data — these are analytic, not measured).
_PREDEF = {
    "std_diff": dict(year_progress=0.0247, year_progress_sin=0.003,
                     year_progress_cos=0.003, day_progress=0.433,
                     day_progress_sin=1.0, day_progress_cos=1.0),
    "mean": dict(year_progress=0.5, year_progress_sin=0.0,
                 year_progress_cos=0.0, day_progress=0.5,
                 day_progress_sin=0.0, day_progress_cos=0.0),
    "std": dict(year_progress=0.29, year_progress_sin=0.707,
                year_progress_cos=0.707, day_progress=0.29,
                day_progress_sin=0.707, day_progress_cos=0.707),
}


# ---------------------------------------------------------------------------
# Path scheme (reference: io/loader.py:33-48 + merra2/loader.py:23-33,75-76)
# ---------------------------------------------------------------------------

def nc_format() -> str:
    v = cfg().task.get("nc_format")
    if v is None:
        pp = cfg().get("preprocess")
        v = pp.get("nc_format") if pp is not None else None
    return str(v or "standard")


def path_suffix(vres: str = "high") -> str:
    """reference: io/loader.py:33-39 (low-res dirs get a .us{scale} tag)."""
    if vres == "low" and nc_format() == "sres":
        return f".us{_scale_factor()}"
    return ""


def data_suffix(vres: str = "high") -> str:
    """reference: io/loader.py:41-48 — '.npz' replaces the reference's
    '.dali' per-var-npy cache dir (util/io.py packed format)."""
    fmt = ".npz" if nc_format() == "dali" else ".nc"
    res = f".us{_scale_factor()}" if (vres == "low" and nc_format() == "sres") else ""
    return res + fmt


def _scale_factor() -> int:
    return int(math.prod(cfg().model.downscale_factors))


def _version() -> str:
    task = cfg().task
    if "dataset_version" in task:
        return task.dataset_version
    pp = cfg().get("preprocess")
    assert pp is not None, ("MERRA2 paths need task.dataset_version or a "
                            "composed preprocess group")
    return pp.dataset_version


def cache_filepath(dynamic: bool, d: Optional[Union[date, datetime]] = None,
                   vres: str = "high") -> str:
    base = f"{cfg().platform.processed}/{_version()}"
    if dynamic:
        assert d is not None, "cache_filepath: date required for dynamic vars"
        return f"{base}/{dstr(d)}{data_suffix(vres)}"
    return f"{base}/const{data_suffix(vres)}"


def stats_filepath(version: str, statname: str, vres: str = "high") -> str:
    return f"{cfg().platform.processed}/{version}/stats{path_suffix(vres)}/{statname}"


# ---------------------------------------------------------------------------
# Loader (reference: merra2/loader.py Merra2DataLoader)
# ---------------------------------------------------------------------------

class Merra2DataLoader:
    """Daily-cache reader implementing the FMDataLoader protocol
    (data/fmbatch.py) over the files written by merra2_preprocess."""

    def __init__(self, vres: str = "high"):
        self.vres = vres

    # -- renaming (reference loader.py:40-63) --------------------------------
    @classmethod
    def _varname_map(cls) -> Dict[str, str]:
        """file-var → model-var, from task.input_variables when it is a
        mapping (reference rename_vars, loader.py:41-47)."""
        iv = cfg().task.get("input_variables")
        if iv is None or not hasattr(iv, "items"):
            return {}
        return {v: k for k, v in iv.items()}

    @classmethod
    def rename_vars(cls, dset: Dataset) -> Dataset:
        vmap = cls._varname_map()
        return {vmap.get(k, k): v for k, v in dset.items()}

    @classmethod
    def subset_datavars(cls, dset: Dataset) -> Dataset:
        """Keep model inputs + forcing + target + progress features
        (reference loader.py:54-56; see module docstring for why the keep-set
        is wider than the reference's)."""
        task = cfg().task
        iv = task.get("input_variables")
        if iv is None:
            return dict(dset)
        keep = set(iv.keys() if hasattr(iv, "keys") else iv)
        keep |= set(task.get("forcing_variables", []) or [])
        keep |= set(task.get("target_variables", []) or [])
        keep |= {f"{p}{s}" for p in ("year_progress", "day_progress")
                 for s in ("", "_sin", "_cos")}
        return {k: v for k, v in dset.items() if k in keep}

    # -- data access (reference loader.py:110-139) ---------------------------
    def access_data_subset(self, filepath: str) -> Dataset:
        dset = self.rename_vars(read_dataset_nc(filepath))
        dset = self.subset_datavars(dset)
        levels = cfg().task.get("levels")
        out: Dataset = {}
        sample = None
        for vn, arr in dset.items():
            if levels is not None and "z" in arr.dims:
                zc = np.asarray(arr.coords["z"])
                idx = np.array([int(np.abs(zc - lv).argmin()) for lv in levels])
                arr = arr.isel(z=idx)
            out[vn] = arr
            if sample is None or len(arr.dims) > len(sample.dims):
                sample = arr
        return self._roi_subset(out, sample)

    def _roi_subset(self, dset: Dataset, sample: Optional[LArray]) -> Dataset:
        """Origin/extent (high) or origin+tile_size (low) ROI
        (reference loader.py:116-127)."""
        task = cfg().task
        origin = task.get("origin")
        if origin is None or sample is None:
            return dset
        ocoords = origin.get("train", origin) if hasattr(origin, "get") else origin
        ocoords = {k: ocoords[k] for k in ("x", "y") if k in ocoords and k in sample.dims}
        if not ocoords:
            return dset
        iorigin = get_data_indices(sample, ocoords)
        if self.vres == "low" or "extent" not in task:
            tile = task.tile_size
            iroi = {d: slice(i, i + int(tile[d])) for d, i in iorigin.items()}
        else:
            iextent = get_data_indices(sample, {k: task.extent[k] for k in ocoords})
            iroi = {d: slice(i, iextent[d]) for d, i in iorigin.items()}
        out: Dataset = {}
        for vn, arr in dset.items():
            sel = {d: s for d, s in iroi.items() if d in arr.dims}
            out[vn] = arr.isel(**sel) if sel else arr
        return out

    def load_dataset(self, d: Union[date, datetime], vres: Optional[str] = None) -> Dataset:
        vres = vres or self.vres
        fpath = cache_filepath(True, d, vres)
        result = self.access_data_subset(fpath)
        lgm().log(f" * load_dataset[{vres}]({d}) vars={list(result)} {fpath}")
        return result

    def load_const_dataset(self, **kwargs: Any) -> Dataset:
        fpath = cache_filepath(False, vres=self.vres)
        if not os.path.exists(fpath):
            return {}
        return self.access_data_subset(fpath)

    # -- norm stats (reference loader.py:66-97) -------------------------------
    @classmethod
    def get_predef_norm_data(cls) -> Dict[str, Dict[str, np.ndarray]]:
        snames = cfg().task.get("statnames", STATNAMES_BY_LEVEL)
        return {snames[sn]: {k: np.float64(v) for k, v in _PREDEF[sn].items()}
                for sn in STATNAMES_BY_LEVEL}

    def load_stats(self, statname: str) -> Dict[str, np.ndarray]:
        fpath = stats_filepath(_version(), statname, self.vres)
        dset = read_dataset_nc(fpath) if os.path.exists(fpath) else {}
        vmap = self._varname_map()
        return {vmap.get(k, k): np.squeeze(a.data) for k, a in dset.items()}

    def load_merra2_norm_data(self) -> Dict[str, Dict[str, np.ndarray]]:
        """Measured per-level stats merged over the predefined progress stats
        (reference loader.py:91-97)."""
        snames = cfg().task.get("statnames", STATNAMES_BY_LEVEL)
        predef = self.get_predef_norm_data()
        out: Dict[str, Dict[str, np.ndarray]] = {}
        for sn, nname in (snames.items() if hasattr(snames, "items")
                          else [(s, s) for s in snames]):
            out[nname] = {**predef.get(nname, {}), **self.load_stats(sn)}
        return out


# ---------------------------------------------------------------------------
# Dataset (reference: sres/data/merra2.py MERRA2Dataset)
# ---------------------------------------------------------------------------

def _norm_dataset(dset: Dataset, mu: Dict[str, np.ndarray],
                  sd: Dict[str, np.ndarray]) -> Dataset:
    """(x - mean)/std per variable with per-level broadcast (reference
    sres/base/util/ops.py normalize via dsnorm; z is the axis named 'z')."""
    out: Dataset = {}
    for vn, arr in dset.items():
        m, s = mu.get(vn), sd.get(vn)
        if m is None or s is None:
            out[vn] = arr
            continue
        m, s = np.asarray(m, np.float64), np.asarray(s, np.float64)
        if m.ndim > 0 and "z" in arr.dims:
            shape = [1] * arr.ndim
            shape[arr.axis("z")] = m.size
            m, s = m.reshape(shape), s.reshape(shape)
        out[vn] = arr.copy(data=((arr.data - m) / np.where(s == 0, 1.0, s)
                                 ).astype(np.float32))
    return out


def stack_channels(dset: Dataset, tdim: str = "tiles",
                   grid: Optional[LArray] = None) -> LArray:
    """Dataset → (channels, tiles, y, x) with z expanded per level
    (reference loader-side ds2array, sres/controller/rescale.py:74-92:
    channels are '{var}~{level_index}' for 3-D vars, var name otherwise;
    variables in sorted-name order; constants broadcast over tiles)."""
    names = sorted(dset)
    sample = next((dset[n] for n in names if tdim in dset[n].dims), None)
    temporal = sample is not None
    nt = sample.sizes[tdim] if temporal else 1
    if grid is None:
        # any member variable that spans the full (y, x) grid; callers
        # stacking grid-less datasets (pure forcings) pass `grid` explicitly
        grid = next(a for a in dset.values()
                    if "y" in a.dims and "x" in a.dims)
    ny, nx = grid.sizes["y"], grid.sizes["x"]
    planes, channels = [], []
    for n in names:
        arr = dset[n]
        order = [d for d in (tdim, "z", "y", "x") if d in arr.dims]
        extra = [d for d in arr.dims if d not in order]
        assert not extra, f"stack_channels: unsupported dims {extra} on {n}"
        # canonicalize to (t, z, y, x) with singleton axes for missing dims,
        # then broadcast (constants over tiles, scalar/zonal forcings over
        # the grid — reference dataset_to_stacked broadcasts the same way)
        a = arr.transpose(*order).data
        nz = arr.sizes.get("z", 1)
        a = a.reshape([arr.sizes.get(d, 1) for d in (tdim, "z", "y", "x")])
        a = np.broadcast_to(a, (nt, nz, ny, nx))
        if "z" in arr.dims:
            for iz in range(nz):
                planes.append(a[:, iz])
                channels.append(f"{n}~{iz}")
        else:
            planes.append(a[:, 0])
            channels.append(n)
    data = np.stack(planes, axis=0).astype(np.float32)
    coords: Dict[str, Any] = {"channels": channels}
    for cn in ("y", "x"):
        if cn in grid.coords:
            coords[cn] = np.asarray(grid.coords[cn])
    if not temporal:
        # reference base arrays drop the time axis (merra2.py:159-163:
        # base_inputs.isel(tiles=-1) → dims (channels, y, x))
        return LArray(data[:, 0], ["channels", "y", "x"], coords)
    if tdim in sample.coords:
        coords[tdim] = np.asarray(sample.coords[tdim])
    return LArray(data, ["channels", tdim, "y", "x"], coords)


class MERRA2Dataset:
    """Iterable over (inputs, base_input, targets) LArray triples
    (reference: sres/data/merra2.py:34-172)."""

    def __init__(self, train_dates: Optional[Sequence[datetime]] = None,
                 load_inputs: bool = True, load_targets: bool = True,
                 load_base: bool = True, vres: str = "high", **kwargs: Any):
        task = cfg().task
        self.train_dates: List[datetime] = (list(train_dates) if train_dates is not None
                                            else year_date_range(*task.year_range))
        self.load_inputs, self.load_targets = load_inputs, load_targets
        self.load_base = load_base
        self.dts = int(task.data_timestep)
        self.n_day_offsets = 24 // self.dts
        self.length = len(self.train_dates) * self.n_day_offsets
        self.train_steps: List[int] = list(task.train_steps)
        self.nsteps_input = int(task.nsteps_input)
        self.loader = Merra2DataLoader(vres)
        self.fmbatch = FMBatch(BatchType.Training, self.loader, vres=vres, **kwargs)
        self.norms = self.loader.load_merra2_norm_data()
        self.mu = self.norms["mean_by_level"]
        self.sd = self.norms["stddev_by_level"]
        self.dsd = self.norms["diffs_stddev_by_level"]
        self.current_date: Optional[datetime] = None
        self.i = 0

    def __len__(self) -> int:
        return self.length

    def get_date(self) -> datetime:
        return self.train_dates[self.i // self.n_day_offsets]

    def get_day_offset(self) -> int:
        return self.i % self.n_day_offsets

    def normalize(self, vdata: Dataset) -> Dataset:
        return _norm_dataset(vdata, self.mu, self.sd)

    def __iter__(self) -> "MERRA2Dataset":
        self.i = 0
        return self

    def __getitem__(self, idx: int) -> List[LArray]:
        self.i = idx
        return self.__next__()

    def __next__(self) -> List[LArray]:
        if self.i >= self.length:
            raise StopIteration
        next_date = self.get_date()
        if self.current_date != next_date:
            self.fmbatch.load(next_date)
            self.current_date = next_date
        window = self.fmbatch.get_train_data(self.get_day_offset())
        result = self.extract_inputs_targets(window)
        self.i += 1
        return result

    # -- lead-time extraction (reference merra2.py:90-129, integer form) -----
    def extract_input_target_times(self, window: Dataset) -> tuple:
        """Split a batch_steps window into the nsteps_input input steps
        ending at forecast-zero and the train_steps lead-time targets.
        zero = batch_steps-1-train_steps[-1] (reference's zero_index=-1-
        train_steps[-1] relabeling, merra2.py:117-119)."""
        nsteps = self.fmbatch.batch_steps
        zero = nsteps - 1 - self.train_steps[-1]
        assert zero - self.nsteps_input + 1 >= 0, (
            f"window of {nsteps} steps too short for {self.nsteps_input} "
            f"inputs + train_steps {self.train_steps}")
        isel_in = slice(zero - self.nsteps_input + 1, zero + 1)
        isel_tg = np.array([zero + s for s in self.train_steps])
        inputs = {v: (a.isel(tiles=isel_in) if "tiles" in a.dims else a)
                  for v, a in window.items()}
        targets = {v: (a.isel(tiles=isel_tg) if "tiles" in a.dims else a)
                   for v, a in window.items()}
        return inputs, targets

    def extract_inputs_targets(self, window: Dataset) -> List[LArray]:
        """reference merra2.py:131-172."""
        task = cfg().task
        iv = task.input_variables
        input_variables = list(iv.keys() if hasattr(iv, "keys") else iv)
        target_variables = list(task.target_variables)
        forcing_variables = list(task.get("forcing_variables", []) or [])
        overlap = set(forcing_variables) & set(target_variables)
        if overlap:
            raise ValueError(f"Forcing variables {sorted(overlap)} should not "
                             "overlap with target variables.")
        inputs, targets = self.extract_input_target_times(window)
        results: List[LArray] = []
        if self.load_inputs:
            varlist = input_variables + forcing_variables
            selected = {v: inputs[v] for v in varlist if v in inputs}
            results.append(stack_channels(self.normalize(selected)))
        if self.load_base:
            base = {v: (a.isel(tiles=-1) if "tiles" in a.dims else a)
                    for v, a in inputs.items() if v in target_variables}
            results.append(stack_channels(self.normalize(base)))
        if self.load_targets:
            sel = {v: targets[v] for v in target_variables if v in targets}
            results.append(stack_channels(self.normalize(sel)))
        return results

    def extract_inputs_targets_forcings(self, window: Dataset) -> tuple:
        """GraphCast-style triple: inputs exclude the forcing features, and
        forcings are provided at the TARGET lead times (reference intent of
        era52merra2.py:421-429 / merra2-sfno.yaml's forcing_variables
        comment)."""
        task = cfg().task
        iv = task.input_variables
        input_variables = list(iv.keys() if hasattr(iv, "keys") else iv)
        target_variables = list(task.target_variables)
        forcing_variables = list(task.get("forcing_variables", []) or [])
        inputs, targets = self.extract_input_target_times(window)
        inp = stack_channels(self.normalize(
            {v: inputs[v] for v in input_variables if v in inputs}))
        tgt = stack_channels(self.normalize(
            {v: targets[v] for v in target_variables if v in targets}))
        grid = next(a for a in targets.values()
                    if "y" in a.dims and "x" in a.dims)
        frc = stack_channels(self.normalize(
            {v: targets[v] for v in forcing_variables if v in targets}),
            grid=grid)
        return inp, tgt, frc


class MERRA2InputIterator:
    """Cycling (inputs, targets, forcings) iterator over FMBatch windows
    (reference: sres/data/era52merra2.py:396-429 MERRA2InputIterator —
    there bound to the nonexistent merra2.model FMBatch; here over the
    working MERRA2Dataset machinery). Matches the reference's cycling
    ``i = (i+1) % n`` semantics: iteration never raises StopIteration, use
    ``len()`` for one epoch."""

    def __init__(self, train_dates=None, vres: str = "high", **kwargs: Any):
        self.ds = MERRA2Dataset(train_dates=train_dates, vres=vres, **kwargs)

    def __len__(self) -> int:
        return self.ds.length

    def __iter__(self) -> "MERRA2InputIterator":
        self.ds.i = 0
        return self

    def __next__(self) -> tuple:
        ds = self.ds
        next_date = ds.get_date()
        if ds.current_date != next_date:
            ds.fmbatch.load(next_date)
            ds.current_date = next_date
        window = ds.fmbatch.get_train_data(ds.get_day_offset())
        out = ds.extract_inputs_targets_forcings(window)
        ds.i = (ds.i + 1) % ds.length
        return out
