"""Foundation-model batch assembly: date-window merging of timeslice
datasets plus constant-field handling (reference:
sres/base/source/batch.py:25-31 BatchType/VarType, :84-106
get_target_steps/get_steps_per_day/get_days_per_batch, :100-113
merge_temporal_batch, :117-135 load_predef_norm_data, :209-239 FMBatch).

The reference binds FMBatch to its (dead) MERRA2 ``FMDataLoader``; here the
loader is an injected protocol — any object with ``load_dataset(day)`` and
``load_const_dataset()`` returning ``{var: LArray}`` dicts works — so the
date-window merging machinery is live and testable without the legacy
source tree. Datasets are plain ``Dict[str, LArray]`` (this framework's
xarray.Dataset analogue, util/larray.py).
"""
from __future__ import annotations

import math
from datetime import date, datetime
from enum import Enum
from typing import Dict, List, Optional, Protocol, Sequence, Union

import numpy as np

from ..config import cfg
from ..util.dates import date_list
from ..util.larray import LArray, concat, dict_to_stacked

Dataset = Dict[str, LArray]

PREDEF_NORMS = ["year_progress", "year_progress_sin", "year_progress_cos",
                "day_progress", "day_progress_sin", "day_progress_cos"]


class BatchType(Enum):
    Training = "training"
    Forecast = "forecast"


class VarType(Enum):
    Constant = "constant"
    Dynamic = "dynamic"


class FMDataLoader(Protocol):
    """Injected source protocol (replaces the reference's MERRA2-bound ABC,
    sres/base/source/loader/batch.py)."""

    def load_dataset(self, day: Union[date, datetime], vres: str = "high") -> Dataset: ...

    def load_const_dataset(self, **kwargs) -> Dataset: ...


def get_target_steps(btype: BatchType) -> Sequence[int]:
    """reference: source/batch.py:84-86."""
    task = cfg().task
    return task.train_steps if btype == BatchType.Training else task.eval_steps


def get_steps_per_day() -> int:
    """reference: source/batch.py:88-93."""
    hours_per_step = cfg().task.get("hours_per_step", 0)
    if hours_per_step == 0:
        return 0
    steps_per_day = 24 / hours_per_step
    assert steps_per_day.is_integer(), \
        "steps_per_day (24/data_timestep) must be an integer"
    return int(steps_per_day)


def get_days_per_batch(btype: BatchType) -> int:
    """reference: source/batch.py:95-100."""
    steps_per_day = get_steps_per_day()
    batch_steps = cfg().task.nsteps_input + len(get_target_steps(btype))
    if btype == BatchType.Training:
        return 1 + math.ceil((batch_steps - 1) / steps_per_day)
    return math.ceil(batch_steps / steps_per_day)


def merge_temporal_batch(slices: List[Dataset], constants: Dataset) -> Dataset:
    """Concatenate per-day timeslices along 'tiles' and split out constant
    fields (reference: source/batch.py:100-113).

    Variables without a 'tiles' dim in the first slice are constants;
    variables listed in ``task.constants`` that DO carry a tiles dim are
    time-averaged into constants. Everything else is dynamic.
    """
    constant_vars: List[str] = list(cfg().task.get("constants", []) or [])
    first = slices[0]
    cvars = [v for v, arr in first.items() if "tiles" not in arr.dims]
    dynamics: Dataset = {
        v: concat([s[v] for s in slices], dim="tiles")
        for v in first if v not in cvars
    }
    merged_constants: Dataset = dict(constants)
    for vname, dvar in first.items():
        # reference drops time-dim vars before promotion (source/batch.py:106
        # sample = slices[0].drop_dims('time')): a 'time'-dim var without a
        # 'tiles' dim is dropped, never promoted to a constant
        if "time" in dvar.dims:
            continue
        if vname in cvars and vname not in dynamics:
            merged_constants[vname] = dvar
        elif vname in constant_vars and "tiles" in dvar.dims:
            ax = dvar.axis("tiles")
            merged_constants[vname] = LArray(
                np.nanmean(dvar.data, axis=ax),
                [d for d in dvar.dims if d != "tiles"],
                {k: c for k, c in dvar.coords.items() if k != "tiles"},
                dvar.attrs)
    for vname in constant_vars:
        dynamics.pop(vname, None)
    # dynamics win name collisions (xa.merge(..., compat='override') order)
    return {**merged_constants, **dynamics}


def load_predef_norm_data() -> Dict[str, Dataset]:
    """Predefined per-level norm stats for the progress features
    (reference: source/batch.py:117-135). Reads ``.npz`` sidecars from
    ``{platform.model}/stats/`` (this framework's norm-artifact format,
    data/norm.py) keeping only the PREDEF_NORMS variables."""
    root = cfg().platform.model
    norms: Dict[str, Dataset] = {}
    for nname in ("diffs_stddev_by_level", "mean_by_level", "stddev_by_level"):
        with np.load(f"{root}/stats/{nname}.npz") as f:
            ds: Dataset = {}
            for v in f.files:
                if v in PREDEF_NORMS:
                    a = np.asarray(f[v])
                    ds[v] = LArray(a, [f"level{i}" if i else "level"
                                       for i in range(a.ndim)])
            norms[nname] = ds
    return norms


class FMBatch:
    """Date-windowed batch: loads ``days_per_batch`` consecutive daily
    datasets and serves ``batch_steps``-long training windows at any day
    offset (reference: source/batch.py:209-239)."""

    def __init__(self, btype: BatchType, date_loader: FMDataLoader, **kwargs):
        self.date_loader = date_loader
        self.type = btype
        self.vres: str = kwargs.get("vres", "high")
        self.days_per_batch = get_days_per_batch(btype)
        self.target_steps = get_target_steps(btype)
        self.batch_steps: int = cfg().task.nsteps_input + len(self.target_steps)
        self.constants: Dataset = self.date_loader.load_const_dataset(**kwargs)
        self.current_batch: Optional[Dataset] = None

    def load(self, d: Union[date, datetime], **kwargs) -> None:
        bdays = date_list(d, self.days_per_batch)
        time_slices = [self.date_loader.load_dataset(day, self.vres) for day in bdays]
        self.current_batch = merge_temporal_batch(time_slices, self.constants)

    def _isel_tiles(self, sel) -> Dataset:
        out: Dataset = {}
        for vname, arr in self.current_batch.items():
            out[vname] = arr.isel(tiles=sel) if "tiles" in arr.dims else arr
        return out

    def get_train_data(self, day_offset: int) -> Dataset:
        return self._isel_tiles(slice(day_offset, day_offset + self.batch_steps))

    def get_time_slice(self, day_offset: int) -> Dataset:
        return self._isel_tiles(day_offset)

    @classmethod
    def to_feature_array(cls, data_batch: Dataset) -> LArray:
        """Stack data variables into a trailing 'features' channel dim
        (reference: source/batch.py:233-238)."""
        stacked = dict_to_stacked(data_batch, channel_dim="features")
        order = [d for d in stacked.dims if d != "features"] + ["features"]
        return stacked.transpose(*order)
