"""Weighted statistics accumulation (reference: sres/controller/stats.py).

``StatsAccumulator`` merges per-timeslice mean/std(/std_diff) estimates with
sample-count weights and writes NetCDF outputs — used by preprocessing-style
dataset passes (the reference used it for MERRA2 cache generation).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

STATNAMES = ("mean", "std", "std_diff")


class StatsEntry:
    def __init__(self, varname: str):
        self._stats: Dict[str, List[Dict]] = {}
        self._varname = varname

    def add(self, statname: str, value: np.ndarray, weight: float = 1.0) -> None:
        self._stats.setdefault(statname, []).append(dict(value=np.asarray(value, np.float64),
                                                         weight=float(weight)))

    def entries(self, statname: str) -> Optional[List[Dict]]:
        return self._stats.get(statname)

    def merge(self, other: "StatsEntry") -> None:
        for sn, recs in other._stats.items():
            self._stats.setdefault(sn, []).extend(recs)


class StatsAccumulator:
    def __init__(self, vres: str = ""):
        self.vres = vres
        self._entries: Dict[str, StatsEntry] = {}

    @property
    def varnames(self):
        return self._entries.keys()

    def entry(self, varname: str) -> StatsEntry:
        return self._entries.setdefault(varname, StatsEntry(varname))

    def add_entry(self, varname: str, data: np.ndarray, istemporal: bool = True,
                  level_axis: Optional[int] = None) -> None:
        """Accumulate mean/std (and, for temporal stacks, successive-diff std)
        of one (T, y, x) or (y, x) slab (reference: stats.py:48-70). With
        ``level_axis`` set, reduction keeps that axis so stats come out as
        per-level vectors (the reference reduces over dims ['tiles','y','x']
        keeping z — stats.py:52-56 — which feeds the *_by_level norm files)."""
        weight = data.shape[0] if istemporal else 1
        e = self.entry(varname)
        axes = (None if level_axis is None else
                tuple(a for a in range(data.ndim) if a != level_axis % data.ndim))
        e.add("mean", np.nanmean(data, axis=axes), weight)
        e.add("std", np.nanstd(data, axis=axes), weight)
        if istemporal and data.shape[0] > 1:
            diff = np.diff(data, axis=0)
            e.add("mean_diff", np.nanmean(diff, axis=axes), weight)
            e.add("std_diff", np.nanstd(diff, axis=axes), weight)

    def accumulate(self, statname: str) -> Dict[str, np.ndarray]:
        """Weighted merge: plain weighted mean for means, RMS-weighted for
        stds (reference: stats.py:72-89)."""
        out: Dict[str, np.ndarray] = {}
        squared = statname.startswith("std")
        for vn, e in self._entries.items():
            recs = e.entries(statname)
            if not recs:
                continue
            wsum = sum(r["weight"] for r in recs)
            if squared:
                acc = sum(r["weight"] * r["value"] ** 2 for r in recs)
                out[vn] = np.sqrt(acc / wsum)
            else:
                out[vn] = sum(r["weight"] * r["value"] for r in recs) / wsum
        return out

    def save(self, statname: str, filepath: str) -> None:
        """Write accumulated stats as NetCDF (reference: stats.py:89-96).
        Scalar stats land on a size-1 'scalar' dim; per-level vectors (from
        ``add_entry(level_axis=...)``) get one shared dim per length, so the
        *_by_level files round-trip through data/merra2.py:load_stats."""
        from scipy.io import netcdf_file
        os.makedirs(os.path.dirname(filepath), exist_ok=True)
        stats = self.accumulate(statname)
        f = netcdf_file(filepath, "w")
        dims: Dict[int, str] = {}
        for vn, val in stats.items():
            val = np.atleast_1d(np.asarray(val, np.float64))
            n = val.size
            if n not in dims:
                dname = ("scalar" if n == 1 else
                         ("z" if "z" not in dims.values() else f"z{n}"))
                f.createDimension(dname, n)
                dims[n] = dname
            v = f.createVariable(vn, "f8", (dims[n],))
            v[:] = val
        f.close()
