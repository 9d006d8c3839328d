"""Array file writers (reference: sres/base/io/{h5,nc4}.py): HDF5 via h5py
and NetCDF3 via scipy, with coordinate support. ``write_dataset_nc`` /
``read_dataset_nc`` round-trip a multi-variable labeled dataset
(Dict[str, LArray]) — the cache format of the MERRA2 daily files
(reference: sres/base/source/merra2/preprocess.py:127-136 writes
NETCDF4 via xarray; neither xarray nor netCDF4 is a dependency here, so
caches are NetCDF3-classic via scipy with an .npz packed variant
replacing the reference's per-variable-npy DALI format)."""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np


def write_h5(filepath: str, name: str, data: np.ndarray,
             attrs: Optional[Dict] = None) -> str:
    import h5py
    os.makedirs(os.path.dirname(filepath), exist_ok=True)
    with h5py.File(filepath, "w") as f:
        ds = f.create_dataset(name, data=np.asarray(data))
        for k, v in (attrs or {}).items():
            ds.attrs[k] = v
    return filepath


def read_h5(filepath: str, name: str) -> np.ndarray:
    import h5py
    with h5py.File(filepath, "r") as f:
        return np.array(f[name])


def write_nc(filepath: str, name: str, data: np.ndarray,
             dims: Sequence[str], coords: Optional[Dict[str, np.ndarray]] = None) -> str:
    from scipy.io import netcdf_file
    os.makedirs(os.path.dirname(filepath), exist_ok=True)
    f = netcdf_file(filepath, "w")
    for d, n in zip(dims, data.shape):
        f.createDimension(d, n)
    for cn, cv in (coords or {}).items():
        if cn in dims:
            v = f.createVariable(cn, "f8", (cn,))
            v[:] = np.asarray(cv, np.float64)
    var = f.createVariable(name, "f4", tuple(dims))
    var[:] = np.asarray(data, np.float32)
    f.close()
    return filepath


# ---------------------------------------------------------------------------
# Multi-variable labeled datasets (Dict[str, LArray]) — MERRA2 cache format
# ---------------------------------------------------------------------------

def write_dataset_nc(filepath: str, arrays: Dict, attrs: Optional[Dict] = None) -> str:
    """Write a {name: LArray} dataset to one NetCDF3 file.

    Dims are shared across variables by name; numeric 1-D coords named after
    a dim are written as coordinate variables. LArray ``attrs`` with scalar
    str/num values become variable attributes; dataset ``attrs`` become
    global attributes. Variables may cover different dim subsets (e.g.
    (tiles,z,y,x) dynamics next to (y,x) constants)."""
    from scipy.io import netcdf_file
    if filepath.endswith(".npz"):
        return write_dataset_npz(filepath, arrays, attrs)
    os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
    f = netcdf_file(filepath, "w")
    created: Dict[str, int] = {}
    coords_all: Dict[str, np.ndarray] = {}
    for arr in arrays.values():
        for d, n in arr.sizes.items():
            if d in created:
                assert created[d] == n, f"dim {d!r} inconsistent: {created[d]} vs {n}"
            else:
                f.createDimension(d, n)
                created[d] = n
        for cn, cv in arr.coords.items():
            if cn in arr.dims and cn not in coords_all:
                cv = np.asarray(cv)
                if np.issubdtype(cv.dtype, np.number):
                    coords_all[cn] = cv
    for cn, cv in coords_all.items():
        v = f.createVariable(cn, "f8", (cn,))
        v[:] = np.asarray(cv, np.float64)
    for name, arr in arrays.items():
        if name in coords_all:
            continue
        v = f.createVariable(name, "f4", tuple(arr.dims))
        v[:] = np.asarray(arr.data, np.float32)
        for k, av in arr.attrs.items():
            if isinstance(av, (str, int, float, np.integer, np.floating)):
                setattr(v, k, av)
    for k, av in (attrs or {}).items():
        if isinstance(av, (str, int, float, np.integer, np.floating)):
            setattr(f, k, av)
    f.close()
    return filepath


def read_dataset_nc(filepath: str) -> Dict:
    """Inverse of write_dataset_nc → {name: LArray} (coord variables are
    attached as coords on every variable that carries their dim)."""
    from scipy.io import netcdf_file
    from sres_tpu.util.larray import LArray
    if filepath.endswith(".npz"):
        return read_dataset_npz(filepath)
    f = netcdf_file(filepath, "r", mmap=False)
    try:
        dim_coords = {n: np.array(v.data) for n, v in f.variables.items()
                      if v.dimensions == (n,)}
        out: Dict[str, LArray] = {}
        for name, v in f.variables.items():
            if name in dim_coords:
                continue
            coords = {d: dim_coords[d] for d in v.dimensions if d in dim_coords}
            vattrs = {k: (av.decode() if isinstance(av, bytes) else av)
                      for k, av in v._attributes.items()}
            out[name] = LArray(np.array(v.data), list(v.dimensions), coords, vattrs)
        return out
    finally:
        f.close()


def write_dataset_npz(filepath: str, arrays: Dict, attrs: Optional[Dict] = None) -> str:
    """Packed single-file dataset (replaces the reference's DALI per-var .npy
    + header.nc cache, preprocess.py:150-164): one .npz holding every
    variable plus a JSON manifest of dims/coords/attrs."""
    os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
    manifest = {"attrs": attrs or {}, "vars": {}}
    payload: Dict[str, np.ndarray] = {}
    for name, arr in arrays.items():
        payload[f"var::{name}"] = np.asarray(arr.data, np.float32)
        manifest["vars"][name] = {
            "dims": list(arr.dims),
            "attrs": {k: v for k, v in arr.attrs.items()
                      if isinstance(v, (str, int, float))},
        }
        for cn, cv in arr.coords.items():
            cv = np.asarray(cv)
            if cn in arr.dims and np.issubdtype(cv.dtype, np.number):
                payload.setdefault(f"coord::{cn}", np.asarray(cv, np.float64))
    payload["manifest"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)
    np.savez(filepath, **payload)
    return filepath


def read_dataset_npz(filepath: str) -> Dict:
    from sres_tpu.util.larray import LArray
    out: Dict[str, LArray] = {}
    with np.load(filepath) as f:
        manifest = json.loads(bytes(f["manifest"]).decode())
        coords = {k.split("::", 1)[1]: np.array(f[k]) for k in f.files
                  if k.startswith("coord::")}
        for name, spec in manifest["vars"].items():
            dims = spec["dims"]
            out[name] = LArray(np.array(f[f"var::{name}"]), dims,
                               {d: coords[d] for d in dims if d in coords},
                               dict(spec["attrs"]))
    return out
