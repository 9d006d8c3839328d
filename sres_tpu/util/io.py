"""Array file writers (reference: sres/base/io/{h5,nc4}.py): HDF5 via h5py
and NetCDF3 via scipy, with coordinate support."""
from __future__ import annotations

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
