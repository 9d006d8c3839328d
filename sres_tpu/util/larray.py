"""Minimal labeled array — the framework's replacement for xarray.DataArray.

The reference threads ``xa.DataArray`` objects with dims
('tiles','channels','y','x'), coords (tile ids, channel names) and attrs
(normalization stats, grid_shape, xyflip) through its data layer
(e.g. sres/base/source/swot/raw.py:233). xarray is not a dependency of this
framework; LArray carries exactly the metadata the pipeline needs while the
payload stays a plain numpy array that is handed to JAX at the jit boundary.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np


class LArray:
    __slots__ = ("data", "dims", "coords", "attrs")

    def __init__(
        self,
        data: np.ndarray,
        dims: Sequence[str],
        coords: Optional[Dict[str, Any]] = None,
        attrs: Optional[Dict[str, Any]] = None,
    ):
        assert len(dims) == data.ndim, f"dims {dims} do not match shape {data.shape}"
        self.data = data
        self.dims = tuple(dims)
        self.coords = dict(coords or {})
        self.attrs = dict(attrs or {})

    # -- basic protocol -------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        return self.data.shape

    @property
    def ndim(self) -> int:
        return self.data.ndim

    @property
    def values(self) -> np.ndarray:
        return self.data

    @property
    def sizes(self) -> Dict[str, int]:
        return dict(zip(self.dims, self.data.shape))

    def axis(self, dim: str) -> int:
        return self.dims.index(dim)

    def copy(self, data: Optional[np.ndarray] = None) -> "LArray":
        return LArray(
            np.array(self.data) if data is None else data,
            self.dims, dict(self.coords), dict(self.attrs),
        )

    def __repr__(self) -> str:
        return f"LArray{self.dims}{self.shape}"

    # -- selection -------------------------------------------------------------
    def isel(self, **indexers: Union[int, slice, np.ndarray]) -> "LArray":
        """Positional selection along named dims; int indexers drop the dim."""
        idx: List[Any] = [slice(None)] * self.ndim
        dropped = []
        for dim, sl in indexers.items():
            idx[self.axis(dim)] = sl
            if isinstance(sl, int):
                dropped.append(dim)
        new_data = self.data[tuple(idx)]
        new_dims = [d for d in self.dims if d not in dropped]
        new_coords = dict(self.coords)
        for dim, sl in indexers.items():
            if dim in new_coords:
                if isinstance(sl, int):
                    new_coords.pop(dim)
                else:
                    new_coords[dim] = np.asarray(new_coords[dim])[sl]
        return LArray(new_data, new_dims, new_coords, dict(self.attrs))

    def sel(self, **selectors: Any) -> "LArray":
        """Coordinate-label selection (single label → dim dropped)."""
        indexers: Dict[str, Any] = {}
        for dim, label in selectors.items():
            coord = list(np.asarray(self.coords[dim]))
            if isinstance(label, (list, tuple, np.ndarray)):
                indexers[dim] = np.array([coord.index(l) for l in label])
            else:
                indexers[dim] = coord.index(label)
        return self.isel(**indexers)

    def transpose(self, *dims: str) -> "LArray":
        axes = [self.axis(d) for d in dims]
        return LArray(self.data.transpose(axes), dims, dict(self.coords), dict(self.attrs))

    # -- numerics ---------------------------------------------------------------
    def mean(self) -> float:
        return float(np.nanmean(self.data))

    def std(self) -> float:
        return float(np.nanstd(self.data))


def concat(arrays: Sequence[LArray], dim: str) -> LArray:
    ax = arrays[0].axis(dim)
    data = np.concatenate([a.data for a in arrays], axis=ax)
    coords = dict(arrays[0].coords)
    if dim in coords:
        coords[dim] = np.concatenate([np.asarray(a.coords[dim]) for a in arrays])
    return LArray(data, arrays[0].dims, coords, dict(arrays[0].attrs))


# -- coordinate-value helpers (reference: sres/base/util/config.py:159-199) --
def index_of_value(array, target_value: float) -> int:
    import numpy as _np
    return int(_np.abs(_np.asarray(array) - target_value).argmin())


def closest_value(array, target_value: float) -> float:
    import numpy as _np
    a = _np.asarray(array)
    return float(a[_np.abs(a - target_value).argmin()])


def get_coord_bounds(coord) -> tuple:
    import numpy as _np
    c = _np.asarray(coord)
    dc = c[1] - c[0]
    return float(c[0]), float(c[-1] + dc)


def get_data_coords(data: "LArray", target_coords: dict) -> dict:
    """Snap requested coordinate values onto the array's actual grid."""
    return {dim: closest_value(data.coords[dim], cval)
            for dim, cval in target_coords.items()}


def get_data_indices(data: "LArray", target_coords: dict) -> dict:
    return {dim: index_of_value(data.coords[dim], cval)
            for dim, cval in target_coords.items()}


def cdelta(data: "LArray") -> dict:
    import numpy as _np
    out = {}
    for k, c in data.coords.items():
        c = _np.asarray(c)
        if c.size > 1 and _np.issubdtype(c.dtype, _np.number):
            out[k] = float(c[1] - c[0])
    return out


# -- GraphCast-style variable stacking (reference: sres/base/util/ops.py:192-351)
def dict_to_stacked(arrays: dict, channel_dim: str = "channels") -> "LArray":
    """{name: LArray(..., y, x)} → one LArray with a leading channels axis
    per variable, variables in sorted-name order (reference
    dataset_to_stacked). Scalars per variable broadcast to the common grid."""
    import numpy as _np
    names = sorted(arrays)
    sample = arrays[names[0]]
    planes = []
    for n in names:
        a = arrays[n]
        d = _np.asarray(a.data if isinstance(a, LArray) else a)
        planes.append(_np.broadcast_to(d, sample.data.shape))
    data = _np.stack(planes, axis=0)
    dims = [channel_dim] + list(sample.dims)
    coords = dict(sample.coords)
    coords[channel_dim] = names
    return LArray(data, dims, coords=coords)


def stacked_to_dict(stacked: "LArray", channel_dim: str = "channels") -> dict:
    """Inverse of dict_to_stacked (reference stacked_to_dataset)."""
    names = list(stacked.coords[channel_dim])
    return {n: stacked.isel(**{channel_dim: i}) for i, n in enumerate(names)}


def normalize_stacked(values: dict, scales: dict, means: dict = None) -> dict:
    """Per-variable (x - mean) / scale over a {name: array} dict (reference
    ops.normalize); missing entries pass through unchanged."""
    import numpy as _np
    out = {}
    for name, arr in values.items():
        a = _np.asarray(arr.data if isinstance(arr, LArray) else arr, _np.float32)
        if means is not None and name in means:
            a = a - _np.float32(means[name])
        if scales is not None and name in scales:
            a = a / _np.float32(scales[name])
        out[name] = (arr.copy(data=a) if isinstance(arr, LArray) else a)
    return out
