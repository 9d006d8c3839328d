"""ctypes bindings for the native (C++/OpenMP) data-path kernels.

Compiled lazily on first use with g++ into a per-version cache directory;
every entry point has a numpy fallback so the framework works without a
toolchain (``available()`` reports which path is active).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent / "swot_decode.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _cache_dir() -> Path:
    d = Path(os.environ.get("SRES_NATIVE_CACHE",
                            Path.home() / ".cache" / "sres_tpu" / "native"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _build() -> Optional[Path]:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _cache_dir() / f"swot_decode.{tag}.so"
    if out.exists():
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-march=native",
           str(_SRC), "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return out
    except (FileNotFoundError, subprocess.CalledProcessError) as e:
        print(f"[sres_tpu.native] build failed, using numpy fallback: {e}", file=sys.stderr)
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(str(so))
        lib.swot_build_map.restype = ctypes.c_int64
        lib.swot_build_map.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.swot_decode.restype = None
        lib.swot_decode.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int64, ctypes.c_void_p]
        lib.bswap_f32_array.restype = None
        lib.bswap_f32_array.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def build_scatter_map(mask: np.ndarray) -> np.ndarray:
    """mask (bool/uint8) → int64 map: ocean index or -1."""
    mask8 = np.ascontiguousarray(mask, np.uint8)
    lib = _load()
    out = np.empty(mask8.size, np.int64)
    if lib is None:
        out.fill(-1)
        idx = np.flatnonzero(mask8)
        out[idx] = np.arange(idx.size)
        return out
    lib.swot_build_map(mask8.ctypes.data, mask8.size, out.ctypes.data)
    return out


def decode_timestep(be_bytes: np.ndarray, scatter_map: np.ndarray) -> np.ndarray:
    """big-endian f32 ocean values (raw uint32 view) + map → full f32 grid
    with NaN land. Equivalent to the reference's template scatter
    (swot/raw.py:136-140) in one parallel pass."""
    vals = np.ascontiguousarray(be_bytes).view(np.uint32)
    lib = _load()
    out = np.empty(scatter_map.size, np.float32)
    if lib is None:
        host = vals.byteswap().view(np.float32)
        out.fill(np.nan)
        sel = scatter_map >= 0
        out[sel] = host[scatter_map[sel]]
        return out
    lib.swot_decode(vals.ctypes.data, scatter_map.ctypes.data,
                    scatter_map.size, out.ctypes.data)
    return out
