"""Observability: profiler traces, device-memory snapshots, NaN debugging.

TPU-native replacements for the reference's aux subsystems (SURVEY.md §5.1-5.2):
``log_timing`` decorator lives in util/logging.py; this module adds
  * step-range profiler traces (jax.profiler → Perfetto/XProf directory),
  * device memory snapshots (replacing the reference's CUDA memory-history
    pickle, sres/base/gpu.py:23-33),
  * the jax_debug_nans switch (replacing torch's implicit NaN surfacing).
"""
from __future__ import annotations

import json
import os
from contextlib import contextmanager
from typing import Any, Dict, Optional

import jax

from sres_tpu.config import ConfigContext, cfg, cid
from sres_tpu.util.logging import lgm


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", bool(enable))


def apply_pipeline_debug_flags() -> None:
    """Honor pipeline.debug_nans / pipeline.profile from the active config."""
    if ConfigContext.cfg is None:
        return
    if bool(cfg().pipeline.get("debug_nans", False)):
        enable_nan_debugging(True)


@contextmanager
def profile_trace(tag: str = "train"):
    """jax.profiler trace into {results}/profiles/{cid}/{tag} when
    pipeline.profile is set; no-op otherwise."""
    active = ConfigContext.cfg is not None and bool(cfg().pipeline.get("profile", False))
    if not active:
        yield
        return
    tdir = f"{cfg().platform.results}/profiles/{cid()}/{tag}"
    os.makedirs(tdir, exist_ok=True)
    lgm().log(f"profiler trace → {tdir}", display=True)
    with jax.profiler.trace(tdir):
        yield


def device_memory_stats() -> Dict[str, Any]:
    stats: Dict[str, Any] = {}
    for i, d in enumerate(jax.local_devices()):
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            stats[f"device_{i}"] = {k: int(v) for k, v in s.items()}
    return stats


def save_memory_snapshot() -> Optional[str]:
    """Dump per-device memory stats when pipeline.memory_debug is set
    (reference: sres/base/gpu.py:28-33 CUDA snapshot pickle → JSON here)."""
    if ConfigContext.cfg is None or not bool(cfg().pipeline.get("memory_debug", False)):
        return None
    path = f"{cfg().platform.results}/memory/snapshot.{cid()}.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(device_memory_stats(), f, indent=1)
    lgm().log(f"memory snapshot → {path}")
    return path
