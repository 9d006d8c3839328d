"""Device mesh + sharding specs — the framework's distributed runtime
(new capability: the reference is strictly single-GPU, SURVEY.md §2.10).

Design (scaling-book recipe): one mesh with a ``data`` axis; tile batches are
sharded over ``data`` (tiles are independent, so this is the natural SR
parallelism), parameters/optimizer state are replicated, and the jitted train
step lets XLA insert the gradient all-reduce over ICI. Multi-host entry goes
through ``jax.distributed.initialize`` (initialize_distributed below); tests
exercise the same code on a virtual 8-device CPU mesh.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> None:
    """Multi-host bootstrap; no-op when not launched under a multi-host
    coordinator (reference has no equivalent — single process, gpu.py:6)."""
    if os.getenv("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def get_mesh(mesh_cfg: Optional[Dict[str, int]] = None) -> Mesh:
    """Build the device mesh from cfg().pipeline.mesh ({axis: size}, -1 = all
    remaining devices). Default: every device on the 'data' axis."""
    mesh_cfg = dict(mesh_cfg or {"data": -1})
    devices = np.asarray(jax.devices())
    n = devices.size
    sizes = []
    axes = list(mesh_cfg.keys())
    remaining = n
    for ax in axes:
        s = int(mesh_cfg[ax])
        if s == -1:
            sizes.append(0)  # placeholder
        else:
            sizes.append(s)
            remaining //= s
    sizes = [remaining if s == 0 else s for s in sizes]
    total = int(np.prod(sizes))
    assert total <= n, f"mesh {dict(zip(axes, sizes))} needs {total} devices, have {n}"
    return Mesh(devices[:total].reshape(sizes), axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading (tile/batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
