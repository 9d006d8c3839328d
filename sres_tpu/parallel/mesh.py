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


def image_sharding(mesh: Mesh, batch_dim: int = 0, h_dim: Optional[int] = 2,
                   axis: str = "data") -> NamedSharding:
    """Sharding for NCHW image batches: batch dim over ``data`` and — when
    the mesh declares a ``spatial`` axis (pipeline.mesh: {data: N, spatial:
    M}) — the H dim over ``spatial``. GSPMD then partitions every conv
    spatially (halo exchanges placed by XLA), so one train/eval step scales
    across BOTH more tiles and bigger tiles. With no spatial axis this
    degenerates to plain batch sharding."""
    ndim = max(batch_dim, h_dim if h_dim is not None else 0) + 2
    spec = [None] * ndim
    spec[batch_dim] = axis
    if h_dim is not None and "spatial" in mesh.axis_names:
        spec[h_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def host_batch_slice(nglobal: int) -> slice:
    """This host's contiguous row range of the global padded batch. Every
    host builds the same global batch order (seeded shuffle, see
    trainer._shuffle_rng) and feeds only its slice to its devices."""
    nproc, pid = jax.process_count(), jax.process_index()
    assert nglobal % nproc == 0, f"global batch {nglobal} not divisible by {nproc} hosts"
    per = nglobal // nproc
    return slice(pid * per, (pid + 1) * per)


def make_global_batch(batch: np.ndarray, mesh: Mesh, axis: str = "data",
                      batch_dim: int = 0, h_dim: Optional[int] = None):
    """Global (padded) host batch → a sharded jax.Array on the mesh's data
    axis. Single-process: a plain sharded device_put. Multi-host: each
    process transfers ONLY its slice of the batch
    (jax.make_array_from_process_local_data), so input bandwidth scales with
    hosts instead of every host pushing identical data (SURVEY §7 step 5).
    ``batch_dim``: which dim is the tile/batch dim — 1 for the (K, B, ...)
    stacks of the scanned multi-step (steps_per_dispatch). ``h_dim``: image
    H dim to shard over a 2D mesh's ``spatial`` axis (image_sharding)."""
    if h_dim is not None and "spatial" in mesh.axis_names:
        sharding = image_sharding(mesh, batch_dim, h_dim, axis)
    else:
        spec = [None] * (batch_dim + 1)
        spec[batch_dim] = axis
        sharding = NamedSharding(mesh, P(*spec))
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    idx = [slice(None)] * batch.ndim
    idx[batch_dim] = host_batch_slice(batch.shape[batch_dim])
    local = np.ascontiguousarray(batch[tuple(idx)])
    return jax.make_array_from_process_local_data(sharding, local, batch.shape)


def sync_seed(seed: int) -> int:
    """Agree on one seed across hosts. The reference's controller defaults
    its seed to ``int(time.time()/60)`` (workflow.py:21) — faithful here,
    but on a multi-host mesh hosts can straddle a minute boundary and
    diverge, which would break the every-host-builds-the-same-global-batch
    contract (host_batch_slice above). Process 0's seed wins."""
    if jax.process_count() == 1:
        return int(seed)
    from jax.experimental import multihost_utils
    return int(multihost_utils.broadcast_one_to_all(np.int64(seed)))
