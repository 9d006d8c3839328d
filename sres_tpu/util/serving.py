"""AOT serving artifacts: jax.export'd forward functions.

The reference deploys by shipping a torch checkpoint and re-instantiating
the model in Python at load time (sres/model/manager.py:93-106). The
TPU-native serving story adds an ahead-of-time option: serialize the
jitted forward (params baked in, StableHLO body) to a self-describing
artifact that a serving host can deserialize and call WITHOUT the model
zoo, the config tree, or a checkpoint restore — and without paying the
multi-minute first-compile at process start (only the backend's
StableHLO->executable step remains, which hits XLA's compilation cache).

Artifact layout (directory):
  serving.jaxexp   — jax.export serialized bytes (versioned, stable format)
  manifest.json    — model name/config, input spec, scale, dtype, creation
                     metadata; everything a host needs to validate inputs.

Batch handling: the artifact is exported over a SYMBOLIC batch dimension
when the model's trace admits it, else over the fixed batch sizes
requested. Lane-packed trunks (models/rcan.py) branch on batch
divisibility, so they export with a constrained symbol — pass
``symbolic_batch="2*b"`` for lane_pack=2 (any even batch) — while plain
archs take ``"b"`` (any batch).
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp


def build_serve_fn(model, variables) -> Callable:
    """Pure forward on LR tiles (NHWC f32) -> SR tiles; the bench --serve
    contract."""

    def fn(lr):
        return model.apply(variables, lr, train=False)

    return fn


def export_serving(model, variables, lr_hw: tuple, nchannels: int,
                   out_dir: str, batch_sizes: Sequence[int] = (1,),
                   symbolic_batch: Optional[str] = None,
                   manifest_extra: Optional[Dict[str, Any]] = None) -> dict:
    """Serialize the forward to ``out_dir`` (one .jaxexp per batch size, or
    one symbolic-batch artifact; ``symbolic_batch`` is a jax symbolic dim
    expression — "b" for any batch, "2*b" for lane_pack=2 trunks).
    Returns the manifest dict."""
    os.makedirs(out_dir, exist_ok=True)
    fn = jax.jit(build_serve_fn(model, variables))
    h, w = lr_hw
    entries = []
    if symbolic_batch:
        b, = jax.export.symbolic_shape(symbolic_batch)
        spec = jax.ShapeDtypeStruct((b, h, w, nchannels), jnp.float32)
        exp = jax.export.export(fn)(spec)
        path = os.path.join(out_dir, "serving_bSYM.jaxexp")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        entries.append({"batch": "symbolic", "shape": symbolic_batch,
                        "file": os.path.basename(path)})
    else:
        for bs in batch_sizes:
            spec = jax.ShapeDtypeStruct((bs, h, w, nchannels), jnp.float32)
            exp = jax.export.export(fn)(spec)
            path = os.path.join(out_dir, f"serving_b{bs}.jaxexp")
            with open(path, "wb") as f:
                f.write(exp.serialize())
            entries.append({"batch": bs, "file": os.path.basename(path)})
    manifest = {
        "format": "jax.export.v1",
        "input": {"layout": "NHWC", "height": h, "width": w,
                  "channels": nchannels, "dtype": "float32"},
        "artifacts": entries,
        "jax_version": jax.__version__,
    }
    manifest.update(manifest_extra or {})
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def export_region_serving(model, variables, region_shape: tuple, mesh,
                          out_dir: str,
                          manifest_extra: Optional[Dict[str, Any]] = None
                          ) -> dict:
    """Multi-chip serving artifact: the whole-model H-sharded region
    inference (parallel/spatial.py:infer_region_sharded — GSPMD halo
    exchanges + CA all-reduces over ICI) exported over ``mesh``. The
    artifact records the device count and shardings; the serving pod
    deserializes it and calls with a (B, H, W, C) region sharded
    P(None, axis, None, None) over an identical mesh."""
    import numpy as _np
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    assert region_shape[1] % n == 0, (region_shape, n)
    sharding = NamedSharding(mesh, P(None, axis, None, None))

    @jax.jit
    def fn(xin):
        y = model.apply(variables, xin, train=False)
        return lax.with_sharding_constraint(y, sharding)

    os.makedirs(out_dir, exist_ok=True)
    spec = jax.ShapeDtypeStruct(tuple(region_shape), jnp.float32)
    exp = jax.export.export(jax.jit(fn, in_shardings=sharding,
                                    out_shardings=sharding))(spec)
    path = os.path.join(out_dir, f"region_{n}dev.jaxexp")
    with open(path, "wb") as f:
        f.write(exp.serialize())
    manifest = {
        "format": "jax.export.v1",
        "kind": "region_sharded",
        "input": {"layout": "NHWC", "shape": list(region_shape),
                  "dtype": "float32",
                  "sharding": f"P(None, '{axis}', None, None)"},
        "mesh": {"axis": axis, "devices": int(n)},
        "artifacts": [{"file": os.path.basename(path)}],
        "jax_version": jax.__version__,
    }
    manifest.update(manifest_extra or {})
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_region_serving(out_dir: str, mesh) -> Callable:
    """Deserialize a region_sharded artifact; returns ``fn(region)`` where
    region must be placed P(None, axis, None, None) over ``mesh`` (same
    device count as at export)."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest.get("kind") == "region_sharded", manifest.get("kind")
    want_n = manifest["mesh"]["devices"]
    have_n = int(np_prod(mesh.devices.shape))
    assert have_n == want_n, (
        f"artifact exported for {want_n} devices, mesh has {have_n}")
    with open(os.path.join(out_dir, manifest["artifacts"][0]["file"]),
              "rb") as f:
        exp = jax.export.deserialize(f.read())
    return jax.jit(exp.call)


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


def load_serving(out_dir: str, batch: Optional[int] = None) -> Callable:
    """Deserialize a serving artifact; returns ``fn(lr) -> sr``. ``batch``
    picks the fixed-batch artifact (defaults to the first listed; the
    symbolic artifact accepts any batch)."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    entries = manifest["artifacts"]
    entry = entries[0] if batch is None else next(
        e for e in entries if e["batch"] in (batch, "symbolic"))
    with open(os.path.join(out_dir, entry["file"]), "rb") as f:
        exp = jax.export.deserialize(f.read())
    return lambda lr: exp.call(lr)
