"""Spatial (halo-exchange) parallelism primitives (SURVEY §5.7).

For region-scale images too large for one chip, the H axis is sharded over
the mesh and convs exchange k//2-row halos with mesh neighbors via
``lax.ppermute`` over ICI — the SPMD alternative to host-side tiling
(trainer.infer_region / infer_region_seamless remain the production path for
tile-trained models; this primitive is the building block for fully sharded
region models). Numerically identical to the unsharded zero-padded conv:
boundary shards zero their missing halo.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# infer_region_sharded's jitted apply per (id(model), mesh, axis) — see the
# comment at its use site
_APPLY_CACHE: dict = {}


def halo_conv2d(x: jnp.ndarray, w: jnp.ndarray, mesh: Mesh,
                axis: str = "data") -> jnp.ndarray:
    """'same' zero-padded 2D conv on an H-sharded NHWC image.

    x: (B, H, W, Cin) with H divisible by the mesh axis size; w: (k, k, Cin,
    Cout), odd k. Each shard convolves locally after receiving k//2 rows from
    each neighbor (ppermute over ICI); the first/last shard zero their outer
    halo, reproducing global zero padding exactly.
    """
    k = w.shape[0]
    r = k // 2
    n = mesh.shape[axis]
    assert x.shape[1] % n == 0, f"H={x.shape[1]} not divisible by mesh axis {n}"

    def local(xl: jnp.ndarray, wl: jnp.ndarray) -> jnp.ndarray:
        idx = lax.axis_index(axis)
        top = xl[:, :r]          # rows a neighbor needs below its shard
        bot = xl[:, -r:]
        # shard i receives the bottom rows of shard i-1 and top rows of i+1
        from_prev = lax.ppermute(bot, axis, [(i, (i + 1) % n) for i in range(n)])
        from_next = lax.ppermute(top, axis, [(i, (i - 1) % n) for i in range(n)])
        from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
        from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
        xe = jnp.concatenate([from_prev, xl, from_next], axis=1)
        dn = lax.conv_dimension_numbers(xe.shape, wl.shape, ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            xe, wl, (1, 1), [(0, 0), (r, r)], dimension_numbers=dn,
            preferred_element_type=xe.dtype)

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, axis, None, None), P()),
                   out_specs=P(None, axis, None, None))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
    return fn(xs, w)


def infer_region_sharded(model, variables, region: jnp.ndarray, mesh: Mesh,
                         axis: Optional[str] = None):
    """Whole-model spatially-partitioned inference: the region's H axis is
    sharded over a mesh axis and the FULL network runs under GSPMD, which
    inserts the conv halo exchanges and the channel-attention all-reduces
    automatically (the scaling-book recipe: annotate shardings, let XLA
    place collectives on ICI).

    This is the SPMD alternative to host-side region tiling
    (trainer.infer_region_seamless) for regions that exceed one chip's HBM:
    activations never materialize unsharded, and the result stays sharded
    for downstream sharded consumers. ``halo_conv2d`` above is the explicit
    single-op primitive; this is the production whole-model path.

    region: (B, H, W, C) with H divisible by the mesh axis size.
    Returns the SR output as a jax.Array sharded the same way.
    """
    axis = axis or mesh.axis_names[0]
    n = mesh.shape[axis]
    assert region.shape[1] % n == 0, \
        f"H={region.shape[1]} not divisible by mesh axis {axis}={n}"
    sharding = NamedSharding(mesh, P(None, axis, None, None))
    rep = NamedSharding(mesh, P())
    x = jax.device_put(region, sharding)

    # jit's trace cache is keyed on the function object — cache the wrapper
    # per (model, mesh, axis) so repeated region calls don't retrace and
    # recompile (minutes through the axon tunnel). Keyed by id(model): the
    # caller owns the model's lifetime (the trainer holds it for its life);
    # the mesh key keeps ids alive-by-association acceptable at maxsize 32.
    key = (id(model), mesh, axis)
    fn = _APPLY_CACHE.get(key)
    if fn is None:
        @jax.jit
        def fn(v, xin):
            y = model.apply(v, xin, train=False)
            return lax.with_sharding_constraint(y, sharding)
        if len(_APPLY_CACHE) >= 32:
            _APPLY_CACHE.clear()
        _APPLY_CACHE[key] = fn

    return fn(jax.device_put(variables, rep), x)
