"""GSPMD composition for the batch-parallel Pallas kernels.

Every kernel in ops/pallas/winograd_conv.py / wino_group_grad.py /
window_attention.py is
batch-parallel along the leading packed-tile/window axis ``t`` (grid
dimension 0);
weight/CA operands are replicated; weight- and bias-gradient outputs are
sums over ``t``. Without help, GSPMD treats a ``pallas_call`` as opaque and
all-gathers its operands onto every device — round 2 worked around that
with ``pipeline.shard_map``. This module instead registers the sharding
contract with the partitioner (``jax.experimental.custom_partitioning``,
Shardy sharding-rule form), so a dp-sharded ``jit`` runs each kernel
per-shard directly:

- operand 0 keeps (only) its leading-axis sharding; all other operands are
  replicated (the partitioner inserts any reshard needed),
- batchwise outputs inherit operand 0's leading-axis sharding,
- summed outputs (dU/db/CA grads) are ``psum``-ed over the batch mesh axes
  inside the partitioned body and marked replicated,
- the per-kernel sample block size ``bs`` is re-chosen for the LOCAL shard
  length (a global batch divisible by 4 may shard to a local one that
  isn't).

Kill switch: ``SRES_PALLAS_GSPMD=0`` (legacy alias ``SRES_WINO_GSPMD=0``)
routes callers back to the raw calls (pipeline.shard_map remains the
guaranteed-manual alternative).

The kernels implement the reference RCAN/EDSR trunks
(sres/model/rcan/network.py:50-80, sres/model/common/residual.py:28); this
module only changes how they compose with jax.sharding meshes.
"""
from __future__ import annotations

import functools
import os

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def gspmd_enabled() -> bool:
    """Kill switch for ALL pallas sharding contracts (winograd + window
    attention): SRES_PALLAS_GSPMD=0; SRES_WINO_GSPMD is the legacy alias."""
    legacy = os.environ.get("SRES_WINO_GSPMD", "1")
    return os.environ.get("SRES_PALLAS_GSPMD", legacy) == "1"


def _batch_axes(sharding):
    """Mesh axis name(s) sharding the leading dim, or None."""
    spec = getattr(sharding, "spec", None)
    if not spec:
        return None
    return spec[0]


def batch_partitioned(static_argnums, rule, summed=(), local_bs_argnum=None,
                      batch_args=(0,)):
    """Wrap ``fun`` (leading-axis batch-parallel) with custom_partitioning.

    static_argnums: positions of non-array args (inspect-resolved by jax).
    rule: Shardy einsum-like sharding rule; the batch factor MUST be the
      first factor of every batchwise operand and output.
    summed: output indices that are sums over the batch axis (psum-ed in
      the partitioned body, replicated outside). Outputs are indexed over
      the flattened output tuple; a single-output fun uses index 0.
    local_bs_argnum: index (into the FULL arg list) of a sample-block-size
      static to re-pick for the local shard length (largest d ≤ bs with
      t_local % d == 0).
    batch_args: OPERAND indices (into the array-operand list, statics
      excluded) whose leading dim is the batch axis; all other operands
      are replicated.
    """

    def deco(fun):
        cp = custom_partitioning(fun, static_argnums=static_argnums)

        def partition(*all_args):
            n_static = len(static_argnums)
            statics = all_args[:n_static]
            mesh, arg_shapes, result_shape = all_args[n_static:]
            axes = _batch_axes(arg_shapes[0].sharding)

            def lead_sharded(shape):
                return NamedSharding(
                    mesh, P(axes, *([None] * (len(shape.shape) - 1))))

            def repl(shape):
                return NamedSharding(mesh, P(*([None] * len(shape.shape))))

            arg_shardings = tuple(
                lead_sharded(s) if i in batch_args else repl(s)
                for i, s in enumerate(arg_shapes))
            single = not isinstance(result_shape, (tuple, list))
            outs = (result_shape,) if single else tuple(result_shape)
            out_shardings = tuple(
                repl(s) if i in summed else lead_sharded(s)
                for i, s in enumerate(outs))
            if single:
                out_shardings = out_shardings[0]

            # statics arrive in positional order; rebuild the full arg list
            # inside lower_fn (operands fill the non-static slots in order)
            def lower_fn(*operands):
                full = []
                it_ops = iter(operands)
                it_sts = iter(statics)
                nargs = len(operands) + n_static
                for i in range(nargs):
                    full.append(next(it_sts) if i in static_argnums
                                else next(it_ops))
                if local_bs_argnum is not None:
                    t_local = operands[0].shape[0]
                    bs = full[local_bs_argnum]
                    full[local_bs_argnum] = next(
                        d for d in range(min(bs, t_local), 0, -1)
                        if t_local % d == 0)
                res = fun(*full)
                if axes is None or not summed:
                    return res
                rs = list(res) if isinstance(res, (tuple, list)) else [res]
                for i in summed:
                    rs[i] = jax.lax.psum(rs[i], axes)
                return tuple(rs) if isinstance(res, (tuple, list)) else rs[0]

            return mesh, lower_fn, out_shardings, arg_shardings

        cp.def_partition(partition=partition, sharding_rule=rule)

        @functools.wraps(fun)
        def wrapper(*args):
            if not gspmd_enabled():
                return fun(*args)
            return cp(*args)

        wrapper.raw = fun
        return wrapper

    return deco
