"""Flax wrappers for the fused Pallas kernels.

FusedResidualGroup wraps ops/pallas/residual_group.py — the lane-packed
whole-group kernel (round 2). The round-1 per-RCAB kernel (ops/pallas/rcab.py)
was removed: its im2col/tap-construction strategies lose to XLA's conv
emitter under Mosaic codegen (PERF.md), and the group kernel supersedes it.

Parameter shapes/inits match the unfused composition so either path trains
identically; the pytree layout is flat per-group stacks (converters below).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import torch_bias_init, torch_kernel_init


class FusedResidualGroup(nn.Module):
    """Whole residual group through the lane-packed Pallas kernel
    (ops/pallas/residual_group.py). Input activations are PACKED
    (T, H, W, 128) — two tiles' channels side by side (layers.pack_tiles).

    Params are the stacked logical tensors (w1/w2: (NB,3,3,64,64), CA
    wd/wu, trailing group conv wg) with torch-default inits — identical
    math to nblocks × RCAB + conv + skip (reference rcan/network.py:67-80);
    ``residual_group_params_to_fused`` converts a nested ResidualGroup tree.
    """
    features: int            # logical features (64)
    reduction: int
    nblocks: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from sres_tpu.ops.pallas.attic.residual_group import (
            fused_residual_group, pad_to_kernel_layout, unpad_from_kernel_layout)
        c, nb = self.features, self.nblocks
        cr = c // self.reduction
        fan33 = c * 9
        stack_init = lambda init, fan: (
            lambda k, s, d=jnp.float32: jnp.stack(
                [init(kk, s[1:], d) if fan is None else
                 torch_bias_init(kk, s[1:], d, fan)
                 for kk in jax.random.split(k, s[0])]))
        w1 = self.param("w1", stack_init(torch_kernel_init, None), (nb, 3, 3, c, c))
        b1 = self.param("b1", stack_init(None, fan33), (nb, 1, c))
        w2 = self.param("w2", stack_init(torch_kernel_init, None), (nb, 3, 3, c, c))
        b2 = self.param("b2", stack_init(None, fan33), (nb, 1, c))
        wd = self.param("wd", stack_init(torch_kernel_init, None), (nb, 1, 1, c, cr))
        bd = self.param("bd", stack_init(None, c), (nb, 1, cr))
        wu = self.param("wu", stack_init(torch_kernel_init, None), (nb, 1, 1, cr, c))
        bu = self.param("bu", stack_init(None, cr), (nb, 1, c))
        wg = self.param("wg", torch_kernel_init, (3, 3, c, c), jnp.float32)
        bg = self.param("bg", lambda k, s, d=jnp.float32:
                        torch_bias_init(k, s, d, fan33), (1, c))

        t, h, w, cc = x.shape
        assert cc == 2 * c, f"FusedResidualGroup expects packed C={2*c}, got {cc}"
        cd = self.dtype or x.dtype

        def _bdiag(wm):  # (..., a, b) → (..., 2a, 2b) via concats (no scatters)
            z = jnp.zeros_like(wm)
            top = jnp.concatenate([wm, z], axis=-1)
            bot = jnp.concatenate([z, wm], axis=-1)
            return jnp.concatenate([top, bot], axis=-2)

        def bd2(wk):  # (..., 3,3,c,c) → (..., 9, 2c, 2c) block-diagonal
            return _bdiag(wk.reshape(wk.shape[:-4] + (9,) + wk.shape[-2:]))

        def bd1(wk):  # (..., 1,1,a,b) → (..., 2a, 2b) block-diagonal
            return _bdiag(wk.reshape(wk.shape[:-4] + wk.shape[-2:]))

        tile2 = lambda b: jnp.concatenate([b, b], axis=-1)
        xp = pad_to_kernel_layout(x.astype(cd))
        # checkpoint the kernel call: its custom-VJP backward re-streams
        # ~1.5 GB of per-RCAB HBM stashes per group (batch 72); without
        # remat every group's stash stays alive until the backward pass
        # and the chip OOMs. Remat re-runs one group's forward during
        # backward so only one stash is live at a time.
        import jax as _jax
        kernel = _jax.checkpoint(fused_residual_group,
                                 static_argnums=(11, 12, 13))
        y = kernel(
            xp,
            bd2(w1).astype(cd), tile2(b1).astype(jnp.float32),
            bd2(w2).astype(cd), tile2(b2).astype(jnp.float32),
            bd1(wd).astype(cd), tile2(bd).astype(jnp.float32),
            bd1(wu).astype(cd), tile2(bu).astype(jnp.float32),
            bd2(wg).astype(cd), tile2(bg).astype(jnp.float32),
            nb, h, w)
        return unpad_from_kernel_layout(y, h, w).astype(x.dtype)


def residual_group_params_to_fused(rg_params, nblocks: int):
    """Nested ResidualGroup param tree (layers.py) → FusedResidualGroup's
    stacked tree, for checkpoint interop between the two trunk paths."""
    import numpy as np
    g = lambda b, p: rg_params[f"RCAB_{b}"][p]
    stack = lambda f: jnp.stack([f(b) for b in range(nblocks)])
    return {
        "w1": stack(lambda b: g(b, "Conv_0")["Conv_0"]["kernel"]),
        "b1": stack(lambda b: g(b, "Conv_0")["Conv_0"]["bias"][None]),
        "w2": stack(lambda b: g(b, "Conv_1")["Conv_0"]["kernel"]),
        "b2": stack(lambda b: g(b, "Conv_1")["Conv_0"]["bias"][None]),
        "wd": stack(lambda b: g(b, "CALayer_0")["Conv_0"]["Conv_0"]["kernel"]),
        "bd": stack(lambda b: g(b, "CALayer_0")["Conv_0"]["Conv_0"]["bias"][None]),
        "wu": stack(lambda b: g(b, "CALayer_0")["Conv_1"]["Conv_0"]["kernel"]),
        "bu": stack(lambda b: g(b, "CALayer_0")["Conv_1"]["Conv_0"]["bias"][None]),
        "wg": rg_params["Conv_0"]["Conv_0"]["kernel"],
        "bg": rg_params["Conv_0"]["Conv_0"]["bias"][None],
    }


def rcan_params_to_fused(params, nlayers: int, nblocks: int):
    """Unfused RCAN param tree → the fused model's tree (trunk groups
    converted, everything else shared). Enables serving/resuming unfused
    checkpoints with model.fused=true."""
    out = {k: v for k, v in params.items() if not k.startswith("ResidualGroup_")}
    for g in range(nlayers):
        out[f"FusedResidualGroup_{g}"] = residual_group_params_to_fused(
            params[f"ResidualGroup_{g}"], nblocks)
    return out


def rcan_params_from_fused(params, nlayers: int, nblocks: int):
    """Inverse of rcan_params_to_fused."""
    out = {k: v for k, v in params.items()
           if not k.startswith("FusedResidualGroup_")}
    for g in range(nlayers):
        f = params[f"FusedResidualGroup_{g}"]
        group = {}
        for b in range(nblocks):
            group[f"RCAB_{b}"] = {
                "Conv_0": {"Conv_0": {"kernel": f["w1"][b], "bias": f["b1"][b, 0]}},
                "Conv_1": {"Conv_0": {"kernel": f["w2"][b], "bias": f["b2"][b, 0]}},
                "CALayer_0": {
                    "Conv_0": {"Conv_0": {"kernel": f["wd"][b], "bias": f["bd"][b, 0]}},
                    "Conv_1": {"Conv_0": {"kernel": f["wu"][b], "bias": f["bu"][b, 0]}},
                },
            }
        group["Conv_0"] = {"Conv_0": {"kernel": f["wg"], "bias": f["bg"][0]}}
        out[f"ResidualGroup_{g}"] = group
    return out
