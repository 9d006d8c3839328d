"""lax.scan'd RCAN trunk (``model.scan_groups: true``).

The flagship RCAN-10-20-64 unrolls 410 trunk convolutions into the jitted
step's HLO; through the axon tunnel that compiles in 3-10 minutes (CLAUDE.md)
and the reference's largest configs take longer still. Scanning the 10
identical residual groups — and the 20 identical RCABs inside each — with
their params stacked on a leading axis collapses the trunk to ONE group body
(5 convs) in the compiled module, the idiomatic XLA answer to repeated
structure (compile once, loop on device).

The param tree is UNCHANGED: the same flax child modules declare the
weights in collect mode (models/layers.py ResidualGroup/RCAB/CALayer
``collect=True``, the same pattern the winograd chain kernels use), and the
body below replays layers.py's exact op sequence and dtype casts on the
collected block-diagonal weights, so outputs match the unrolled path
bit-for-bit in bf16 and to one-ulp conv-algorithm noise in f32 (measured
1.6e-7 max abs on CPU — XLA may pick a different conv algorithm inside a
while loop; tests/test_scan_trunk.py), and any checkpoint/torch-interop
artifact works in either mode.

Replaces the loop structure of the reference's RCAN trunk
(sres/model/rcan/network.py:67-80) — behavior, not code.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax


def _conv(x: jnp.ndarray, big: jnp.ndarray, bias: jnp.ndarray, dt) -> jnp.ndarray:
    """Exact replay of layers._PackedConvCore's application (quant=None):
    conv in dt with preferred_element_type dt, then the packed bias."""
    k = big.shape[0]
    pad = [(k // 2, k // 2)] * 2
    dn = lax.conv_dimension_numbers(x.shape, big.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x.astype(dt), big.astype(dt), (1, 1), pad,
        dimension_numbers=dn, preferred_element_type=dt).astype(dt)
    return y + bias.astype(dt)


def _rcab(x: jnp.ndarray, p: dict, dt) -> jnp.ndarray:
    """layers.RCAB on collected weights: conv+relu -> conv -> CA -> skip."""
    r = jax.nn.relu(_conv(x, p["w"][0], p["b"][0], dt))
    r = _conv(r, p["w"][1], p["b"][1], dt)
    # layers.CALayer: mean in the activation dtype, 1x1 convs, sigmoid gate
    y = jnp.mean(r, axis=(1, 2), keepdims=True)
    y = jax.nn.relu(_conv(y, p["cw1"], p["cb1"], dt))
    y = _conv(y, p["cw2"], p["cb2"], dt)
    return x + r * jax.nn.sigmoid(y)


def scan_trunk(x: jnp.ndarray, groups: dict, dt: Optional[Any],
               remat: bool = False) -> jnp.ndarray:
    """Apply nlayers residual groups (nblocks RCABs + trailing conv + group
    skip each) as scan-over-groups x scan-over-blocks.

    groups: the pytree of stacked collect-mode params — every leaf carries a
    leading (nlayers,) axis, RCAB operands an (nlayers, nblocks, ...) one
    (see layers.ResidualGroup collect). remat=True checkpoints each group
    body (model.remat_trunk semantics).
    """
    dt = dt or x.dtype

    def rcab_body(r, p):
        return _rcab(r, p, dt), None

    def group_body(carry, gp):
        r = lax.scan(rcab_body, carry,
                     {k: gp[k] for k in ("w", "b", "cw1", "cb1", "cw2", "cb2")})[0]
        r = _conv(r, gp["wt"], gp["bt"], dt)
        return carry + r, None

    body = jax.checkpoint(group_body) if remat else group_body
    return lax.scan(body, x, groups)[0]


def scan_resblocks(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                   res_scale: float, dt: Optional[Any],
                   remat: bool = False) -> jnp.ndarray:
    """EDSR trunk: scan over nlayers identical ResBlocks (conv-relu-conv
    ×res_scale + skip — layers.ResBlock) with stacked collect-mode weights
    w (nlayers, 2, k, k, Cp, Cp) / b (nlayers, 2, Cp). Same
    param-tree-preserving contract as scan_trunk. remat checkpoints each
    block body so grad saves only the stacked block inputs (scan-with-grad
    otherwise stacks every body intermediate over nlayers — the RCAN-scale
    version of that measured a 19.4 GB on-chip OOM)."""
    dt = dt or x.dtype

    def block_body(r, p):
        t = jax.nn.relu(_conv(r, p[0][0], p[1][0], dt))
        t = _conv(t, p[0][1], p[1][1], dt)
        return r + t * res_scale, None

    body = jax.checkpoint(block_body) if remat else block_body
    return lax.scan(body, x, (w, b))[0]
