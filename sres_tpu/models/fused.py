"""Flax wrapper for the fused RCAB Pallas kernel (ops/pallas/rcab.py).

Parameter shapes/inits match the unfused composition (Conv kernels
(3,3,C,C) with torch-default init) so either path trains identically; the
pytree layout differs (flat per-RCAB params instead of nested Conv modules).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import torch_bias_init, torch_kernel_init
from sres_tpu.ops.pallas.rcab import fused_rcab


class FusedRCAB(nn.Module):
    features: int
    reduction: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c, cr = self.features, self.features // self.reduction
        fan33 = c * 9
        w1 = self.param("w1", torch_kernel_init, (3, 3, c, c), jnp.float32)
        b1 = self.param("b1", lambda k, s, d: torch_bias_init(k, s, d, fan33), (1, c), jnp.float32)
        w2 = self.param("w2", torch_kernel_init, (3, 3, c, c), jnp.float32)
        b2 = self.param("b2", lambda k, s, d: torch_bias_init(k, s, d, fan33), (1, c), jnp.float32)
        wd = self.param("wd", torch_kernel_init, (c, cr), jnp.float32)
        bd = self.param("bd", lambda k, s, d: torch_bias_init(k, s, d, c), (1, cr), jnp.float32)
        wu = self.param("wu", torch_kernel_init, (cr, c), jnp.float32)
        bu = self.param("bu", lambda k, s, d: torch_bias_init(k, s, d, cr), (1, c), jnp.float32)
        cd = self.dtype or x.dtype
        xd = x.astype(cd)
        y = fused_rcab(xd, w1.astype(cd), b1.astype(jnp.float32),
                       w2.astype(cd), b2.astype(jnp.float32),
                       wd.astype(cd), bd.astype(jnp.float32),
                       wu.astype(cd), bu.astype(jnp.float32))
        return y.astype(x.dtype)
