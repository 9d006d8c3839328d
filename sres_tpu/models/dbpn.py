"""DBPN — deep back-projection network (reference: sres/model/dbpn/network.py).

Alternating up/down DenseProjection units with dense concatenation; the
projection convs use the scale-specific (kernel, stride, padding) spec
{2:(6,2,2), 4:(8,4,2), 8:(12,8,2)} (reference: dbpn/blocks.py:4).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import Conv, ConvTranspose, PReLU
from sres_tpu.models.registry import resolve_parms

CONV_SPEC = {2: (6, 2, 2), 4: (8, 4, 2), 8: (12, 8, 2)}


class _Proj(nn.Module):
    features: int
    scale: int
    up: bool
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p = CONV_SPEC[self.scale]
        if self.up:
            y = ConvTranspose(self.features, k, s, p, dtype=self.dtype)(x)
        else:
            y = Conv(self.features, k, stride=s, padding=[(p, p), (p, p)], dtype=self.dtype)(x)
        return PReLU(channelwise=True, dtype=self.dtype)(y)


class DenseProjection(nn.Module):
    features: int
    scale: int
    up: bool
    bottleneck: bool
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        if self.bottleneck:
            x = Conv(self.features, 1, dtype=d)(x)
            x = PReLU(channelwise=True, dtype=d)(x)
        inter = x.shape[-1]
        a0 = _Proj(self.features, self.scale, self.up, dtype=d)(x)
        b0 = _Proj(inter, self.scale, not self.up, dtype=d)(a0)
        e = b0 - x
        a1 = _Proj(self.features, self.scale, self.up, dtype=d)(e)
        return a0 + a1


class DBPN(nn.Module):
    nchannels_in: int
    nchannels_out: int
    nfeatures: int
    nprojection: int
    depth: int
    scale: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        x = Conv(self.nfeatures, 3, dtype=d)(x)
        x = PReLU(channelwise=True, dtype=d)(x)
        x = Conv(self.nprojection, 1, dtype=d)(x)
        x = PReLU(channelwise=True, dtype=d)(x)

        h_list, l_list = [], []
        for i in range(self.depth - 1):
            inp = x if i == 0 else jnp.concatenate(l_list, axis=-1)
            h_list.append(DenseProjection(self.nprojection, self.scale, True,
                                          bottleneck=i > 1, dtype=d)(inp))
            l_list.append(DenseProjection(self.nprojection, self.scale, False,
                                          bottleneck=i != 0, dtype=d)(jnp.concatenate(h_list, axis=-1)))
        h_list.append(DenseProjection(self.nprojection, self.scale, True,
                                      bottleneck=self.depth - 1 > 1, dtype=d)(jnp.concatenate(l_list, axis=-1)))
        out = Conv(self.nchannels_out, 3, dtype=d)(jnp.concatenate(h_list, axis=-1))
        return out.astype(jnp.float32)


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, dict(nprojectionfeatures=32, depth=2),
                      nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    return DBPN(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeatures=p["nfeatures"], nprojection=p["nprojectionfeatures"],
        depth=p["depth"], scale=p["scale"], dtype=dtype,
    )
