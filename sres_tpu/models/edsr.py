"""EDSR — enhanced deep residual SR (reference: sres/model/edsr/network.py):
head conv → nlayers × ResBlock → body conv → global skip → sub-pixel tail."""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import Conv, ResBlock, SPUpsample
from sres_tpu.models.registry import resolve_parms


class EDSR(nn.Module):
    nchannels_in: int
    nchannels_out: int
    nfeatures: int
    nlayers: int
    kernel_size: int
    scale: int
    res_scale: float = 1.0
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        x = Conv(self.nfeatures, self.kernel_size, use_bias=self.use_bias, dtype=d)(x)
        res = x
        for _ in range(self.nlayers):
            res = ResBlock(self.nfeatures, self.kernel_size, self.use_bias,
                           self.res_scale, dtype=d)(res)
        res = Conv(self.nfeatures, self.kernel_size, use_bias=self.use_bias, dtype=d)(res)
        res = res + x
        y = SPUpsample(self.scale, self.nfeatures, dtype=d)(res)
        y = Conv(self.nchannels_out, self.kernel_size, use_bias=self.use_bias, dtype=d)(y)
        return y.astype(jnp.float32)


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, {}, nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    return EDSR(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeatures=p["nfeatures"], nlayers=p["nlayers"], kernel_size=p["kernel_size"],
        scale=p["scale"], res_scale=p["res_scale"], use_bias=p["bias"], dtype=dtype,
    )
