"""EDSR — enhanced deep residual SR (reference: sres/model/edsr/network.py):
head conv → nlayers × ResBlock → body conv → global skip → sub-pixel tail."""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import (Conv, ResBlock, SPUpsample, pack_tiles,
                                    unpack_tiles)
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
    lane_pack: int = 1        # tiles packed per image in the trunk (PERF.md)
    quantization: Optional[str] = None  # 'int8': AQT trunk convs (opt-in)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        x = Conv(self.nfeatures, self.kernel_size, use_bias=self.use_bias, dtype=d)(x)
        pk = self.lane_pack if x.shape[0] >= self.lane_pack else 1
        bpad = (-x.shape[0]) % pk
        if pk > 1 and bpad:
            x = jnp.concatenate([x, jnp.zeros((bpad,) + x.shape[1:], x.dtype)], 0)
        res = pack_tiles(x, pk) if pk > 1 else x
        skip = res
        for _ in range(self.nlayers):
            res = ResBlock(self.nfeatures, self.kernel_size, self.use_bias,
                           self.res_scale, dtype=d, pack=pk,
                           quant=self.quantization)(res)
        res = Conv(self.nfeatures, self.kernel_size, use_bias=self.use_bias,
                   dtype=d, pack=pk, quant=self.quantization)(res)
        res = res + skip
        if pk > 1:
            res = unpack_tiles(res, pk)
            if bpad:
                res = res[: res.shape[0] - bpad]
        y = SPUpsample(self.scale, self.nfeatures, dtype=d)(res)
        y = Conv(self.nchannels_out, self.kernel_size, use_bias=self.use_bias, dtype=d)(y)
        return y.astype(jnp.float32)


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, dict(lane_pack=1, quantization=None),
                      nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    return EDSR(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeatures=p["nfeatures"], nlayers=p["nlayers"], kernel_size=p["kernel_size"],
        scale=p["scale"], res_scale=p["res_scale"], use_bias=p["bias"],
        lane_pack=int(p["lane_pack"]), quantization=p["quantization"], dtype=dtype,
    )
