"""SRDN (reference: sres/model/srdn/network.py): conv+PReLU stem →
nlayers × BN-residual blocks → BN global-residual conv → per-factor upsampling
('replicate' nearest+conv or transposed conv) → wide output conv.

SRDN's nfeatures/kernel_size config values are dicts
({hidden, upscale} / {features, hidden, output}) per the reference schema.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import BatchNorm, BNResidual, Conv, PReLU, UpsampleStage
from sres_tpu.models.registry import resolve_parms


class SRDN(nn.Module):
    nchannels_in: int
    nchannels_out: int
    nfeat_hidden: int
    nfeat_upscale: int
    nlayers: int
    k_features: int
    k_hidden: int
    k_output: int
    downscale_factors: Tuple[int, ...]
    usmethod: str = "replicate"
    momentum: float = 0.5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        f = Conv(self.nfeat_hidden, self.k_features, dtype=d)(x)
        f = PReLU(init=0.0, dtype=d)(f)
        r = f
        for _ in range(self.nlayers):
            r = BNResidual(self.nfeat_hidden, self.k_hidden, self.momentum, dtype=d)(r, train)
        gr = Conv(self.nfeat_hidden, self.k_hidden, dtype=d)(r)
        gr = BatchNorm(not train, self.momentum, dtype=d)(gr)
        y = f + gr
        for sf in self.downscale_factors:
            y = UpsampleStage(self.nfeat_upscale, sf, self.usmethod, self.k_hidden, dtype=d)(y)
        z = Conv(self.nchannels_out, self.k_output, dtype=d)(y)
        return z.astype(jnp.float32)


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, dict(usmethod="replicate", momentum=0.5),
                      nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    nf: Dict[str, int] = dict(p["nfeatures"])
    ks: Dict[str, int] = dict(p["kernel_size"])
    return SRDN(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeat_hidden=nf["hidden"], nfeat_upscale=nf["upscale"], nlayers=p["nlayers"],
        k_features=ks["features"], k_hidden=ks["hidden"], k_output=ks["output"],
        downscale_factors=tuple(p["downscale_factors"]), usmethod=p["usmethod"],
        momentum=p["momentum"], dtype=dtype,
    )
