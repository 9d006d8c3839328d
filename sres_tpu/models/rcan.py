"""RCAN — residual channel-attention network, the flagship/north-star model
(reference: sres/model/rcan/network.py).

Structure: head conv → nlayers × ResidualGroup(nblocks × RCAB) → body conv →
global skip → pixel-shuffle upsampler ×scale → tail conv. Channel-attention
reduction comes from the ``cbottleneck`` hyperparameter (rcan/network.py:14
passes it as the RCAB ``reduction``).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import Conv, ResidualGroup, SPUpsample
from sres_tpu.models.registry import resolve_parms


class RCAN(nn.Module):
    nchannels_in: int
    nchannels_out: int
    nfeatures: int
    nlayers: int            # residual groups
    nblocks: int            # RCABs per group
    cbottleneck: int        # channel-attention reduction
    kernel_size: int
    scale: int
    use_bias: bool = True
    fused: bool = False       # use the fused-RCAB Pallas kernel
    pervar_heads: bool = False  # separate output conv per target variable
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        x = Conv(self.nfeatures, self.kernel_size, use_bias=self.use_bias, dtype=d)(x)
        res = x
        for _ in range(self.nlayers):
            if self.fused:
                from sres_tpu.models.fused import FusedRCAB
                g = res
                for _ in range(self.nblocks):
                    g = FusedRCAB(self.nfeatures, self.cbottleneck, dtype=d)(g)
                g = Conv(self.nfeatures, self.kernel_size, dtype=d)(g)
                res = res + g
            else:
                res = ResidualGroup(self.nfeatures, self.kernel_size,
                                    self.cbottleneck, self.nblocks, dtype=d)(res)
        res = Conv(self.nfeatures, self.kernel_size, use_bias=self.use_bias, dtype=d)(res)
        res = res + x
        y = SPUpsample(self.scale, self.nfeatures, dtype=d)(res)
        if self.pervar_heads:
            # shared trunk + independent per-variable reconstruction heads
            # (BASELINE config #3: multi-variable joint SR)
            heads = [Conv(1, self.kernel_size, use_bias=self.use_bias, dtype=d)(y)
                     for _ in range(self.nchannels_out)]
            y = jnp.concatenate(heads, axis=-1)
        else:
            y = Conv(self.nchannels_out, self.kernel_size, use_bias=self.use_bias, dtype=d)(y)
        return y.astype(jnp.float32)


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, dict(cbottleneck=2, nblocks=20, fused=False,
                                      pervar_heads=False),
                      nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    return RCAN(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeatures=p["nfeatures"], nlayers=p["nlayers"], nblocks=p["nblocks"],
        cbottleneck=p["cbottleneck"], kernel_size=p["kernel_size"],
        scale=p["scale"], use_bias=p["bias"], fused=bool(p["fused"]),
        pervar_heads=bool(p["pervar_heads"]), dtype=dtype,
    )
