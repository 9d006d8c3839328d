"""VDSR — very deep SR (reference: sres/model/vdsr/network.py): nearest-upsample
the LR input to HR size first, then a conv stack with a global residual."""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import BasicBlock, nearest_up
from sres_tpu.models.registry import resolve_parms


class VDSR(nn.Module):
    nchannels_in: int
    nchannels_out: int
    nfeatures: int
    nlayers: int
    kernel_size: int
    scale: int
    use_bias: bool = True
    batch_norm: bool = False
    quantization: Optional[str] = None  # 'int8': AQT stack convs (opt-in)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d, q = self.dtype, self.quantization
        x = nearest_up(x, self.scale)
        y = BasicBlock(self.nfeatures, self.kernel_size, self.use_bias,
                       self.batch_norm, nn.relu, dtype=d, quant=q)(x, train)
        for _ in range(self.nlayers - 2):
            y = BasicBlock(self.nfeatures, self.kernel_size, self.use_bias,
                           self.batch_norm, nn.relu, dtype=d, quant=q)(y, train)
        y = BasicBlock(self.nchannels_out, self.kernel_size, self.use_bias,
                       self.batch_norm, None, dtype=d)(y, train)
        return (x + y).astype(jnp.float32)


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, dict(quantization=None),
                      nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    return VDSR(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeatures=p["nfeatures"], nlayers=p["nlayers"], kernel_size=p["kernel_size"],
        scale=p["scale"], use_bias=p["bias"], batch_norm=p["batch_norm"],
        quantization=p["quantization"], dtype=dtype,
    )
