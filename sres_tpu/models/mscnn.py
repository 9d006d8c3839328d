"""MSCNN — multiscale CNN (reference: sres/model/mscnn/network.py): LapSRN's
pyramid with an optional UNet feature stage first (depth = nlayers)."""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import Conv, DoubleConv
from sres_tpu.models.lapsrn import ConvUpStage
from sres_tpu.models.registry import resolve_parms
from sres_tpu.models.unet import UNetCore
from sres_tpu.ops.resize import upsample as interp_up


class MSCNN(nn.Module):
    nchannels_in: int
    nchannels_out: int
    nfeatures: int
    unet_depth: int
    downscale_factors: Tuple[int, ...]
    ups_mode: str = "bicubic"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        d = self.dtype
        features = DoubleConv(self.nfeatures, dtype=d)(x, train)
        if self.unet_depth > 0:
            features = UNetCore(self.nfeatures, self.unet_depth, dtype=d)(features, train)
        results = [x]
        for usf in self.downscale_factors:
            features = ConvUpStage(self.nfeatures, usf, dtype=d)(features, train)
            xave = interp_up(results[-1].astype(jnp.float32), float(usf), self.ups_mode)
            xres = Conv(self.nchannels_out, 1, dtype=d)(features)
            results.append(xres.astype(jnp.float32) + xave)
        return tuple(r.astype(jnp.float32) for r in results[1:])


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, {}, nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    return MSCNN(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeatures=p["nfeatures"], unet_depth=p["nlayers"],
        downscale_factors=tuple(p["downscale_factors"]), ups_mode=p["ups_mode"], dtype=dtype,
    )
