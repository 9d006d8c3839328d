"""UNet SR (reference: sres/model/unet/network.py): DoubleConv stem → UNet
encoder/decoder of depth nlayers (with optional temporal-feature injection at
the bottleneck) → ConvTranspose upscale chain → 1×1 output conv."""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import Conv, ConvTranspose, DoubleConv, max_pool2
from sres_tpu.models.registry import resolve_parms


class UNetCore(nn.Module):
    """Shared UNet encoder/decoder (reference: sres/model/common/unet.py:7).
    ``ntemporal`` > 0 reserves bottleneck channels for time features injected
    by concat (reference: unet/network.py:44-56)."""
    nfeatures: int
    depth: int
    ntemporal: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 temporal: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = self.dtype
        skips = []
        for il in range(self.depth):
            skips.insert(0, x)
            ntf = self.ntemporal if il == self.depth - 1 else 0
            x = max_pool2(x)
            x = DoubleConv(self.nfeatures * (2 ** il) * 2 - ntf, dtype=d)(x, train)
        if self.ntemporal > 0 and temporal is not None:
            b, h, w, _ = x.shape
            t = jnp.broadcast_to(temporal[:, None, None, :], (b, h, w, temporal.shape[-1]))
            x = jnp.concatenate([x, t.astype(x.dtype)], axis=-1)
        for il in range(self.depth):
            usf = 2 ** (self.depth - il - 1)
            x = ConvTranspose(self.nfeatures * usf, kernel_size=2, stride=2, dtype=d)(x)
            x = jnp.concatenate([x, skips[il]], axis=-1)
            x = DoubleConv(self.nfeatures * usf, dtype=d)(x, train)
        return x


class UNetSR(nn.Module):
    nchannels_in: int
    nchannels_out: int
    nfeatures: int
    depth: int
    downscale_factors: Tuple[int, ...]
    ntemporal: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 temporal: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = self.dtype
        x = DoubleConv(self.nfeatures, dtype=d)(x, train)
        x = UNetCore(self.nfeatures, self.depth, self.ntemporal, dtype=d)(x, train, temporal)
        for _ in self.downscale_factors:
            x = ConvTranspose(self.nfeatures, kernel_size=2, stride=2, dtype=d)(x)
            x = DoubleConv(self.nfeatures, dtype=d)(x, train)
        y = Conv(self.nchannels_out, 1, dtype=d)(x)
        return y.astype(jnp.float32)


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, dict(use_temporal_features=False),
                      nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    ntemporal = 0
    if p.get("use_temporal_features") and temporal_features is not None:
        ntemporal = int(temporal_features.shape[-1])
    return UNetSR(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeatures=p["nfeatures"], depth=p["nlayers"],
        downscale_factors=tuple(p["downscale_factors"]), ntemporal=ntemporal, dtype=dtype,
    )
