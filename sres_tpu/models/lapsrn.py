"""LapSRN — Laplacian-pyramid SR (reference: sres/model/lapsrn/network.py).

Per ×2 stage: features go through a k2/s2 transposed conv + DoubleConv
("ConvDownscale" in the reference, which actually upsamples), the previous
pyramid result is interpolation-upsampled, and a 1×1 "crossscale" conv adds
the residual. Returns one tensor per stage (lowest first) → multiscale loss
(reference: dual_trainer.py:221-234).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import Conv, ConvTranspose, DoubleConv
from sres_tpu.models.registry import resolve_parms
from sres_tpu.ops.resize import upsample as interp_up


class ConvUpStage(nn.Module):
    features: int
    scale: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvTranspose(self.features, kernel_size=2, stride=self.scale, dtype=self.dtype)(x)
        return DoubleConv(self.features, dtype=self.dtype)(x, train)


class LapSRN(nn.Module):
    nchannels_in: int
    nchannels_out: int
    nfeatures: int
    downscale_factors: Tuple[int, ...]
    ups_mode: str = "bicubic"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        d = self.dtype
        features = DoubleConv(self.nfeatures, dtype=d)(x, train)
        results = [x]
        for usf in self.downscale_factors:
            features = ConvUpStage(self.nfeatures, usf, dtype=d)(features, train)
            xave = interp_up(results[-1].astype(jnp.float32), float(usf), self.ups_mode)
            xres = Conv(self.nchannels_out, 1, dtype=d)(features)
            results.append((xres.astype(jnp.float32) + xave))
        return tuple(r.astype(jnp.float32) for r in results[1:])


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, {}, nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    return LapSRN(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeatures=p["nfeatures"], downscale_factors=tuple(p["downscale_factors"]),
        ups_mode=p["ups_mode"], dtype=dtype,
    )
