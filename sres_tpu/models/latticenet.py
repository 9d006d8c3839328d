"""LatticeNet (reference: sres/model/latticenet/network.py): two stem convs →
4 lattice blocks (butterfly pairs combined via mean+std channel attention) →
reverse-fusion 1×1 compress stages → conv + pixel-shuffle tail."""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import Conv
from sres_tpu.models.registry import resolve_parms
from sres_tpu.ops.shuffle import pixel_shuffle


class CC(nn.Module):
    """Combined mean+std channel attention (reference: latticenet/network.py:75)."""
    channels: int
    reduction: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        ca_mean = Conv(self.channels // self.reduction, 1, dtype=d)(mean)
        ca_mean = nn.relu(ca_mean)
        ca_mean = jax.nn.sigmoid(Conv(self.channels, 1, dtype=d)(ca_mean))
        # torch.std uses the unbiased (ddof=1) estimator
        n = x.shape[1] * x.shape[2]
        var = jnp.var(x.astype(jnp.float32), axis=(1, 2), keepdims=True) * (n / (n - 1))
        std = jnp.sqrt(var).astype(x.dtype)
        ca_std = Conv(self.channels // self.reduction, 1, dtype=d)(std)
        ca_std = nn.relu(ca_std)
        ca_std = jax.nn.sigmoid(Conv(self.channels, 1, dtype=d)(ca_std))
        return (ca_mean + ca_std) / 2.0


class _ConvBlock3(nn.Module):
    nfeat: int
    ndiff: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        for feats in (self.nfeat - self.ndiff, self.nfeat - self.ndiff, self.nfeat):
            x = Conv(feats, 3, dtype=d)(x)
            x = nn.leaky_relu(x, 0.05)
        return x


class LatticeBlock(nn.Module):
    nfeat: int
    ndiff: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        xs = _ConvBlock3(self.nfeat, self.ndiff, dtype=d)(x)
        fea_ca1 = CC(self.nfeat, dtype=d)(xs)
        x_ca1 = CC(self.nfeat, dtype=d)(x)
        p1z = x + fea_ca1 * xs
        q1z = xs + x_ca1 * x
        xl = _ConvBlock3(self.nfeat, self.ndiff, dtype=d)(p1z)
        fea_ca2 = CC(self.nfeat, dtype=d)(q1z)
        p3z = xl + fea_ca2 * q1z
        x_ca2 = CC(self.nfeat, dtype=d)(xl)
        q3z = q1z + x_ca2 * xl
        out = jnp.concatenate([p3z, q3z], axis=-1)
        return Conv(self.nfeat, 1, dtype=d)(out)


class _TDM(nn.Module):
    nfeat: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.relu(Conv(self.nfeat // 2, 1, dtype=self.dtype)(x))


class LatticeNet(nn.Module):
    nchannels_in: int
    nchannels_out: int
    nfeatures: int
    ndiff: int
    kernel_size: int
    scale: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        x = Conv(self.nfeatures, self.kernel_size, dtype=d)(x)
        x = Conv(self.nfeatures, self.kernel_size, dtype=d)(x)
        res1 = LatticeBlock(self.nfeatures, self.ndiff, dtype=d)(x)
        res2 = LatticeBlock(self.nfeatures, self.ndiff, dtype=d)(res1)
        res3 = LatticeBlock(self.nfeatures, self.ndiff, dtype=d)(res2)
        res4 = LatticeBlock(self.nfeatures, self.ndiff, dtype=d)(res3)
        out = jnp.concatenate([_TDM(self.nfeatures, dtype=d)(res4),
                               _TDM(self.nfeatures, dtype=d)(res3)], axis=-1)
        out = jnp.concatenate([_TDM(self.nfeatures, dtype=d)(out),
                               _TDM(self.nfeatures, dtype=d)(res2)], axis=-1)
        out = jnp.concatenate([_TDM(self.nfeatures, dtype=d)(out),
                               _TDM(self.nfeatures, dtype=d)(res1)], axis=-1)
        res = out + x
        y = Conv(self.nfeatures, 3, dtype=d)(res)
        y = Conv(self.nchannels_out * self.scale ** 2, 3, dtype=d)(y)
        y = pixel_shuffle(y, self.scale)
        return y.astype(jnp.float32)


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, dict(ndiff=16),
                      nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    return LatticeNet(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeatures=p["nfeatures"], ndiff=p["ndiff"], kernel_size=p["kernel_size"],
        scale=p["scale"], dtype=dtype,
    )
