"""ESRT — hybrid CNN + efficient-transformer SR
(reference: sres/model/esrt/network.py + sres/model/common/{transformer,tools}.py).

Each ``Un`` block runs three Updownblock hi/lo-frequency encoders and a
multi-head attention (``MLABlock``) over 3×3-unfolded patch tokens. The
reference's ``EffAttention`` chunks Q/K/V into 4 *paired* splits — i.e. each
quarter of the token sequence attends only within itself (block-diagonal
local attention, a memory trick; SURVEY.md §5.7). On TPU this is expressed by
folding the chunk axis into the batch so all four blocks run as one batched
MXU matmul instead of a Python loop of four.

Patch unfold/fold (torch Unfold/Fold equivalents) are written as 9 static
shifted slices — XLA fuses them; no gathers.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import CALayer, Conv, PReLU, Scale, SPUpsample, avg_pool2
from sres_tpu.models.registry import resolve_parms
from sres_tpu.ops.resize import resize


def extract_patches_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC (B,H,W,C) → (B, H*W, C*9) tokens, 'same' zero padding.
    Token feature order matches torch Unfold: c*9 + dy*3 + dx."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(3) for dx in range(3)]
    # (B,H,W,9,C) -> (B,H,W,C,9) so feature index is c*9 + (dy*3+dx)
    pat = jnp.stack(taps, axis=3).transpose(0, 1, 2, 4, 3)
    return pat.reshape(b, h * w, c * 9)


def fold_patches_3x3(tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, H*W, C*9) → NHWC (B,H,W,C): overlap-add of the 3×3 taps
    (torch Fold with padding=1, stride=1)."""
    b, l, c9 = tokens.shape
    c = c9 // 9
    pat = tokens.reshape(b, h, w, c, 3, 3)
    out = jnp.zeros((b, h + 2, w + 2, c), tokens.dtype)
    for dy in range(3):
        for dx in range(3):
            out = out.at[:, dy:dy + h, dx:dx + w, :].add(pat[:, :, :, :, dy, dx])
    return out[:, 1:1 + h, 1:1 + w, :]


class OneConv(nn.Module):
    features: int       # module width (input/output channels)
    growth: int
    relu: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        y = Conv(self.growth, 3, dtype=d)(x)
        if self.relu:
            y = PReLU(channelwise=True, dtype=d)(y)
        y = Conv(self.features, 3, dtype=d)(y)
        return Scale(1.0)(x) + Scale(1.0)(y)


class OneModule(nn.Module):
    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d, nf = self.dtype, self.features
        x1 = OneConv(nf, nf // 2, dtype=d)(x)
        x2 = OneConv(nf, nf // 2, dtype=d)(x1)
        cat = jnp.concatenate([Scale(1.0)(x2), Scale(1.0)(x1)], axis=-1)
        y = Conv(nf, 1, use_bias=False, dtype=d)(cat)        # alise (1x1)
        y = nn.relu(y)                                       # BasicConv relu=True default
        y = CALayer(nf, 16, dtype=d)(y)
        y = Conv(nf, 3, use_bias=False, dtype=d)(y)          # layer4
        y = nn.relu(y)
        return Scale(1.0)(x) + Scale(1.0)(y)


class Updownblock(nn.Module):
    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d, nf = self.dtype, self.features
        x1 = OneModule(nf, dtype=d)(x)
        x2 = avg_pool2(x1)
        up = resize(x2.astype(jnp.float32), (x.shape[1], x.shape[2]),
                    "bilinear", align_corners=True).astype(x1.dtype)
        high = x1 - up
        low = x2
        decoder_low = OneModule(nf, dtype=d)
        for _ in range(5):
            low = decoder_low(low)
        high1 = OneModule(nf, dtype=d)(high)
        x4 = resize(low.astype(jnp.float32), (x.shape[1], x.shape[2]),
                    "bilinear", align_corners=True).astype(x1.dtype)
        cat = jnp.concatenate([x4, high1], axis=-1)
        y = Conv(nf, 1, use_bias=False, dtype=d)(cat)        # alise2
        y = nn.relu(y)                                       # BasicConv relu=True default
        y = CALayer(nf, 16, dtype=d)(y)
        y = OneModule(nf, dtype=d)(y)                         # alise
        return y + x


class EffAttention(nn.Module):
    """Block-local efficient attention (reference: common/transformer.py:76).
    The 4 Q/K/V quarter-splits become a folded batch dim → one batched matmul."""
    dim: int
    num_heads: int = 8
    nsplits: int = 4
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        b, n, _ = x.shape
        half = self.dim // 2
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        x = nn.Dense(half, use_bias=False, dtype=d)(x)        # reduce
        qkv = nn.Dense(half * 3, use_bias=False, dtype=d)(x)
        hd = half // self.num_heads
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                       # (b, heads, n, hd)
        assert n % self.nsplits == 0, f"token count {n} not divisible by {self.nsplits}"
        ns = n // self.nsplits
        q = q.reshape(b, self.num_heads, self.nsplits, ns, hd)
        k = k.reshape(b, self.num_heads, self.nsplits, ns, hd)
        v = v.reshape(b, self.num_heads, self.nsplits, ns, hd)
        attn = jnp.einsum("bhsqd,bhskd->bhsqk", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhsqk,bhskd->bhsqd", attn, v)
        out = out.reshape(b, self.num_heads, n, hd).transpose(0, 2, 1, 3).reshape(b, n, half)
        return nn.Dense(self.dim, dtype=d)(out)               # proj


class MLABlock(nn.Module):
    """Patch-token transformer block (reference: common/transformer.py:131)."""
    dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x_nhwc: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        tokens = extract_patches_3x3(x_nhwc)
        y = nn.LayerNorm(dtype=d)(tokens)
        tokens = tokens + EffAttention(self.dim, dtype=d)(y)
        y = nn.LayerNorm(dtype=d)(tokens)
        h = nn.Dense(self.dim // 4, dtype=d)(y)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=d)(h)
        return tokens + h


class Un(nn.Module):
    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d, nf = self.dtype, self.features
        x1 = Updownblock(nf, dtype=d)(x)
        x2 = Updownblock(nf, dtype=d)(x1)
        x3 = Updownblock(nf, dtype=d)(x2)
        h, w = x3.shape[1], x3.shape[2]
        red = Conv(nf, 3, dtype=d)(jnp.concatenate([x1, x2, x3], axis=-1))
        out = MLABlock(dim=nf * 9, dtype=d)(red)
        out = fold_patches_3x3(out, h, w)
        out = Conv(nf, 3, dtype=d)(out)                       # alise
        return Scale(1.0)(x) + Scale(1.0)(out)


class ESRT(nn.Module):
    nchannels_in: int
    nchannels_out: int
    nfeatures: int
    nlayers: int
    kernel_size: int
    scale: int
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d, nf = self.dtype, self.nfeatures
        x1 = Conv(nf, self.kernel_size, use_bias=self.use_bias, dtype=d)(x)
        res2 = x1
        body_out = [Un(nf, dtype=d)(x1) for _ in range(self.nlayers)]
        res1 = Conv(nf, self.kernel_size, use_bias=self.use_bias, dtype=d)(
            jnp.concatenate(body_out, axis=-1))                # reduce
        tail = SPUpsample(self.scale, nf, dtype=d)(res1)
        tail = Conv(self.nchannels_out, self.kernel_size, use_bias=self.use_bias, dtype=d)(tail)
        up = SPUpsample(self.scale, nf, dtype=d)(res2)
        up = Conv(self.nchannels_out, 3, use_bias=False, dtype=d)(up)
        up = nn.relu(up)
        return (up + tail).astype(jnp.float32)


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, {}, nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    return ESRT(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeatures=p["nfeatures"], nlayers=p["nlayers"], kernel_size=p["kernel_size"],
        scale=p["scale"], use_bias=p["bias"], dtype=dtype,
    )
