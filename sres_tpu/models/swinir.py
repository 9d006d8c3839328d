"""SwinIR-style windowed-attention SR — the transformer config of the
rebuild's benchmark suite (BASELINE.json config #4: "Transformer SR
(SwinIR-style windowed attention) on 96×96 tiles"). Not present in the
reference zoo (its only transformer is ESRT's patch-token attention); this is
a new model family, TPU-designed:

  * window partition/merge are pure reshapes/transposes (free under XLA),
  * attention runs as batched MXU matmuls over (windows·heads) with a
    learned relative-position bias,
  * alternating blocks use shifted windows (cyclic roll + additive mask),
  * pixel-shuffle upsampler tail like the rest of the zoo.

Config (config/model/swinir.yaml): nfeatures (embed dim), nlayers (residual
swin blocks groups), nblocks (attention blocks per group), window_size,
num_heads, mlp_ratio. Requires tile sides divisible by window_size.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sres_tpu.models.layers import Conv, SPUpsample
from sres_tpu.models.registry import resolve_parms


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B,H,W,C) → (B·nw, ws², C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_merge(win: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B·nw, ws², C) → (B,H,W,C)."""
    c = win.shape[-1]
    b = win.shape[0] // ((h // ws) * (w // ws))
    x = win.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def relative_position_index(ws: int) -> np.ndarray:
    """(ws², ws²) indices into the (2ws-1)² bias table (standard swin)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nw, ws², ws²) additive mask (0 / -100) for shifted windows."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = win[:, :, None] - win[:, None, :]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, win: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = self.dtype
        nw, t, c = win.shape
        h, hd = self.num_heads, self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=d)(win)
        qkv = qkv.reshape(nw, t, 3, h, hd).transpose(2, 0, 3, 1, 4)  # (3, nw, h, t, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scores = jnp.einsum("whqd,whkd->whqk", q, k) * (hd ** -0.5)
        table = self.param("rel_bias", nn.initializers.truncated_normal(0.02),
                           ((2 * self.window_size - 1) ** 2, h), jnp.float32)
        idx = relative_position_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(t, t, h).transpose(2, 0, 1)
        scores = scores + bias.astype(scores.dtype)[None]
        if mask is not None:
            nm = mask.shape[0]
            scores = scores.reshape(nw // nm, nm, h, t, t) + mask.astype(scores.dtype)[None, :, None]
            scores = scores.reshape(nw, h, t, t)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("whqk,whkd->whqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nw, t, c)
        return nn.Dense(self.dim, dtype=d)(out)


class FusedWindowAttention(nn.Module):
    """Same math as WindowAttention through the fused Pallas kernel
    (ops/pallas/window_attention.py) — 1.85x the XLA composition on v5e.
    ``mask``: per-window-group additive mask (nm, T, T) or None."""
    dim: int
    window_size: int
    num_heads: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, win: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from sres_tpu.ops.pallas.window_attention import fused_window_attention
        c, h = self.dim, self.num_heads
        t = self.window_size ** 2
        ini = nn.initializers.lecun_normal()
        wqkv = self.param("wqkv", ini, (c, 3 * c), jnp.float32)
        bqkv = self.param("bqkv", nn.initializers.zeros, (1, 3 * c), jnp.float32)
        wo = self.param("wo", ini, (c, c), jnp.float32)
        bo = self.param("bo", nn.initializers.zeros, (1, c), jnp.float32)
        table = self.param("rel_bias", nn.initializers.truncated_normal(0.02),
                           ((2 * self.window_size - 1) ** 2, h), jnp.float32)
        idx = relative_position_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(t, t, h).transpose(2, 0, 1)
        cd = self.dtype or win.dtype
        nw, t_, _ = win.shape
        if mask is None:
            full_mask = jnp.zeros((nw, t_, t_), jnp.float32)
        else:  # tile the (nm, T, T) group mask over the batch of windows
            full_mask = jnp.tile(mask.astype(jnp.float32), (nw // mask.shape[0], 1, 1))
        y = fused_window_attention(win.astype(cd), wqkv.astype(cd), bqkv,
                                   wo.astype(cd), bo, bias.astype(jnp.float32),
                                   full_mask, h)
        return y.astype(win.dtype)


class SwinBlock(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    shift: int
    mlp_ratio: float
    fused: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        b, h, w, c = x.shape
        ws, sh = self.window_size, self.shift
        y = nn.LayerNorm(dtype=d)(x)
        if sh > 0:
            y = jnp.roll(y, (-sh, -sh), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, ws, sh))
        else:
            mask = None
        win = window_partition(y, ws)
        if self.fused:
            win = FusedWindowAttention(self.dim, ws, self.num_heads, dtype=d)(win, mask)
        else:
            win = WindowAttention(self.dim, ws, self.num_heads, dtype=d)(win, mask)
        y = window_merge(win, ws, h, w)
        if sh > 0:
            y = jnp.roll(y, (sh, sh), axis=(1, 2))
        x = x + y
        y = nn.LayerNorm(dtype=d)(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=d)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=d)(y)
        return x + y


class SwinIR(nn.Module):
    nchannels_in: int
    nchannels_out: int
    nfeatures: int
    nlayers: int        # residual groups (RSTBs)
    nblocks: int        # swin blocks per group
    window_size: int
    num_heads: int
    mlp_ratio: float
    scale: int
    fused_attention: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        assert x.shape[1] % self.window_size == 0 and x.shape[2] % self.window_size == 0, \
            f"tile {x.shape[1:3]} not divisible by window {self.window_size}"
        x = Conv(self.nfeatures, 3, dtype=d)(x)
        res = x
        for _ in range(self.nlayers):
            g = res
            for ib in range(self.nblocks):
                shift = self.window_size // 2 if ib % 2 == 1 else 0
                g = SwinBlock(self.nfeatures, self.window_size, self.num_heads,
                              shift, self.mlp_ratio, fused=self.fused_attention,
                              dtype=d)(g)
            g = Conv(self.nfeatures, 3, dtype=d)(g)
            res = res + g
        res = Conv(self.nfeatures, 3, dtype=d)(res) + x
        y = SPUpsample(self.scale, self.nfeatures, dtype=d)(res)
        y = Conv(self.nchannels_out, 3, dtype=d)(y)
        return y.astype(jnp.float32)


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, dict(window_size=8, num_heads=4, mlp_ratio=2.0,
                                      nblocks=2, fused_attention=False),
                      nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    return SwinIR(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeatures=p["nfeatures"], nlayers=p["nlayers"], nblocks=p["nblocks"],
        window_size=p["window_size"], num_heads=p["num_heads"],
        mlp_ratio=float(p["mlp_ratio"]), scale=p["scale"],
        fused_attention=bool(p["fused_attention"]), dtype=dtype,
    )
