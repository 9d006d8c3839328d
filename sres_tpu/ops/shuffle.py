"""Pixel shuffle (sub-pixel convolution upsampling) for NHWC layout.

Equivalent of ``torch.nn.PixelShuffle`` (used by every PixelShuffle tail in
the reference zoo, e.g. sres/model/rcan/blocks.py:58) but for channels-last:
(B, H, W, C*r*r) → (B, H*r, W*r, C). The channel unpacking order matches
torch's NCHW PixelShuffle so converted weights produce identical outputs:
input channel index c*r*r + i*r + j maps to output pixel offset (i, j).
"""
from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    b, h, w, crr = x.shape
    c = crr // (r * r)
    assert c * r * r == crr, f"channels {crr} not divisible by r^2={r*r}"
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, c
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h, w, c, r, r
    return x.reshape(b, h, w, c * r * r)
