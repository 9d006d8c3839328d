"""Separable image resize with exact torch ``F.interpolate`` semantics.

The reference's hot path synthesizes every LR training input by bicubic
downsampling of the HR tile and scores models against a bicubic-upsample
baseline (reference: sres/base/util/array.py:72-93,
sres/controller/dual_trainer.py:557-571). Matching
``torch.nn.functional.interpolate(mode='bicubic'|'bilinear'|'nearest',
align_corners=False, antialias=False)`` to f32 tolerance is therefore required for
PSNR/RMSE parity.

TPU-native design: instead of gathers, each spatial axis is resampled by a
small dense (out_size × in_size) weight matrix precomputed on the host at
trace time. The resize then becomes two matmuls (one per axis) that XLA maps
straight onto the MXU — no dynamic shapes, no data-dependent control flow.
For the canonical 192→48 tile this is a (48,192)×(192,·) contraction, which
is orders of magnitude faster on TPU than an unfused gather-based resampler.

Golden tests against torch CPU live in tests/test_resize.py.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

_CUBIC_A = -0.75  # torch / OpenCV bicubic coefficient


def _cubic_kernel(x: np.ndarray) -> np.ndarray:
    """W(x) for the Keys cubic convolution kernel with a = -0.75."""
    ax = np.abs(x)
    a = _CUBIC_A
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * (ax**3 - 5.0 * ax**2 + 8.0 * ax - 4.0), 0.0),
    )
    return w


@lru_cache(maxsize=256)
def resize_matrix(
    in_size: int, out_size: int, mode: str = "bicubic", scale: Optional[float] = None,
    align_corners: bool = False,
) -> np.ndarray:
    """(out_size, in_size) float32 resampling matrix matching torch semantics.

    ``scale`` is the torch ``scale_factor`` (out/in); when provided, source
    coordinates use it directly (torch's recompute_scale_factor=False path),
    otherwise out_size/in_size is used.
    """
    s = (out_size / in_size) if scale is None else float(scale)
    dst = np.arange(out_size, dtype=np.float64)

    if mode == "nearest":
        # torch 'nearest' uses src = floor(dst / scale) — no half-pixel shift.
        src_idx = np.clip(np.floor(dst / s).astype(np.int64), 0, in_size - 1)
        m = np.zeros((out_size, in_size), dtype=np.float64)
        m[np.arange(out_size), src_idx] = 1.0
        return m.astype(np.float32)

    if align_corners:
        # src = dst * (in-1)/(out-1) (torch align_corners=True; ESRT's
        # F.interpolate calls use this, sres/model/esrt/network.py:147-155)
        ac = np.float32((in_size - 1) / (out_size - 1)) if out_size > 1 else np.float32(0)
        src = (dst.astype(np.float32) * ac).astype(np.float32)
    else:
        # Half-pixel centers (align_corners=False). torch's f32 CPU kernel
        # computes the reciprocal scale once and evaluates source coordinates
        # and filter weights in float32 (aten upsample kernels are templated
        # on the input scalar type) — mirror both for bit-level parity.
        rs = np.float32(1.0 / s)
        src = ((dst.astype(np.float32) + np.float32(0.5)) * rs - np.float32(0.5)).astype(np.float32)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if mode in ("bilinear", "linear"):
        i0 = np.floor(src).astype(np.int64)
        frac = (src - i0.astype(np.float32)).astype(np.float32)
        for tap, w in ((i0, np.float32(1.0) - frac), (i0 + 1, frac)):
            np.add.at(m, (np.arange(out_size), np.clip(tap, 0, in_size - 1)), w)
    elif mode in ("bicubic", "cubic"):
        i0 = np.floor(src).astype(np.int64)
        frac = (src - i0.astype(np.float32)).astype(np.float32)
        for k in range(-1, 3):
            w = _cubic_kernel((frac - np.float32(k)).astype(np.float32)).astype(np.float32)
            np.add.at(m, (np.arange(out_size), np.clip(i0 + k, 0, in_size - 1)), w)
    else:
        raise ValueError(f"Unknown resize mode: {mode}")
    return m.astype(np.float32)


def interp_mode(cfg_mode: str) -> str:
    """Map the reference's task-config mode names ('cubic'/'linear') to ours
    (reference: sres/base/util/array.py:37-41)."""
    return {"linear": "bilinear", "cubic": "bicubic"}.get(cfg_mode, cfg_mode)


def _out_size(in_size: int, scale: float) -> int:
    return int(math.floor(in_size * scale))


def resize(
    x: jnp.ndarray,
    out_hw: Tuple[int, int],
    mode: str = "bicubic",
    scale: Optional[float] = None,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize NHWC (or NHW) ``x`` to ``out_hw`` spatial shape.

    Computed in float32 regardless of input dtype (parity with the reference's
    f32 torch path), returned in float32.
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    mh = jnp.asarray(resize_matrix(h_in, h_out, mode, scale, align_corners))
    mw = jnp.asarray(resize_matrix(w_in, w_out, mode, scale, align_corners))
    y = x.astype(jnp.float32)
    # rows: (B,H,W,C) -> (B,Ho,W,C); cols: -> (B,Ho,Wo,C). Both are MXU matmuls.
    y = jnp.einsum("oh,bhwc->bowc", mh, y, precision="highest")
    y = jnp.einsum("ow,bhwc->bhoc", mw, y, precision="highest")
    return y


def downsample(x: jnp.ndarray, scale_factor: float, mode: str = "bicubic") -> jnp.ndarray:
    """LR synthesis: shrink by ``scale_factor`` (>1), matching
    ``F.interpolate(scale_factor=1/scale_factor)`` including its floor-based
    output-size rule (reference: sres/base/util/array.py:72-76)."""
    s = 1.0 / scale_factor
    out_hw = (_out_size(x.shape[-3], s), _out_size(x.shape[-2], s))
    return resize(x, out_hw, mode, scale=s)


def upsample(x: jnp.ndarray, scale_factor: float, mode: str = "bicubic") -> jnp.ndarray:
    """Interpolation baseline / model-free upsample
    (reference: sres/base/util/array.py:84-87)."""
    out_hw = (_out_size(x.shape[-3], scale_factor), _out_size(x.shape[-2], scale_factor))
    return resize(x, out_hw, mode, scale=float(scale_factor))


def multiscale_targets(hr: jnp.ndarray, downscale_factors: Sequence[int], mode: str = "bilinear"):
    """Per-level targets for pyramid (list-output) models — bilinear-shrunk HR,
    lowest level first (reference: sres/controller/dual_trainer.py:214-219)."""
    targets = [hr]
    for usf in list(downscale_factors)[:-1]:
        targets.append(downsample(targets[-1], float(usf), mode))
    targets.reverse()
    return targets
