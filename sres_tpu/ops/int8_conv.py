"""Lean dynamically-quantized int8 convolution (custom VJP) — the fused
replacement for the AQT trunk path.

PERF.md's hlo_category profile attributes ~46 ms/step (34%) of the int8
train step to AQT's quantization machinery: absmax calibration 11.7 ms,
integer rounding 10.2 ms, data formatting 20.1 ms. AQT builds those from a
general dot-quantization framework (tiled calibration contexts, dtype
abstraction layers); this module instead emits the minimal HLO — one absmax
reduce and one fused round/clip per operand, then an int8-MXU conv (see
_q8's lowering note) — for the forward AND both backward contractions, so
XLA can producer/consumer-fuse every elementwise piece into neighboring
work. The backward convs use the exact dimension-number relabelings JAX's
own autodiff emits (transpose_lhs/transpose_rhs specialized to stride 1):
zero data movement, XLA recognizes input-/weight-gradient convs.

Memory: the forward stashes the QUANTIZED activations (+ per-sample scales)
as the residual, not the raw f32 input (the naive version OOMed the full
RCAN at batch 144: 410 convs × 85 MB f32 > 15.75 G HBM); the trunk's
per-group remat (models/rcan.py) frees the stashes between groups. The dw
contraction reuses the stash directly by absorbing each sample's activation
scale into the cotangent before quantizing it:
dw = Σ_b (xq_b·sx_b) ⋆ g_b = Σ_b xq_b ⋆ (g_b·sx_b).

Scale structure (the AQT conv defaults' numerics envelope, ~1.4% relative
error per conv — and measured BETTER training quality: int8_fused training
converges within 0.8% of f32 where AQT training binds at +27%, PERF.md):
  forward: activations per-sample, weights per-output-channel
  dx:      cotangent per-sample, spatially-reversed weights per-input-channel
  dw:      quantized activation stash × per-tensor-quantized scale-absorbed
           cotangent
Quantization is a straight-through estimator: identity for gradients.

Scope: stride-1 NHWC/HWIO convs with symmetric padding — the RCAN trunk's
3×3 and CA 1×1 shapes (reference: sres/model/rcan/network.py:50-80). The
``int8_conv_fn`` wrapper is signature-compatible with
``lax.conv_general_dilated`` (the hook models/layers.py:Conv consumes) and
falls back to full precision for any unsupported call.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Pad = Tuple[Tuple[int, int], Tuple[int, int]]


def _q8(t: jnp.ndarray, axes: Optional[Tuple[int, ...]]):
    """absmax-quantize to int8 VALUES carried in bf16 (f32 math); returns
    (q, scale) with t ≈ q·scale.

    LOWERING NOTE: the quantized values deliberately stay bf16 round/clip
    outputs — NO s8 round-trip. Step-level profiling (PERF.md round 3)
    showed the TPU backend's int8-conv acceleration keys on this producer
    form: AQT's convs (same form) run at ~0.073 ms effective per trunk
    conv, while convert(s8)->bf16 operands ran at the plain bf16 rate
    (0.17 ms) for fwd/dx and raw-s8-operand dw convs at HALF the bf16 rate
    (0.35 ms). Integers <=127 are exact in bf16.
    """
    tf = t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(tf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(tf * (1.0 / scale)), -127.0, 127.0)
    return q.astype(jnp.bfloat16), scale


def _conv_i8(x: jnp.ndarray, w: jnp.ndarray, pad: Pad,
             dn: Optional[lax.ConvDimensionNumbers] = None,
             out32: bool = False) -> jnp.ndarray:
    """Conv over int8-quantized bf16 operands (see _q8's lowering note).
    Production keeps the backend's native output dtype (bf16); ``out32``
    requests an f32 accumulator output — used by the exactness tests to pin
    the backward's transposes/padding/scale math without bf16 output
    rounding."""
    if dn is None:
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pet = jnp.float32 if out32 else None
    y = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), pad,
        dimension_numbers=dn, preferred_element_type=pet)
    return y.astype(jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def int8_conv(x: jnp.ndarray, w: jnp.ndarray, pad: Pad,
              out32: bool = False) -> jnp.ndarray:
    """y = conv(x, w) on the int8 MXU; x (B,H,W,I) f32, w (kh,kw,I,O) f32."""
    xq, sx = _q8(x, (1, 2, 3))
    wq, sw = _q8(w, (0, 1, 2))
    y = _conv_i8(xq, wq, pad, out32=out32)
    return y * (sx * sw)     # (B,1,1,1)·(1,1,1,O) broadcast


def _fwd(x, w, pad, out32):
    xq, sx = _q8(x, (1, 2, 3))
    wq, sw = _q8(w, (0, 1, 2))
    y = _conv_i8(xq, wq, pad, out32=out32) * (sx * sw)
    # quantized-activation stash (integer values, exact in bf16); per-conv
    # residuals are freed between groups by the trunk remat (models/rcan.py)
    return y, (xq, sx, w)


# Backward dimension-number relabelings (JAX's own transpose formulations,
# jax/_src/lax/convolution.py, specialized to stride 1 / no dilation).
_DN_DX = lax.ConvDimensionNumbers((0, 3, 1, 2), (2, 3, 0, 1), (0, 3, 1, 2))
_DN_DW = lax.ConvDimensionNumbers((3, 0, 1, 2), (3, 0, 1, 2), (2, 3, 0, 1))


def _bwd(pad: Pad, out32: bool, res, g):
    xq, sx, w = res
    k_h, k_w = w.shape[0], w.shape[1]
    g = g.astype(jnp.float32)

    # dx = conv(g, spatially-reversed w) with I read as the output-feature
    # dim (rhs spec (2,3,0,1)); weights quantized per-INPUT-channel so the
    # scale factors out of the O-contraction.
    gq, sg = _q8(g, (1, 2, 3))
    wq2, sw2 = _q8(w, (0, 1, 3))                       # (1,1,I,1) scales
    padT = ((k_h - 1 - pad[0][0], k_h - 1 - pad[0][1]),
            (k_w - 1 - pad[1][0], k_w - 1 - pad[1][1]))
    dx = _conv_i8(gq, jnp.flip(wq2, (0, 1)), padT, _DN_DX, out32) \
        * (sg * sw2.reshape(1, 1, 1, -1))

    # dw = conv(x, g·sx) with the batch as the contracted dim (lhs spec
    # (3,0,1,2): C is "batch") → output directly (kh,kw,I,O). The quantized
    # stash substitutes for x once each sample's activation scale is
    # absorbed into the cotangent (then per-tensor-quantized so the scale
    # factors out of the b-sum).
    gp = g * sx
    gpq, sgp = _q8(gp, None)
    pad_dw = ((pad[0][0], k_h - 1 - pad[0][0]),
              (pad[1][0], k_w - 1 - pad[1][0]))
    dw = _conv_i8(xq, gpq, pad_dw, _DN_DW, out32) * sgp
    return dx, dw.astype(w.dtype)


int8_conv.defvjp(_fwd, _bwd)


def _normalize_pad(padding, k_h: int, k_w: int) -> Optional[Pad]:
    if isinstance(padding, str):
        if padding.upper() == "SAME" and k_h % 2 == 1 and k_w % 2 == 1:
            return ((k_h // 2,) * 2, (k_w // 2,) * 2)
        if padding.upper() == "VALID":
            return ((0, 0), (0, 0))
        return None
    pad = tuple((int(lo), int(hi)) for lo, hi in padding)
    return pad if len(pad) == 2 else None


def int8_conv_fn():
    """Drop-in ``lax.conv_general_dilated`` running supported convs through
    the fused int8 path (hook: models/layers.py:Conv via
    ``model.quantization: int8_fused``); unsupported shapes fall back to the
    full-precision conv unchanged."""

    def conv(lhs, rhs, window_strides, padding, lhs_dilation=None,
             rhs_dilation=None, dimension_numbers=None,
             feature_group_count=1, batch_group_count=1, precision=None,
             preferred_element_type=None):
        def fallback():
            return lax.conv_general_dilated(
                lhs, rhs, window_strides, padding, lhs_dilation, rhs_dilation,
                dimension_numbers, feature_group_count, batch_group_count,
                precision, preferred_element_type)

        if (tuple(window_strides) != (1, 1) or feature_group_count != 1
                or batch_group_count != 1):
            return fallback()
        if lhs_dilation is not None and tuple(lhs_dilation) != (1, 1):
            return fallback()
        if rhs_dilation is not None and tuple(rhs_dilation) != (1, 1):
            return fallback()
        want = lax.conv_dimension_numbers(lhs.shape, rhs.shape,
                                          ("NHWC", "HWIO", "NHWC"))
        if dimension_numbers is not None:
            got = (dimension_numbers if not isinstance(dimension_numbers, tuple)
                   else lax.conv_dimension_numbers(lhs.shape, rhs.shape,
                                                   dimension_numbers))
            if got != want:
                return fallback()
        pad = _normalize_pad(padding, rhs.shape[0], rhs.shape[1])
        if pad is None:
            return fallback()
        out = int8_conv(lhs.astype(jnp.float32), rhs.astype(jnp.float32), pad)
        if preferred_element_type is not None:
            out = out.astype(preferred_element_type)
        return out

    return conv
