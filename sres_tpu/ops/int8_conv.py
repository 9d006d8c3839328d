"""Lean dynamically-quantized int8 convolution — the fused replacement for
the AQT trunk path.

PERF.md's hlo_category profile attributes ~46 ms/step (34%) of the int8
train step to AQT's quantization machinery: absmax calibration 11.7 ms,
integer rounding 10.2 ms, data formatting 20.1 ms. AQT builds those from a
general dot-quantization framework (tiled calibration contexts, dtype
abstraction layers); this module instead emits the minimal HLO — one absmax
reduce and one fused round/clip per operand, then the conv.

Design history (round 3, all MEASURED on chip — see PERF.md):
1. custom-VJP with raw s8 operands / int32 accumulation: 277 t/s. The TPU
   backend does not accelerate raw-s8 convs here; s8-operand dw convs ran
   at HALF the bf16 rate.
2. custom-VJP with bf16-carried integer operands (AQT's operand form) and
   hand-built backward convs (JAX's own transpose dimension-number
   relabelings): 250-277 t/s. The custom VJP itself is the obstacle — its
   materialized residuals and fixed backward structure prevent XLA from
   forming the horizontally-fused conv groups that make the AQT step fast
   (AQT's compiled step runs ~450 conv fusions for 1230 logical convs).
3. THIS version: no custom VJP at all. Quantization is expressed as a
   VALUE-EXACT straight-through estimator —
       q = stop_grad(round_clip(t/s)) + (t/s − stop_grad(t/s))
   whose parenthesis is identically zero in value (so the forward operand
   is the exact integer grid the backend's int8 pattern-match keys on)
   while the gradient of q w.r.t. t is 1/s. JAX's native autodiff then
   differentiates through the conv exactly as it does for AQT: XLA owns the
   backward structure, rematerialization, and fusion.

Like AQT, the backward convs therefore run with the UNQUANTIZED cotangent
(bf16) against the quantized operand. Quantized-backward variants (design
1/2) were measured strictly worse in throughput with no quality advantage:
int8_fused training converges within ~1% of f32 either way, where AQT's
own numerics bind at +27% (scripts/bench/int8_convergence.py, PERF.md).

Scale structure: activations per-sample, weights per-output-channel
(absmax, round-to-nearest); scales are stop-gradiented (calibration carries
no gradient — AQT's default).

Scope: stride-1 NHWC/HWIO convs with symmetric padding — the RCAN trunk's
3×3 and CA 1×1 shapes (reference: sres/model/rcan/network.py:50-80). The
``int8_conv_fn`` wrapper is signature-compatible with
``lax.conv_general_dilated`` (the hook models/layers.py:Conv consumes) and
falls back to full precision for any unsupported call.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Pad = Tuple[Tuple[int, int], Tuple[int, int]]


def _q8_ste(t: jnp.ndarray, axes: Optional[Tuple[int, ...]]):
    """absmax-quantize to the int8 grid with a value-exact STE.

    Returns (q, scale) with t ≈ q·scale. q's VALUE is exactly
    clip(round(t/scale)) — integer-valued, which the TPU backend's int8
    conv selection pattern-matches — while its GRADIENT w.r.t. t is
    1/scale (straight-through; the scale itself is stop-gradiented)."""
    tf = t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(tf), axis=axes, keepdims=True)
    scale = lax.stop_gradient(jnp.maximum(amax, 1e-30) * (1.0 / 127.0))
    a = tf * (1.0 / scale)
    qv = jnp.clip(jnp.round(a), -127.0, 127.0)
    q = lax.stop_gradient(qv) + (a - lax.stop_gradient(a))
    return q, scale


def int8_conv(x: jnp.ndarray, w: jnp.ndarray, pad: Pad,
              out32: bool = False) -> jnp.ndarray:
    """y = conv(x, w) over int8-quantized operands; x (B,H,W,I) f32/bf16,
    w (kh,kw,I,O) f32. Differentiable (STE); ``out32`` requests an f32
    accumulator output (used by the exactness tests — production keeps the
    backend-native bf16 output)."""
    xq, sx = _q8_ste(x, (1, 2, 3))
    wq, sw = _q8_ste(w, (0, 1, 2))
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    if out32:
        # test mode: f32 operands + f32 accumulator so integer sums stay
        # exact (autodiff's transpose convs need matching dtypes)
        y = lax.conv_general_dilated(xq, wq, (1, 1), pad,
                                     dimension_numbers=dn)
    else:
        y = lax.conv_general_dilated(
            xq.astype(jnp.bfloat16), wq.astype(jnp.bfloat16), (1, 1), pad,
            dimension_numbers=dn)
    return y.astype(jnp.float32) * (sx * sw)   # (B,1,1,1)·(1,1,1,O)


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
        out = int8_conv(lhs, rhs.astype(jnp.float32), pad)
        if preferred_element_type is not None:
            out = out.astype(preferred_element_type)
        return out

    return conv
