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
3. value-exact arithmetic STE (q = sg(qv) + (t/s − sg(t/s))): still
   277 t/s — the add/sub wrapper pollutes the operand chain, and XLA's
   fold requires a CLEAN convert(s8) operand.
4. THIS version: AQT's exact compiled form, isolated by dumping its
   optimized HLO — the conv's operands are literal s8 arrays with a bf16
   OUTPUT (XLA folds convert(s8→bf16) operands into an s8×s8→bf16
   convolution; an f32 preferred_element_type blocks the fold). The only
   custom VJP is on the elementwise round/clip/cast (straight-through),
   so the conv itself is natively differentiated: clean convert(s8)
   operands in the forward, XLA-owned backward structure/remat/fusion.

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


@jax.custom_vjp
def _round_clip_s8(a: jnp.ndarray) -> jnp.ndarray:
    """clip(round(a)) → int8 → bf16, straight-through gradient.

    The custom VJP is scoped to THIS elementwise op only, so the forward
    HLO keeps a clean convert(s8) producer for the conv operand (which XLA
    folds into an s8×s8→bf16 convolution — the accelerated form) while the
    conv itself stays natively differentiable."""
    q = jnp.clip(jnp.round(a), -127.0, 127.0)
    return q.astype(jnp.int8).astype(jnp.bfloat16)


def _rc_fwd(a):
    return _round_clip_s8(a), None


def _rc_bwd(_, g):
    return (g.astype(jnp.float32),)


_round_clip_s8.defvjp(_rc_fwd, _rc_bwd)


def _q8_ste(t: jnp.ndarray, axes: Optional[Tuple[int, ...]],
            out32: bool = False):
    """absmax-quantize to the int8 grid; returns (q, scale), t ≈ q·scale.
    Gradient w.r.t. t is 1/scale (straight-through through _round_clip_s8
    and the division; the scale itself is stop-gradiented). ``out32`` keeps
    everything f32 with no s8 cast — the exactness-test mode."""
    tf = t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(tf), axis=axes, keepdims=True)
    scale = lax.stop_gradient(jnp.maximum(amax, 1e-30) * (1.0 / 127.0))
    a = tf * (1.0 / scale)
    if out32:
        qv = jnp.clip(jnp.round(a), -127.0, 127.0)
        q = lax.stop_gradient(qv) + (a - lax.stop_gradient(a))
    else:
        q = _round_clip_s8(a)
    return q, scale


def int8_conv(x: jnp.ndarray, w: jnp.ndarray, pad: Pad,
              out32: bool = False) -> jnp.ndarray:
    """y = conv(x, w) over int8-quantized operands; x (B,H,W,I) f32/bf16,
    w (kh,kw,I,O) f32. Differentiable (STE); ``out32`` requests an f32
    accumulator output (used by the exactness tests — production keeps the
    backend-native bf16 output)."""
    xq, sx = _q8_ste(x, (1, 2, 3), out32)
    wq, sw = _q8_ste(w, (0, 1, 2), out32)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    # out32 (test mode): f32 operands + f32 accumulator so integer sums stay
    # exact. Production: bf16 operands that are converts-from-s8, bf16
    # output — the form XLA folds onto the s8 conv path.
    y = lax.conv_general_dilated(xq, wq, (1, 1), pad, dimension_numbers=dn)
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
