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

from functools import partial
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


# ---------------------------------------------------------------------------
# Fully-quantized variant: backward convs on the int8 MXU too.
#
# ``int8_conv`` above quantizes only the FORWARD conv; its natively-derived
# backward runs the cotangent in bf16 against the convert(s8) operand — a
# mixed s8×bf16 conv that does NOT take the accelerated path, so the step is
# backward-bound (measured 330.8 t/s vs AQT's 1031.6 at batch 144: dX+dW are
# ~2/3 of the conv FLOPs). This variant hand-writes the VJP so BOTH backward
# contractions also run s8×s8→bf16:
#
#   dx = conv(q(g) per-sample, flip(q(w) per-INPUT-channel))   [O contracted]
#   dw = conv(xq stash, q(g·sx) per-tensor)                    [B contracted]
#
# Scale axes are forced by what the contraction leaves free: any scale on a
# CONTRACTED dim cannot factor out, so dx re-quantizes w per-I (O is
# contracted) and dw absorbs the per-sample activation scale into the
# cotangent before a per-tensor quantization (B is contracted):
#   dw = Σ_b (xq_b·sx_b) ⋆ g_b = Σ_b xq_b ⋆ (g_b·sx_b).
# The backward dims are JAX's own transpose relabelings
# (jax/_src/lax/convolution.py _conv_general_dilated_transpose_{lhs,rhs}
# specialized to stride 1): zero data movement, XLA recognizes the
# input-/weight-gradient conv forms. The round-3 lowering rule applies to
# all three convs: clean convert(s8) operands with a bf16 OUTPUT (an f32
# preferred_element_type blocks XLA's fold onto the s8 conv path — the
# design-2 mistake that masked this variant's speed).
#
# Memory: the residual stashes the INT8 activations + per-sample scales
# (4× smaller than an f32 stash) plus the small f32 weights.
# ---------------------------------------------------------------------------

_DN_DX = lax.ConvDimensionNumbers((0, 3, 1, 2), (2, 3, 0, 1), (0, 3, 1, 2))
_DN_DW = lax.ConvDimensionNumbers((3, 0, 1, 2), (3, 0, 1, 2), (2, 3, 0, 1))


def _q8s(t: jnp.ndarray, axes: Optional[Tuple[int, ...]]):
    """absmax-quantize; returns (q int8 array, f32 scale), t ≈ q·scale."""
    tf = t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(tf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(tf * (1.0 / scale)), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def _conv_q(a_s8, b_s8, pad: Pad, dn, out32: bool) -> jnp.ndarray:
    """s8×s8 conv in the folded form (bf16 operands that are clean
    convert(s8), bf16 output). out32: f32 operands/accumulator — the
    bit-exact mode the integer tests pin the backward formulas with."""
    dt = jnp.float32 if out32 else jnp.bfloat16
    y = lax.conv_general_dilated(
        a_s8.astype(dt), b_s8.astype(dt), (1, 1), pad,
        dimension_numbers=dn,
        preferred_element_type=jnp.float32 if out32 else None)
    return y.astype(jnp.float32)


def _int8_conv_full(x, w, pad: Pad, out32: bool):
    xq, sx = _q8s(x, (1, 2, 3))
    wq, sw = _q8s(w, (0, 1, 2))
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return _conv_q(xq, wq, pad, dn, out32) * (sx * sw)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def int8_conv_full(x: jnp.ndarray, w: jnp.ndarray, pad: Pad,
                   out32: bool = False) -> jnp.ndarray:
    """y = conv(x, w) with forward AND backward contractions int8-quantized
    (straight-through estimator); x (B,H,W,I), w (kh,kw,I,O)."""
    return _int8_conv_full(x, w, pad, out32)


def _full_fwd(x, w, pad, out32):
    xq, sx = _q8s(x, (1, 2, 3))
    wq, sw = _q8s(w, (0, 1, 2))
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = _conv_q(xq, wq, pad, dn, out32) * (sx * sw)
    return y, (xq, sx, w.astype(jnp.float32))


def _full_bwd(pad: Pad, out32: bool, res, g):
    """Backward contractions in the two forms the TPU backend accelerates
    (the naive relabeled-dim dx conv and 48×48-window dw conv measured at
    bf16 speed — PERF.md round 3):

    dx as a STANDARD forward-form conv: flip+transpose the weights FIRST,
    then quantize, so both operands are clean convert(s8) producers in the
    exact NHWC/HWIO shape of the accelerated forward. The transposed pad
    (k−1−p) makes conv(g, flipᵀ(w)) the exact input-gradient.

    dw as k·k per-tap s8×s8 dot_generals (the canonical int8-MXU op):
    dw[kh,kw,i,o] = Σ_{b,h,w} x[b,h+kh−p,w+kw−p,i]·g[b,h,w,o] — each tap a
    (BHW,I)ᵀ(BHW,O) matmul over shifted slices of the padded int8 stash."""
    xq, sx, w = res
    k_h, k_w = w.shape[0], w.shape[1]
    g = g.astype(jnp.float32)

    # dx: O contracted. Per-I weight scales survive (I is dx's channel dim);
    # quantize AFTER the flip+transpose so the conv sees clean operands.
    gq, sg = _q8s(g, (1, 2, 3))
    wt = jnp.transpose(jnp.flip(w, (0, 1)), (0, 1, 3, 2))   # (kh,kw,O,I)
    wtq, swt = _q8s(wt, (0, 1, 2))                          # (1,1,1,I)
    padT = ((k_h - 1 - pad[0][0], k_h - 1 - pad[0][1]),
            (k_w - 1 - pad[1][0], k_w - 1 - pad[1][1]))
    dn = lax.conv_dimension_numbers(gq.shape, wtq.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    dx = _conv_q(gq, wtq, padT, dn, out32) * (sg * swt)

    # dw: B contracted → absorb the per-sample activation scale into the
    # cotangent, per-tensor-quantize so the remaining scale factors out.
    gpq, sgp = _q8s(g * sx, None)
    cin, cout = w.shape[2], w.shape[3]
    bsz, hh, ww = g.shape[0], g.shape[1], g.shape[2]
    dt = jnp.float32 if out32 else jnp.bfloat16
    xp = jnp.pad(xq.astype(dt), ((0, 0), pad[0], pad[1], (0, 0)))
    gm = gpq.astype(dt).reshape(-1, cout)
    taps = []
    for kh in range(k_h):
        for kw in range(k_w):
            xs = xp[:, kh:kh + hh, kw:kw + ww, :].reshape(-1, cin)
            taps.append(lax.dot_general(
                xs, gm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32 if out32 else None))
    dw = jnp.stack(taps, 0).reshape(k_h, k_w, cin, cout).astype(jnp.float32) \
        * sgp
    return dx, dw


int8_conv_full.defvjp(_full_fwd, _full_bwd)


def _normalize_pad(padding, k_h: int, k_w: int) -> Optional[Pad]:
    if isinstance(padding, str):
        if padding.upper() == "SAME" and k_h % 2 == 1 and k_w % 2 == 1:
            return ((k_h // 2,) * 2, (k_w // 2,) * 2)
        if padding.upper() == "VALID":
            return ((0, 0), (0, 0))
        return None
    pad = tuple((int(lo), int(hi)) for lo, hi in padding)
    return pad if len(pad) == 2 else None


def int8_conv_fn(full: bool = False):
    """Drop-in ``lax.conv_general_dilated`` running supported convs through
    the fused int8 path (hook: models/layers.py:Conv via
    ``model.quantization: int8_fused`` — forward-only quantization — or
    ``int8_full`` — backward contractions quantized too); unsupported shapes
    fall back to the full-precision conv unchanged."""

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
        if full:
            out = int8_conv_full(lhs.astype(jnp.float32),
                                 rhs.astype(jnp.float32), pad)
        else:
            out = int8_conv(lhs, rhs.astype(jnp.float32), pad)
        if preferred_element_type is not None:
            out = out.astype(preferred_element_type)
        return out

    return conv
