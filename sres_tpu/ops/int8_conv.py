"""Lean dynamically-quantized int8 convolution (custom VJP) — the fused
replacement for the AQT trunk path.

PERF.md's hlo_category profile attributes ~46 ms/step (34%) of the int8
train step to AQT's quantization machinery: absmax calibration 11.7 ms,
integer rounding 10.2 ms, data formatting 20.1 ms. AQT builds those from a
general dot-quantization framework (tiled calibration contexts, dtype
abstraction layers); this module instead emits the minimal HLO — one absmax
reduce and one fused round/clip/convert per operand, then an int8-MXU conv
(see _conv_i8's lowering note) — for the forward AND both backward
contractions, so XLA can producer/consumer-fuse every elementwise piece
into neighboring work.

Memory: the forward stashes the INT8 activations (+ per-sample scales) as
the residual, not the f32 input — 4× smaller than an f32 stash (the naive
version OOMed the full RCAN at batch 144: 410 convs × 85 MB f32 > 15.75 G
HBM). The dw contraction reuses that int8 stash directly by absorbing each
sample's activation scale into the cotangent before quantizing it:
dw = Σ_b (xq_b·sx_b) ⋆ g_b = Σ_b xq_b ⋆ (g_b·sx_b).

Scale structure (matches the AQT conv defaults' numerics envelope,
~1.4% relative error per conv):
  forward: activations per-sample, weights per-output-channel
  dx:      cotangent per-sample, spatially-flipped weights per-input-channel
  dw:      int8 activation stash × per-tensor-quantized scale-absorbed
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
    """absmax-quantize to int8 (f32 math); returns (q, scale), t ≈ q·scale."""
    tf = t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(tf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(tf * (1.0 / scale)), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _conv_i8(x: jnp.ndarray, w: jnp.ndarray, pad: Pad,
             dn: Optional[lax.ConvDimensionNumbers] = None) -> jnp.ndarray:
    """Conv over int8-quantized operands. CRITICAL lowering detail: the
    operands are cast int8→bf16 and the conv runs with a float accumulator —
    XLA:TPU pattern-matches convert-from-int8 operands onto the int8 MXU
    (the same mechanism AQT relies on: aqt_conv_general.py's
    ``qvalue_astype(lhs.dtype)``). Feeding raw int8 operands with an int32
    preferred_element_type takes a several-times-slower non-MXU path
    (measured: 520 ms/step vs AQT's 140 at batch 144). Int values ≤127 are
    exact in bf16; products accumulate in f32."""
    if dn is None:
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), pad,
        dimension_numbers=dn, preferred_element_type=jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def int8_conv(x: jnp.ndarray, w: jnp.ndarray, pad: Pad) -> jnp.ndarray:
    """y = conv(x, w) on the int8 MXU; x (B,H,W,I) f32, w (kh,kw,I,O) f32."""
    xq, sx = _q8(x, (1, 2, 3))
    wq, sw = _q8(w, (0, 1, 2))
    y = _conv_i8(xq, wq, pad)
    return y * (sx * sw)     # (B,1,1,1)·(1,1,1,O) broadcast


def _fwd(x, w, pad):
    xq, sx = _q8(x, (1, 2, 3))
    wq, sw = _q8(w, (0, 1, 2))
    y = _conv_i8(xq, wq, pad) * (sx * sw)
    return y, (xq, sx, w)    # int8 activation stash — see module docstring


# Backward convs use JAX's OWN transpose formulations (jax/_src/lax/
# convolution.py _conv_general_dilated_transpose_{lhs,rhs}, specialized to
# stride 1 / no dilation): dims are RELABELED via ConvDimensionNumbers, with
# zero data movement, so XLA recognizes them as input-/weight-gradient convs
# and compiles its optimized forms. The first version instead transposed the
# operands and issued a generic 48×48-window conv for dw — which dominated
# the whole step (520 ms vs AQT's 140 at batch 144 — the conv itself, not
# quantization, was the cost).
_DN_DX = lax.ConvDimensionNumbers((0, 3, 1, 2), (2, 3, 0, 1), (0, 3, 1, 2))
_DN_DW = lax.ConvDimensionNumbers((3, 0, 1, 2), (3, 0, 1, 2), (2, 3, 0, 1))


def _bwd(pad: Pad, res, g):
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
    dx = _conv_i8(gq, jnp.flip(wq2, (0, 1)), padT, _DN_DX) \
        * (sg * sw2.reshape(1, 1, 1, -1))

    # dw = conv(x, g·sx) with the batch as the contracted dim (lhs spec
    # (3,0,1,2): C is "batch") → output directly (kh,kw,I,O). The int8 stash
    # substitutes for x once each sample's activation scale is absorbed into
    # the cotangent (then per-tensor-quantized so the scale factors out of
    # the b-sum).
    gp = g * sx
    gpq, sgp = _q8(gp, None)
    pad_dw = ((pad[0][0], k_h - 1 - pad[0][0]),
              (pad[1][0], k_w - 1 - pad[1][0]))
    dw = _conv_i8(xq, gpq, pad_dw, _DN_DW) * sgp
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
