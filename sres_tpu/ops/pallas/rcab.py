"""Fused RCAB Pallas kernel — forward + custom VJP.

The RCAB (conv3x3 → relu → conv3x3 → channel-attention → residual add,
reference: sres/model/rcan/network.py:50) dominates RCAN: 200 instances ×
fwd/bwd per step. Executed as separate XLA ops, every stage round-trips the
(B,48,48,64) activation through HBM, so the step is bandwidth-bound
(~24% MFU measured). This kernel keeps the whole block in VMEM:

  * one HBM read of x + one write of y per RCAB (≈6× traffic reduction),
  * the 3×3 convs run as 9 shifted (M,C)×(C,C) MXU matmuls accumulated in
    f32 — no im2col materialization,
  * channel attention (global mean → C→C/r→C MLP → sigmoid gate) fuses in,
  * the backward kernel recomputes the forward from x (flash-attention-style
    rematerialization) and emits dx plus all weight grads, accumulating
    weight grads across the sequential TPU grid.

Weight layouts match flax nn.Conv: conv kernels (kh, kw, Cin, Cout); the CA
1×1 convs are plain (C, Cr)/(Cr, C) matrices. Numerics are validated against
the unfused flax composition in tests/test_pallas.py (interpret mode on CPU).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_b(batch: int, hwc: int, budget_elems: int) -> int:
    """Largest divisor of ``batch`` whose live VMEM footprint (~10 f32-equiv
    activation buffers of BB*H*W*C elems) stays under the scoped-vmem limit."""
    cap = max(budget_elems // max(hwc, 1), 1)
    for cand in (8, 6, 4, 3, 2, 1):
        if batch % cand == 0 and cand <= cap:
            return cand
    return 1


# ~16MB scoped VMEM; leave headroom for weights, pads and double buffering
_FWD_BUDGET = (10 * 1024 * 1024) // 4 // 7   # ≈7 f32-equivalent buffers
_BWD_BUDGET = (10 * 1024 * 1024) // 4 // 12  # bwd keeps more live


def _conv3x3(xpad, w_ref, bias, H: int, W: int, C: int, M: int, transpose_taps: bool = False,
             transpose_w: bool = False):
    """Σ over 9 taps of (M,C)@(C,C) matmuls, f32 accumulation.
    ``transpose_taps`` flips the spatial tap (correlation vs convolution, for
    the transposed conv in the backward pass); ``transpose_w`` uses W[tap].T.
    ``xpad`` is (B, H+2, W+2, C) in VMEM."""
    acc = jnp.broadcast_to(bias.astype(jnp.float32), (M, C))
    for dy in range(3):
        for dx in range(3):
            sy, sx = (2 - dy, 2 - dx) if transpose_taps else (dy, dx)
            xs = xpad[:, sy:sy + H, sx:sx + W, :].reshape(M, C)
            w = w_ref[dy, dx]
            if transpose_w:
                w = w.T
            acc = acc + jnp.dot(xs, w, preferred_element_type=jnp.float32)
    return acc


def _pad_hw(x, B: int, H: int, W: int, C: int):
    return jnp.pad(x.reshape(B, H, W, C), ((0, 0), (1, 1), (1, 1), (0, 0)))


def _ca_forward(r_f32, wd_ref, bd_ref, wu_ref, bu_ref, B: int, HW: int, C: int):
    """Channel attention from the f32 conv2 output: returns (m, p, v, a)."""
    m = jnp.mean(r_f32.reshape(B, HW, C), axis=1)                       # (B, C)
    u = jnp.dot(m, wd_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32) + bd_ref[:].astype(jnp.float32)
    p = jnp.maximum(u, 0.0)
    v = jnp.dot(p, wu_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32) + bu_ref[:].astype(jnp.float32)
    a = jax.nn.sigmoid(v)
    return m, u, p, v, a


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, wd_ref, bd_ref, wu_ref, bu_ref,
                y_ref, *, H: int, W: int, C: int, BB: int):
    M, HW = BB * H * W, H * W
    x = x_ref[:]
    xpad = _pad_hw(x, BB, H, W, C)
    h = _conv3x3(xpad, w1_ref, b1_ref[:], H, W, C, M)
    z = jnp.maximum(h, 0.0).astype(x.dtype)
    zpad = _pad_hw(z, BB, H, W, C)
    r = _conv3x3(zpad, w2_ref, b2_ref[:], H, W, C, M)
    _, _, _, _, a = _ca_forward(r, wd_ref, bd_ref, wu_ref, bu_ref, BB, HW, C)
    gated = r.reshape(BB, HW, C) * a[:, None, :]
    y = x.reshape(BB, HW, C).astype(jnp.float32) + gated
    y_ref[:] = y.reshape(BB, H, W, C).astype(x.dtype)


def _bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref, b2_ref, wd_ref, bd_ref,
                wu_ref, bu_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dwd_ref, dbd_ref,
                dwu_ref, dbu_ref, *, H: int, W: int, C: int, CR: int, BB: int):
    M, HW = BB * H * W, H * W
    first = pl.program_id(0) == 0

    x = x_ref[:]
    g = g_ref[:].reshape(BB, HW, C).astype(jnp.float32)

    # --- recompute forward ---
    xpad = _pad_hw(x, BB, H, W, C)
    h = _conv3x3(xpad, w1_ref, b1_ref[:], H, W, C, M)
    z = jnp.maximum(h, 0.0).astype(x.dtype)
    zpad = _pad_hw(z, BB, H, W, C)
    r = _conv3x3(zpad, w2_ref, b2_ref[:], H, W, C, M)
    m, u, p, v, a = _ca_forward(r, wd_ref, bd_ref, wu_ref, bu_ref, BB, HW, C)
    r3 = r.reshape(BB, HW, C)

    # --- channel-attention backward ---
    da = jnp.sum(g * r3, axis=1)                                  # (B, C)
    dv = da * a * (1.0 - a)
    dwu = jnp.dot(p.T, dv, preferred_element_type=jnp.float32)    # (CR, C)
    dbu = jnp.sum(dv, axis=0, keepdims=True)
    dp = jnp.dot(dv, wu_ref[:].astype(jnp.float32).T, preferred_element_type=jnp.float32)
    du = dp * (u > 0.0)
    dwd = jnp.dot(m.T, du, preferred_element_type=jnp.float32)    # (C, CR)
    dbd = jnp.sum(du, axis=0, keepdims=True)
    dm = jnp.dot(du, wd_ref[:].astype(jnp.float32).T, preferred_element_type=jnp.float32)
    dr = (g * a[:, None, :] + dm[:, None, :] / HW).reshape(M, C)

    # --- conv2 backward ---
    dr_b = dr.astype(x.dtype)
    drpad = _pad_hw(dr_b, BB, H, W, C)
    zero_c = jnp.zeros((1, C), jnp.float32)
    dz = _conv3x3(drpad, w2_ref, zero_c, H, W, C, M, transpose_taps=True, transpose_w=True)
    dh = jnp.where(h > 0.0, dz, 0.0)
    db2 = jnp.sum(dr, axis=0, keepdims=True)

    # --- conv1 backward ---
    dh_b = dh.astype(x.dtype)
    dhpad = _pad_hw(dh_b, BB, H, W, C)
    dxc = _conv3x3(dhpad, w1_ref, zero_c, H, W, C, M, transpose_taps=True, transpose_w=True)
    db1 = jnp.sum(dh, axis=0, keepdims=True)
    dx_ref[:] = (g.reshape(M, C) + dxc).reshape(BB, H, W, C).astype(x.dtype)

    # --- weight grads: dW[t] = shift_t(inp)^T @ grad, accumulated over grid ---
    @pl.when(first)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    for dy in range(3):
        for dx in range(3):
            xs = xpad[:, dy:dy + H, dx:dx + W, :].reshape(M, C)
            zs = zpad[:, dy:dy + H, dx:dx + W, :].reshape(M, C)
            dw1_ref[dy, dx] += jnp.dot(xs.T, dh_b, preferred_element_type=jnp.float32)
            dw2_ref[dy, dx] += jnp.dot(zs.T, dr_b, preferred_element_type=jnp.float32)

    def _acc(ref, val):
        @pl.when(first)
        def _z():
            ref[:] = jnp.zeros_like(ref)
        ref[:] += val.astype(ref.dtype)

    _acc(db1_ref, db1)
    _acc(db2_ref, db2)
    _acc(dwd_ref, dwd)
    _acc(dbd_ref, dbd)
    _acc(dwu_ref, dwu)
    _acc(dbu_ref, dbu)


def _fwd_call(x, w1, b1, w2, b2, wd, bd, wu, bu):
    B, H, W, C = x.shape
    BB = _block_b(B, H * W * C, _FWD_BUDGET)
    grid = (B // BB,)
    full = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp))
    kern = functools.partial(_fwd_kernel, H=H, W=W, C=C, BB=BB)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, H, W, C), lambda i: (i, 0, 0, 0)),
            full(w1.shape), full(b1.shape), full(w2.shape), full(b2.shape),
            full(wd.shape), full(bd.shape), full(wu.shape), full(bu.shape),
        ],
        out_specs=pl.BlockSpec((BB, H, W, C), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
    )(x, w1, b1, w2, b2, wd, bd, wu, bu)


def _bwd_call(x, g, w1, b1, w2, b2, wd, bd, wu, bu):
    B, H, W, C = x.shape
    CR = wd.shape[1]
    BB = _block_b(B, H * W * C, _BWD_BUDGET)
    grid = (B // BB,)
    zero_map = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp))
    kern = functools.partial(_bwd_kernel, H=H, W=W, C=C, CR=CR, BB=BB)
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),            # dx
        jax.ShapeDtypeStruct((3, 3, C, C), f32),           # dw1
        jax.ShapeDtypeStruct((1, C), f32),                 # db1
        jax.ShapeDtypeStruct((3, 3, C, C), f32),           # dw2
        jax.ShapeDtypeStruct((1, C), f32),                 # db2
        jax.ShapeDtypeStruct((C, CR), f32),                # dwd
        jax.ShapeDtypeStruct((1, CR), f32),                # dbd
        jax.ShapeDtypeStruct((CR, C), f32),                # dwu
        jax.ShapeDtypeStruct((1, C), f32),                 # dbu
    )
    out_specs = (
        pl.BlockSpec((BB, H, W, C), lambda i: (i, 0, 0, 0)),
        zero_map((3, 3, C, C)), zero_map((1, C)),
        zero_map((3, 3, C, C)), zero_map((1, C)),
        zero_map((C, CR)), zero_map((1, CR)),
        zero_map((CR, C)), zero_map((1, C)),
    )
    in_specs = [
        pl.BlockSpec((BB, H, W, C), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((BB, H, W, C), lambda i: (i, 0, 0, 0)),
        zero_map(w1.shape), zero_map(b1.shape), zero_map(w2.shape), zero_map(b2.shape),
        zero_map(wd.shape), zero_map(bd.shape), zero_map(wu.shape), zero_map(bu.shape),
    ]
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=_interpret(),
    )(x, g, w1, b1, w2, b2, wd, bd, wu, bu)


@jax.custom_vjp
def fused_rcab(x, w1, b1, w2, b2, wd, bd, wu, bu):
    """y = x + CA(conv2(relu(conv1(x)))) ⊙ conv2(...) — fused RCAB."""
    return _fwd_call(x, w1, b1, w2, b2, wd, bd, wu, bu)


def _vjp_fwd(x, w1, b1, w2, b2, wd, bd, wu, bu):
    y = _fwd_call(x, w1, b1, w2, b2, wd, bd, wu, bu)
    return y, (x, w1, b1, w2, b2, wd, bd, wu, bu)


def _vjp_bwd(res, g):
    x, w1, b1, w2, b2, wd, bd, wu, bu = res
    dx, dw1, db1, dw2, db2, dwd, dbd, dwu, dbu = _bwd_call(
        x, g, w1, b1, w2, b2, wd, bd, wu, bu)
    cast = lambda d, w: d.astype(w.dtype)
    return (dx, cast(dw1, w1), cast(db1.reshape(b1.shape), b1),
            cast(dw2, w2), cast(db2.reshape(b2.shape), b2),
            cast(dwd, wd), cast(dbd.reshape(bd.shape), bd),
            cast(dwu, wu), cast(dbu.reshape(bu.shape), bu))


fused_rcab.defvjp(_vjp_fwd, _vjp_bwd)
