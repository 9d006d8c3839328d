"""Fused RCAB Pallas kernel — forward + custom VJP (v2: im2col in VMEM).

The RCAB (conv3x3 → relu → conv3x3 → channel-attention → residual add,
reference: sres/model/rcan/network.py:50) dominates RCAN: 200 instances ×
fwd/bwd per step, and XLA's conv lowering runs them at ~51-59 TFLOP/s
(PERF.md). This kernel keeps the whole block in VMEM and turns every conv
into ONE (M, 9C)×(9C, C) MXU matmul:

  * the 3×3 im2col patch matrix is materialized once per conv in a VMEM
    scratch buffer (9 sublane-shifted copies — VMEM-bandwidth cheap), giving
    full K=9C utilization instead of nine K=C matmuls (which waste half the
    MXU K dimension — the v1 design's loss);
  * one HBM read of x + one write of y per RCAB;
  * channel attention (global mean → C→C/r→C MLP → sigmoid gate) fuses in;
  * the backward kernel recomputes the forward from x (flash-attention-style
    rematerialization), reuses a single patch scratch across all six
    conv-like products, and accumulates weight grads across the sequential
    TPU grid.

Weight layouts match flax nn.Conv: (kh, kw, Cin, Cout); flattened (9C, C)
weight matrices (and the channel-transposed variants used by the transposed
convs in the backward) are prepared on the host at trace time. Numerics are
validated against the unfused composition in tests/test_pallas.py.
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
    """Largest divisor of ``batch`` whose live VMEM footprint stays within
    the scoped-vmem budget (patches buffer is 9C wide → dominates)."""
    cap = max(budget_elems // max(hwc, 1), 1)
    for cand in (8, 6, 4, 3, 2, 1):
        if batch % cand == 0 and cand <= cap:
            return cand
    return 1


# scoped VMEM is ~16MB; the patches scratch alone is BB*H*W*9C*2 bytes
_FWD_BUDGET = (11 * 1024 * 1024) // (9 * 2 + 4 * 4 + 2 * 4)   # bytes per elem-of-HWC
_BWD_BUDGET = (11 * 1024 * 1024) // (9 * 2 + 4 * 6 + 2 * 6)


def _fill_patches(pat_ref, xpad, H: int, W: int, C: int, M: int, flip: bool) -> None:
    """Write the (M, 9C) im2col matrix of ``xpad`` into the scratch ref.
    ``flip`` uses the spatially-reversed taps (transposed conv)."""
    k = 0
    for dy in range(3):
        for dx in range(3):
            sy, sx = (2 - dy, 2 - dx) if flip else (dy, dx)
            pat_ref[:, k * C:(k + 1) * C] = xpad[:, sy:sy + H, sx:sx + W, :].reshape(M, C)
            k += 1


def _pad_hw(x, B: int, H: int, W: int, C: int):
    return jnp.pad(x.reshape(B, H, W, C), ((0, 0), (1, 1), (1, 1), (0, 0)))


def _ca_forward(r_f32, wd_ref, bd_ref, wu_ref, bu_ref, B: int, HW: int, C: int):
    """Channel attention from the f32 conv2 output: returns (m, u, p, v, a)."""
    m = jnp.mean(r_f32.reshape(B, HW, C), axis=1)                       # (B, C)
    u = jnp.dot(m, wd_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32) + bd_ref[:].astype(jnp.float32)
    p = jnp.maximum(u, 0.0)
    v = jnp.dot(p, wu_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32) + bu_ref[:].astype(jnp.float32)
    a = jax.nn.sigmoid(v)
    return m, u, p, v, a


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, wd_ref, bd_ref, wu_ref, bu_ref,
                y_ref, pat_ref, *, H: int, W: int, C: int, BB: int):
    M, HW = BB * H * W, H * W
    x = x_ref[:]
    xpad = _pad_hw(x, BB, H, W, C)
    _fill_patches(pat_ref, xpad, H, W, C, M, flip=False)
    h = jnp.dot(pat_ref[:], w1_ref[:], preferred_element_type=jnp.float32) \
        + b1_ref[:].astype(jnp.float32)
    z = jnp.maximum(h, 0.0).astype(x.dtype)
    zpad = _pad_hw(z, BB, H, W, C)
    _fill_patches(pat_ref, zpad, H, W, C, M, flip=False)
    r = jnp.dot(pat_ref[:], w2_ref[:], preferred_element_type=jnp.float32) \
        + b2_ref[:].astype(jnp.float32)
    _, _, _, _, a = _ca_forward(r, wd_ref, bd_ref, wu_ref, bu_ref, BB, HW, C)
    gated = r.reshape(BB, HW, C) * a[:, None, :]
    y = x.reshape(BB, HW, C).astype(jnp.float32) + gated
    y_ref[:] = y.reshape(BB, H, W, C).astype(x.dtype)


def _bwd_kernel(x_ref, g_ref, w1_ref, w1t_ref, b1_ref, w2_ref, w2t_ref, b2_ref,
                wd_ref, bd_ref, wu_ref, bu_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dwd_ref, dbd_ref,
                dwu_ref, dbu_ref, pat_ref, *, H: int, W: int, C: int, CR: int, BB: int):
    M, HW = BB * H * W, H * W
    first = pl.program_id(0) == 0

    x = x_ref[:]
    g = g_ref[:].reshape(BB, HW, C).astype(jnp.float32)

    # --- recompute forward (conv1) ---
    xpad = _pad_hw(x, BB, H, W, C)
    _fill_patches(pat_ref, xpad, H, W, C, M, flip=False)
    h = jnp.dot(pat_ref[:], w1_ref[:], preferred_element_type=jnp.float32) \
        + b1_ref[:].astype(jnp.float32)
    z = jnp.maximum(h, 0.0).astype(x.dtype)

    # --- conv2 + CA forward, dW2 while z-patches are resident ---
    zpad = _pad_hw(z, BB, H, W, C)
    _fill_patches(pat_ref, zpad, H, W, C, M, flip=False)
    r = jnp.dot(pat_ref[:], w2_ref[:], preferred_element_type=jnp.float32) \
        + b2_ref[:].astype(jnp.float32)
    m, u, p, v, a = _ca_forward(r, wd_ref, bd_ref, wu_ref, bu_ref, BB, HW, C)
    r3 = r.reshape(BB, HW, C)

    da = jnp.sum(g * r3, axis=1)
    dv = da * a * (1.0 - a)
    dwu = jnp.dot(p.T, dv, preferred_element_type=jnp.float32)
    dbu = jnp.sum(dv, axis=0, keepdims=True)
    dp = jnp.dot(dv, wu_ref[:].astype(jnp.float32).T, preferred_element_type=jnp.float32)
    du = dp * (u > 0.0)
    dwd = jnp.dot(m.T, du, preferred_element_type=jnp.float32)
    dbd = jnp.sum(du, axis=0, keepdims=True)
    dm = jnp.dot(du, wd_ref[:].astype(jnp.float32).T, preferred_element_type=jnp.float32)
    dr = (g * a[:, None, :] + dm[:, None, :] / HW).reshape(M, C)
    dr_b = dr.astype(x.dtype)
    db2 = jnp.sum(dr, axis=0, keepdims=True)
    # contract over M directly (dims ((0,),(0,))) — no transposed patch copy
    dw2_part = jax.lax.dot_general(pat_ref[:], dr_b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)  # (9C, C)

    # --- dz via transposed conv (flipped taps, channel-transposed weights) ---
    drpad = _pad_hw(dr_b, BB, H, W, C)
    _fill_patches(pat_ref, drpad, H, W, C, M, flip=True)
    dz = jnp.dot(pat_ref[:], w2t_ref[:], preferred_element_type=jnp.float32)
    dh = jnp.where(h > 0.0, dz, 0.0)
    dh_b = dh.astype(x.dtype)
    db1 = jnp.sum(dh, axis=0, keepdims=True)

    # --- dW1 with rebuilt x-patches ---
    _fill_patches(pat_ref, xpad, H, W, C, M, flip=False)
    dw1_part = jax.lax.dot_general(pat_ref[:], dh_b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # --- dx via transposed conv1 + residual ---
    dhpad = _pad_hw(dh_b, BB, H, W, C)
    _fill_patches(pat_ref, dhpad, H, W, C, M, flip=True)
    dxc = jnp.dot(pat_ref[:], w1t_ref[:], preferred_element_type=jnp.float32)
    dx_ref[:] = (g.reshape(M, C) + dxc).reshape(BB, H, W, C).astype(x.dtype)

    # --- accumulate weight grads across the sequential grid ---
    def _acc(ref, val):
        @pl.when(first)
        def _z():
            ref[:] = jnp.zeros_like(ref)
        ref[:] += val.astype(ref.dtype)

    _acc(dw1_ref, dw1_part)
    _acc(dw2_ref, dw2_part)
    _acc(db1_ref, db1)
    _acc(db2_ref, db2)
    _acc(dwd_ref, dwd)
    _acc(dbd_ref, dbd)
    _acc(dwu_ref, dwu)
    _acc(dbu_ref, dbu)


def _wmat(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) → (9Cin, Cout), tap-major (matches _fill_patches)."""
    return w.reshape(-1, w.shape[-1])


def _wmat_t(w: jnp.ndarray) -> jnp.ndarray:
    """Channel-transposed variant for the transposed conv: W[dy,dx].T stacked."""
    return jnp.transpose(w, (0, 1, 3, 2)).reshape(-1, w.shape[-2])


def _fwd_call(x, w1, b1, w2, b2, wd, bd, wu, bu):
    B, H, W, C = x.shape
    BB = _block_b(B, H * W * C, _FWD_BUDGET)
    M = BB * H * W
    full = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp))
    kern = functools.partial(_fwd_kernel, H=H, W=W, C=C, BB=BB)
    w1m, w2m = _wmat(w1), _wmat(w2)
    return pl.pallas_call(
        kern,
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB, H, W, C), lambda i: (i, 0, 0, 0)),
            full(w1m.shape), full(b1.shape), full(w2m.shape), full(b2.shape),
            full(wd.shape), full(bd.shape), full(wu.shape), full(bu.shape),
        ],
        out_specs=pl.BlockSpec((BB, H, W, C), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((M, 9 * C), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, w1m, b1, w2m, b2, wd, bd, wu, bu)


def _bwd_call(x, g, w1, b1, w2, b2, wd, bd, wu, bu):
    B, H, W, C = x.shape
    CR = wd.shape[1]
    BB = _block_b(B, H * W * C, _BWD_BUDGET)
    M = BB * H * W
    full = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp))
    kern = functools.partial(_bwd_kernel, H=H, W=W, C=C, CR=CR, BB=BB)
    f32 = jnp.float32
    w1m, w1t = _wmat(w1), _wmat_t(w1)
    w2m, w2t = _wmat(w2), _wmat_t(w2)
    out_shape = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),            # dx
        jax.ShapeDtypeStruct((9 * C, C), f32),             # dw1 (flat)
        jax.ShapeDtypeStruct((1, C), f32),                 # db1
        jax.ShapeDtypeStruct((9 * C, C), f32),             # dw2 (flat)
        jax.ShapeDtypeStruct((1, C), f32),                 # db2
        jax.ShapeDtypeStruct((C, CR), f32),                # dwd
        jax.ShapeDtypeStruct((1, CR), f32),                # dbd
        jax.ShapeDtypeStruct((CR, C), f32),                # dwu
        jax.ShapeDtypeStruct((1, C), f32),                 # dbu
    )
    out_specs = (
        pl.BlockSpec((BB, H, W, C), lambda i: (i, 0, 0, 0)),
        full((9 * C, C)), full((1, C)), full((9 * C, C)), full((1, C)),
        full((C, CR)), full((1, CR)), full((CR, C)), full((1, C)),
    )
    in_specs = [
        pl.BlockSpec((BB, H, W, C), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((BB, H, W, C), lambda i: (i, 0, 0, 0)),
        full(w1m.shape), full(w1t.shape), full(b1.shape),
        full(w2m.shape), full(w2t.shape), full(b2.shape),
        full(wd.shape), full(bd.shape), full(wu.shape), full(bu.shape),
    ]
    outs = pl.pallas_call(
        kern, grid=(B // BB,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((M, 9 * C), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, g, w1m, w1t, b1, w2m, w2t, b2, wd, bd, wu, bu)
    dx, dw1f, db1, dw2f, db2, dwd, dbd, dwu, dbu = outs
    dw1 = dw1f.reshape(3, 3, C, C)
    dw2 = dw2f.reshape(3, 3, C, C)
    return dx, dw1, db1, dw2, db2, dwd, dbd, dwu, dbu


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
