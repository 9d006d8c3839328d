"""Fused window multi-head attention Pallas kernel (forward + custom VJP).

One kernel computes the whole windowed-MHA block for SwinIR
(models/swinir.py): QKV projection, per-(window·head) batched scores with
relative-position bias (+ optional shifted-window mask), softmax, value
aggregation and the output projection — all VMEM-resident, so the six
(NW, T, C) intermediates XLA would round-trip through HBM never leave the
chip. The backward recomputes the forward from the window tokens
(flash-attention-style) and accumulates weight grads across the sequential
grid. T = window_size² (64 for 8×8 windows) is small, so full (T, T) scores
fit trivially and no online-softmax tiling is needed.

Heads are cut by static lane slices of the packed QKV (a 5-D transpose
formulation crashes the tunneled Mosaic compiler). Measured on one v5e chip:
1.85x faster than the XLA composition (4.0 vs 7.4 ms fwd+bwd for 2592
windows of 64 tokens). Bias input is the (h, T, T) relative-position bias;
``mask`` is a per-window (NW, T, T) additive tensor (zeros for non-shifted
blocks, the tiled shifted-window mask otherwise) sliced per grid block.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sres_tpu.ops.pallas.partition import batch_partitioned


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_w(nw: int, t: int = 64) -> int:
    """Windows per grid block, capped so the per-head (BW, T, T) scores the
    backward keeps resident stay within VMEM (16×16 windows → T=256 needs
    16× smaller blocks than the 8×8 default)."""
    cap = max(1, (32 * 64 * 64) // (t * t))
    for cand in (32, 16, 8, 4, 2, 1):
        if cand <= cap and nw % cand == 0:
            return cand
    return 1


def _attn_forward(x, wqkv, bqkv, bias, mask, heads: int):
    """Shared fwd math on VMEM values. x: (BW, T, C). Per-head q/k/v are cut
    by STATIC lane slices of the packed qkv (no 5-D transposes — the remote
    Mosaic compiler crashes lowering those). Returns (qs, ks, vs, ps, o) with
    per-head lists and the merged (BW·T, C) attention output."""
    bw, t, c = x.shape
    hd = c // heads
    qkv = jnp.dot(x.reshape(bw * t, c), wqkv[:],
                  preferred_element_type=jnp.float32) + bqkv[:].astype(jnp.float32)
    qkv = qkv.reshape(bw, t, 3 * c)
    qs, ks, vs, ps, os_ = [], [], [], [], []
    for hh in range(heads):
        q = qkv[:, :, hh * hd:(hh + 1) * hd]
        k = qkv[:, :, c + hh * hd:c + (hh + 1) * hd]
        v = qkv[:, :, 2 * c + hh * hd:2 * c + (hh + 1) * hd]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * (hd ** -0.5)
        s = s + bias[hh].astype(jnp.float32)[None] + mask[:].astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        qs.append(q); ks.append(k); vs.append(v); ps.append(p); os_.append(o)
    o = jnp.concatenate(os_, axis=2).reshape(bw * t, c)
    return qs, ks, vs, ps, o


def _fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, bias_ref, mask_ref, y_ref,
                *, heads: int, BW: int):
    x = x_ref[:]
    bw, t, c = x.shape
    _, _, _, _, o = _attn_forward(x, wqkv_ref, bqkv_ref, bias_ref, mask_ref, heads)
    y = jnp.dot(o.astype(x.dtype), wo_ref[:], preferred_element_type=jnp.float32) \
        + bo_ref[:].astype(jnp.float32)
    y_ref[:] = y.reshape(bw, t, c).astype(x.dtype)


def _bwd_kernel(x_ref, g_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, bias_ref, mask_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dbias_ref,
                *, heads: int, BW: int):
    first = pl.program_id(0) == 0
    x = x_ref[:]
    bw, t, c = x.shape
    hd = c // heads
    g = g_ref[:].reshape(bw * t, c).astype(jnp.float32)

    qs, ks, vs, ps, o = _attn_forward(x, wqkv_ref, bqkv_ref, bias_ref, mask_ref, heads)

    # output projection backward
    dwo = jax.lax.dot_general(o.astype(x.dtype), g.astype(x.dtype),
                              (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbo = jnp.sum(g, axis=0, keepdims=True)
    do_flat = jnp.dot(g.astype(x.dtype), wo_ref[:].T, preferred_element_type=jnp.float32)
    do3 = do_flat.reshape(bw, t, c)

    # attention backward, per head (static lane slices)
    dqs, dks, dvs, dbias_h = [], [], [], []
    for hh in range(heads):
        do = do3[:, :, hh * hd:(hh + 1) * hd]
        pb, q, k, v = ps[hh], qs[hh], ks[hh], vs[hh]
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)      # (BW,T,T)
        dv = jax.lax.dot_general(pb, do, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)      # (BW,T,hd)
        ds = pb * (dp - jnp.sum(dp * pb, axis=-1, keepdims=True))
        dbias_h.append(jnp.sum(ds, axis=0))
        ds = ds * (hd ** -0.5)
        dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq); dks.append(dk); dvs.append(dv)
    dbias = jnp.stack(dbias_h, axis=0)                                    # (h,T,T)

    # qkv projection backward: repack per-head grads along lanes
    dqkv = jnp.concatenate(
        [jnp.concatenate(dqs, axis=2), jnp.concatenate(dks, axis=2),
         jnp.concatenate(dvs, axis=2)], axis=2).reshape(bw * t, 3 * c)
    dqkv_b = dqkv.astype(x.dtype)
    xf = x.reshape(bw * t, c)
    dwqkv = jax.lax.dot_general(xf, dqkv_b, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    dx = jnp.dot(dqkv_b, wqkv_ref[:].T, preferred_element_type=jnp.float32)
    dx_ref[:] = dx.reshape(bw, t, c).astype(x.dtype)

    def _acc(ref, val):
        @pl.when(first)
        def _z():
            ref[:] = jnp.zeros_like(ref)
        ref[:] += val.astype(ref.dtype)

    _acc(dwqkv_ref, dwqkv)
    _acc(dbqkv_ref, dbqkv)
    _acc(dwo_ref, dwo)
    _acc(dbo_ref, dbo)
    _acc(dbias_ref, dbias)


def _specs(shapes):
    return [pl.BlockSpec(s, lambda i, _s=s: tuple(0 for _ in _s)) for s in shapes]


def _fwd_call_impl(x, wqkv, bqkv, wo, bo, bias, mask, heads: int):
    nw, t, c = x.shape
    BW = _block_w(nw, t)
    kern = functools.partial(_fwd_kernel, heads=heads, BW=BW)
    return pl.pallas_call(
        kern, grid=(nw // BW,),
        in_specs=[pl.BlockSpec((BW, t, c), lambda i: (i, 0, 0))] +
                 _specs([wqkv.shape, bqkv.shape, wo.shape, bo.shape, bias.shape]) +
                 [pl.BlockSpec((BW, t, t), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((BW, t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, wqkv, bqkv, wo, bo, bias, mask)


# dp sharding contract: x and mask are window-batch-leading, weights/bias
# replicated; the output inherits x's leading-axis sharding. _block_w
# re-picks BW from the LOCAL shard length inside the impl, so no
# local_bs_argnum is needed.
_fwd_call = batch_partitioned(
    static_argnums=(7,),
    rule="t a1 a2, b1 b2, c1 c2, d1 d2, e1 e2, f1 f2 f3, t m1 m2 -> t a1 a2",
    batch_args=(0, 6),
)(_fwd_call_impl)


def _bwd_call_impl(x, g, wqkv, bqkv, wo, bo, bias, mask, heads: int):
    nw, t, c = x.shape
    h = heads
    BW = _block_w(nw, t)
    kern = functools.partial(_bwd_kernel, heads=heads, BW=BW)
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct(wqkv.shape, f32), jax.ShapeDtypeStruct(bqkv.shape, f32),
        jax.ShapeDtypeStruct(wo.shape, f32), jax.ShapeDtypeStruct(bo.shape, f32),
        jax.ShapeDtypeStruct(bias.shape, f32),
    )
    out_specs = tuple([pl.BlockSpec((BW, t, c), lambda i: (i, 0, 0))] +
                      _specs([wqkv.shape, bqkv.shape, wo.shape, bo.shape, bias.shape]))
    in_specs = [pl.BlockSpec((BW, t, c), lambda i: (i, 0, 0)),
                pl.BlockSpec((BW, t, c), lambda i: (i, 0, 0))] + \
        _specs([wqkv.shape, bqkv.shape, wo.shape, bo.shape, bias.shape]) + \
        [pl.BlockSpec((BW, t, t), lambda i: (i, 0, 0))]
    return pl.pallas_call(
        kern, grid=(nw // BW,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, g, wqkv, bqkv, wo, bo, bias, mask)


# weight/bias grads are sums over the window-batch axis: psum-ed inside the
# partitioned body, replicated outside; dx stays batch-sharded.
_bwd_call = batch_partitioned(
    static_argnums=(8,),
    rule=("t a1 a2, t a1 a2, b1 b2, c1 c2, d1 d2, e1 e2, f1 f2 f3, t m1 m2 "
          "-> t a1 a2, b1 b2, c1 c2, d1 d2, e1 e2, f1 f2 f3"),
    summed=(1, 2, 3, 4, 5),
    batch_args=(0, 1, 7),
)(_bwd_call_impl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_window_attention(x, wqkv, bqkv, wo, bo, bias, mask, heads: int):
    """(NW, T, C) window tokens → attended tokens. bias: (h, T, T) additive
    relative-position bias; mask: per-window (NW, T, T) additive (zeros when
    unshifted)."""
    return _fwd_call(x, wqkv, bqkv, wo, bo, bias, mask, heads)


def _vjp_fwd(x, wqkv, bqkv, wo, bo, bias, mask, heads):
    y = _fwd_call(x, wqkv, bqkv, wo, bo, bias, mask, heads)
    return y, (x, wqkv, bqkv, wo, bo, bias, mask)


def _vjp_bwd(heads, res, g):
    x, wqkv, bqkv, wo, bo, bias, mask = res
    dx, dwqkv, dbqkv, dwo, dbo, dbias = _bwd_call(x, g, wqkv, bqkv, wo, bo, bias, mask, heads)
    cast = lambda d, w: d.astype(w.dtype).reshape(w.shape)
    return (dx, cast(dwqkv, wqkv), cast(dbqkv, bqkv), cast(dwo, wo),
            cast(dbo, bo), cast(dbias, bias), jnp.zeros_like(mask))


fused_window_attention.defvjp(_vjp_fwd, _vjp_bwd)
