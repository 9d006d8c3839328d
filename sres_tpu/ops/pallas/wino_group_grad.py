"""Differentiable whole-group Winograd RCAB chain: custom VJP over
ops/pallas/winograd_conv.py:wino_group_fwd.

Why: the round-3 bisection (PERF.md) measured the per-conv Winograd
kernel's block pipeline at 0.163 ms/conv against 0.090 ms of actual
transform+GEMM work, and the per-conv BACKWARD is pipeline-bound outright
(0.32 ms/conv ≈ its 4-operand block I/O). This module keeps the backward's
activations/cotangent resident in VMEM across the whole RCAB stack
(reference RCAB semantics: sres/model/rcan/network.py:50-66):

- forward = wino_group_fwd (one pallas_call per residual group); the only
  VJP residuals are the group input and the weights — no per-conv stash,
- backward = (1) a recompute sweep (`_stash_call`) that replays the chain
  and writes each RCAB's INPUT a_k to HBM (remat-style: one group's stash
  is alive at a time, ~0.5 GB at the bench operating point), then
  (2) reversed CHUNKED backward kernels (`_bwd_chunk_call`, NB_CHUNK RCABs
  per pallas_call): grid (samples, k) with k running the chunk in reverse,
  the cotangent carried in f32 scratch, conv1/conv2/channel-attention
  recomputed in-kernel from a_k, and dU/db/CA grads accumulated into
  constant-index output blocks that stay VMEM-resident for the whole call
  (the f32 dU accumulator is what bounds the chunk size: 4 RCABs = 19 MB).

Gradients are EXACT adjoints of the forward math (same guarantee as
wino_conv_quad's VJP — tested against jax.grad of the composed direct-conv
reference in tests/test_winograd.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sres_tpu.ops.pallas.partition import batch_partitioned
from sres_tpu.ops.pallas.winograd_conv import (_interpret, _rup,
                                               wino_group_fwd)
from sres_tpu.ops.winograd import (WinoSpec, at_apply, at_t_apply, bt_apply,
                                   bt_t_apply, interior_mask,
                                   untransform_weight_grad,
                                   transform_weights, wino_spec)

# RCABs per backward pallas_call — bounds the resident f32 dU accumulator
# (NB_CHUNK × 2 convs × n² taps × 128 × 128 × 4 B ≈ 19 MB at m=4). Env
# override for on-chip VMEM tuning: SRES_WINO_NB_CHUNK.
import os as _os

NB_CHUNK = int(_os.environ.get("SRES_WINO_NB_CHUNK", "4"))


def _stash_primal() -> bool:
    """Stash-in-primal-forward mode (SRES_WINO_STASH_PRIMAL=1): the primal
    forward runs the stash sweep directly — each RCAB input is written to
    HBM as the chain advances and saved as a VJP residual, so the backward
    skips the chain replay (saves one group-forward per group per step,
    ~8% of train est.). Cost: every group's stash is alive until its
    backward (~5.2 GB at batch 72 / 10 groups) instead of one at a time —
    viable at b72, not b144 (ROADMAP). Read at TRACE time: flipping the env
    var does not invalidate already-compiled jits."""
    return _os.environ.get("SRES_WINO_STASH_PRIMAL", "0") == "1"


def _idx(n, i, j):
    return i * n + j


def _conv_fwd(src, dst, u_at, bias, relu, *, spec, bs, w1, mm, mask, xdt):
    """One Winograd conv unit on resident quad planes (shared by the stash
    sweep and the in-kernel recompute): stage1(src) → tap GEMMs → inverse
    (+bias, +relu) into dst. dst's borders must already be zero. Transforms
    run through the factored programs (ops/winograd.py: bt_apply/at_apply —
    ~2× fewer VPU ops than per-row combination)."""
    m, n = spec.m, spec.n
    mflat, mp = spec.mflat, _rup(spec.mflat)
    for p in range(n):
        taps = []
        for q in range(n):
            pidx, off = spec.in_tap(p, q)
            taps.append(src[:, pidx, pl.ds(off, mflat), :])
        rows = bt_apply(m, taps)
        for tj in range(n):
            w1[_idx(n, p, tj), :, pl.ds(0, mflat), :] = rows[tj].astype(xdt)
    for tj in range(n):
        vs = bt_apply(m, [w1[_idx(n, p, tj), :, :, :] for p in range(n)])
        for ti in range(n):
            mm[_idx(n, ti, tj), :, :, :] = jnp.dot(
                vs[ti].astype(xdt).reshape(bs * mp, 128), u_at(_idx(n, ti, tj)),
                preferred_element_type=jnp.float32).reshape(bs, mp, 128)
    zcol = {}
    for tj in range(n):
        zs = at_apply(m, [mm[_idx(n, ti, tj), :, pl.ds(0, mflat), :]
                          for ti in range(n)])
        for u in range(m):
            zcol[(u, tj)] = zs[u]
    for u in range(m):
        ys = at_apply(m, [zcol[(u, tj)] for tj in range(n)])
        for v_ in range(m):
            y = ys[v_] + bias
            if relu:
                y = jnp.maximum(y, 0.0)
            pidx, off = spec.out_tap(u, v_)
            dst[:, pidx, pl.ds(off, mflat), :] = (y * mask).astype(xdt)


def _ca_fwd(rb, cw1, cb1, cw2, cb2, *, npix):
    """Channel attention forward on resident planes (borders zero ⇒ plane
    sum / npix is the true spatial mean). Returns (s, h, g) in f32."""
    s = jnp.sum(rb[:, :, :, :].astype(jnp.float32), axis=(1, 2)) \
        * np.float32(1.0 / npix)
    h = jnp.maximum(jnp.dot(s, cw1, preferred_element_type=jnp.float32)
                    + cb1, 0.0)
    g = jax.nn.sigmoid(jnp.dot(h, cw2, preferred_element_type=jnp.float32)
                       + cb2)
    return s, h, g


# ------------------------------------------------------------ stash sweep
def _stash_kernel(xq_ref, u_ref, b_ref, cw1_ref, cb1_ref, cw2_ref, cb2_ref,
                  mask_ref, as_ref, zq_ref, qc, rb, w1, mm,
                  *, spec: WinoSpec, bs: int, npix: int, gated: bool,
                  res_scale: float, trail: bool = False):
    mflat, mp = spec.mflat, _rup(spec.mflat)
    xdt = xq_ref.dtype
    mask = mask_ref[pl.ds(0, mflat), :]
    k = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (k == 0))
    def _zero_scratch():
        w1[:] = jnp.zeros_like(w1)

    @pl.when(k == 0)
    def _load_block():
        qc[:] = xq_ref[:]

    # a_k = this step's input → HBM stash (for trail=True, the last step's
    # stash slot holds the chain output z = the trailing conv's input)
    as_ref[:, 0] = qc[:]

    kw = dict(spec=spec, bs=bs, w1=w1, mm=mm, mask=mask, xdt=xdt)

    def _residual_block():
        rb[:] = jnp.zeros_like(rb)
        _conv_fwd(qc, rb, lambda i: u_ref[0, 0, i],
                  b_ref[0, 0, :].astype(jnp.float32), True, **kw)
        _conv_fwd(rb, rb, lambda i: u_ref[0, 1, i],
                  b_ref[0, 1, :].astype(jnp.float32), False, **kw)
        if gated:
            _, _, g = _ca_fwd(rb, cw1_ref[0], cb1_ref[0], cw2_ref[0],
                              cb2_ref[0], npix=npix)
            gate = g[:, None, None, :]
        else:
            gate = np.float32(res_scale)
        qc[:] = (qc[:].astype(jnp.float32)
                 + rb[:].astype(jnp.float32) * gate).astype(xdt)

    if trail:
        pl.when(k < pl.num_programs(1) - 1)(_residual_block)

        @pl.when(k == pl.num_programs(1) - 1)
        def _trailing_conv():
            rb[:] = jnp.zeros_like(rb)
            _conv_fwd(qc, rb, lambda i: u_ref[0, 0, i],
                      b_ref[0, 0, :].astype(jnp.float32), False, **kw)
            qc[:] = (xq_ref[:].astype(jnp.float32)
                     + rb[:].astype(jnp.float32)).astype(xdt)
    else:
        _residual_block()

    # chain output (for the trailing-conv backward when the trail is folded
    # into the forward kernel — callers that don't need it ignore the output)
    @pl.when(k == pl.num_programs(1) - 1)
    def _store_final():
        zq_ref[:] = qc[:]


def _stash_call(xq, u, bv, cw1, cb1, cw2, cb2, spec: WinoSpec, bs: int,
                npix: int, gated: bool = True, res_scale: float = 1.0,
                ut=None, bt_=None):
    """Replay the chain; returns (astash, z): each RCAB's input stashed to
    HBM plus the chain output z (the trailing conv's input).

    ut/bt_ (transformed trailing kernel (n², 128, 128) + bias (128,)), when
    given, run the group's TRAILING conv + group skip as one extra grid
    step (the stash-in-primal forward for the *_trail variants): astash
    gains a slot nb holding z, and the second return value is the group
    OUTPUT y = xq + conv(z) instead of z."""
    t = xq.shape[0]
    nb = u.shape[0]
    n2 = spec.n * spec.n
    mp = _rup(spec.mflat)
    m2 = spec.m * spec.m
    xdt = xq.dtype
    cah = cw1.shape[-1]
    trail = ut is not None
    if trail:
        u = jnp.concatenate(
            [u, jnp.stack([ut.astype(xdt),
                           jnp.zeros((n2, 128, 128), xdt)])[None]], axis=0)
        bv = jnp.concatenate(
            [bv, jnp.stack([bt_.astype(bv.dtype),
                            jnp.zeros((128,), bv.dtype)])[None]], axis=0)
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], axis=0)
        cw1, cb1, cw2, cb2 = map(zpad, (cw1, cb1, cw2, cb2))
        nb = nb + 1
    from sres_tpu.ops.pallas.winograd_conv import _mask_arr
    return _stash_exec(xq, u, bv, cw1, cb1, cw2, cb2, _mask_arr(spec),
                       spec, bs, gated, res_scale, trail)


def _stash_exec_impl(xq, u, bv, cw1, cb1, cw2, cb2, mask, spec, bs, gated,
                     res_scale, trail):
    t = xq.shape[0]
    nb = u.shape[0]
    n2 = spec.n * spec.n
    mp = _rup(spec.mflat)
    m2 = spec.m * spec.m
    xdt = xq.dtype
    cah = cw1.shape[-1]
    blk = pl.BlockSpec((bs, m2, spec.pp, 128), lambda i, k: (i, 0, 0, 0))
    kblk = lambda *shape: pl.BlockSpec((1,) + shape,
                                       lambda i, k: (k,) + (0,) * len(shape))
    return pl.pallas_call(
        functools.partial(_stash_kernel, spec=spec, bs=bs,
                          npix=spec.h * spec.w,
                          gated=gated, res_scale=res_scale, trail=trail),
        grid=(t // bs, nb),
        in_specs=[blk, kblk(2, n2, 128, 128), kblk(2, 128),
                  kblk(128, cah), kblk(1, cah), kblk(cah, 128), kblk(1, 128),
                  pl.BlockSpec((mp, 1), lambda i, k: (0, 0))],
        out_specs=(pl.BlockSpec((bs, 1, m2, spec.pp, 128),
                                lambda i, k: (i, k, 0, 0, 0)),
                   blk),
        out_shape=(jax.ShapeDtypeStruct((t, nb, m2, spec.pp, 128), xdt),
                   jax.ShapeDtypeStruct((t, m2, spec.pp, 128), xdt)),
        scratch_shapes=[pltpu.VMEM((bs, m2, spec.pp, 128), xdt),
                        pltpu.VMEM((bs, m2, spec.pp, 128), xdt),
                        pltpu.VMEM((n2, bs, mp, 128), xdt),
                        pltpu.VMEM((n2, bs, mp, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(xq, u, bv, cw1, cb1, cw2, cb2, mask)


_stash_exec = batch_partitioned(
    static_argnums=(8, 9, 10, 11, 12),
    rule=("t a1 a2 a3, b1 b2 b3 b4 b5, c1 c2 c3, d1 d2 d3, e1 e2 e3, "
          "f1 f2 f3, g1 g2 g3, p1 p2 -> t s1 s2 s3 s4, t a1 a2 a3"),
    local_bs_argnum=9,
)(_stash_exec_impl)


# -------------------------------------------------------- backward chunk
def _conv_adj(dc_fn, src, dprev, u_at, du_at, *, spec, bs, w1, zz, gm,
              mask, xdt, accum_dprev):
    """Exact adjoint of one conv unit on resident planes.

    dc_fn(pidx, off) returns the (bs, mflat, 128) f32 GATED output cotangent
    at that quad position (the caller applies relu gating / CA scaling);
    src = the conv's input planes (for V and dU); du_at(tap, val) adds the
    tap's weight-grad contribution. The input cotangent lands in dprev (f32
    scratch; += if accum_dprev). Returns the bias grad ((1, 128) f32)."""
    m, n = spec.m, spec.n
    mflat, mp = spec.mflat, _rup(spec.mflat)

    # dM-adjoint of the cotangent + bias grad
    db = jnp.zeros((1, 1, 128), jnp.float32)
    for u in range(m):
        gtap = []
        for v_ in range(m):
            pidx, off = spec.out_tap(u, v_)
            gt = dc_fn(pidx, off)
            db = db + jnp.sum(gt, axis=(0, 1), keepdims=True)
            gtap.append(gt)
        outs = at_t_apply(m, gtap)
        for tj in range(n):
            zz[u * n + tj, :, pl.ds(0, mflat), :] = outs[tj].astype(xdt)

    # V recompute from src
    for p in range(n):
        taps = []
        for q in range(n):
            pidx, off = spec.in_tap(p, q)
            taps.append(src[:, pidx, pl.ds(off, mflat), :])
        rows = bt_apply(m, taps)
        for tj in range(n):
            w1[_idx(n, p, tj), :, pl.ds(0, mflat), :] = rows[tj].astype(xdt)

    # per tap: dM; dU += VᵀdM; dv = dM·Uᵀ
    for tj in range(n):
        gs = at_t_apply(m, [zz[u * n + tj, :, :, :] for u in range(m)])
        vs = bt_apply(m, [w1[_idx(n, p, tj), :, :, :] for p in range(n)])
        for ti in range(n):
            g_bf = gs[ti].astype(xdt).reshape(bs * mp, 128)
            v = vs[ti].astype(xdt).reshape(bs * mp, 128)
            du_at(_idx(n, ti, tj), jax.lax.dot_general(
                v, g_bf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dv = jax.lax.dot_general(
                g_bf, u_at(_idx(n, ti, tj)), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            gm[_idx(n, ti, tj), :, :, :] = dv.reshape(bs, mp, 128).astype(xdt)

    # dx 2-stage, overlap-added straight into dprev (w1 is free to reuse)
    if not accum_dprev:
        dprev[:] = jnp.zeros_like(dprev)
    for ti in range(n):
        outs = bt_t_apply(m, [gm[_idx(n, ti, tj), :, :, :] for tj in range(n)])
        for q in range(n):
            w1[_idx(n, ti, q), :, :, :] = outs[q].astype(xdt)
    for q in range(n):
        dds = bt_t_apply(m, [w1[_idx(n, ti, q), :, pl.ds(0, mflat), :]
                             for ti in range(n)])
        for p in range(n):
            pidx, off = spec.in_tap(p, q)
            dprev[:, pidx, pl.ds(off, mflat), :] += dds[p] * mask
    return db[0]


def _bwd_chunk_kernel(dy_ref, as_ref, u_ref, b_ref, cw1_ref, cb1_ref,
                      cw2_ref, cb2_ref, mask_ref,
                      dx_ref, du_ref, db_ref, dcw1_ref, dcb1_ref, dcw2_ref,
                      dcb2_ref,
                      da, dc, c1, c2, w1, zz, gm, mm,
                      *, spec: WinoSpec, bs: int, nbc: int, npix: int,
                      gated: bool, res_scale: float):
    m, n = spec.m, spec.n
    mflat, mp = spec.mflat, _rup(spec.mflat)
    xdt = as_ref.dtype
    mask = mask_ref[pl.ds(0, mflat), :]
    kk = pl.program_id(1)           # 0..nbc-1, processing RCAB nbc-1-kk
    kloc = nbc - 1 - kk             # chunk-local RCAB index for grad slots

    @pl.when((pl.program_id(0) == 0) & (kk == 0))
    def _zero_grads():
        # w1/zz tail rows (mflat..mp) are never written but ARE contracted
        # over by the full-row dU GEMMs — they must read as zero
        w1[:] = jnp.zeros_like(w1)
        zz[:] = jnp.zeros_like(zz)
        du_ref[:] = jnp.zeros_like(du_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dcw1_ref[:] = jnp.zeros_like(dcw1_ref)
        dcb1_ref[:] = jnp.zeros_like(dcb1_ref)
        dcw2_ref[:] = jnp.zeros_like(dcw2_ref)
        dcb2_ref[:] = jnp.zeros_like(dcb2_ref)

    @pl.when(kk == 0)
    def _load_cotangent():
        da[:] = dy_ref[:]

    kw = dict(spec=spec, bs=bs, w1=w1, mm=mm, mask=mask, xdt=xdt)
    akw = dict(spec=spec, bs=bs, w1=w1, zz=zz, gm=gm, mask=mask, xdt=xdt)

    # ---- recompute the RCAB forward from the stashed input a_k
    # (input-side refs are reverse-index-mapped: [0] is always RCAB nbc-1-kk)
    a = as_ref.at[:, 0]
    c1[:] = jnp.zeros_like(c1)
    _conv_fwd(a, c1, lambda i: u_ref[0, 0, i],
              b_ref[0, 0, :].astype(jnp.float32), True, **kw)
    c2[:] = jnp.zeros_like(c2)
    _conv_fwd(c1, c2, lambda i: u_ref[0, 1, i],
              b_ref[0, 1, :].astype(jnp.float32), False, **kw)
    if gated:
        s, h, g = _ca_fwd(c2, cw1_ref[0], cb1_ref[0], cw2_ref[0], cb2_ref[0],
                          npix=npix)

        # ---- channel-attention backward (da = RCAB-output cotangent)
        dg = jnp.sum(da[:, :, :, :] * c2[:, :, :, :].astype(jnp.float32),
                     axis=(1, 2))                               # (bs, 128)
        dz2 = dg * g * (1.0 - g)
        dcb2_ref[kloc] += jnp.sum(dz2, axis=0, keepdims=True)
        dcw2_ref[kloc] += jax.lax.dot_general(
            h, dz2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (cah, 128)
        dh = jax.lax.dot_general(dz2, cw2_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dz1 = jnp.where(h > 0.0, dh, 0.0)
        dcb1_ref[kloc] += jnp.sum(dz1, axis=0, keepdims=True)
        dcw1_ref[kloc] += jax.lax.dot_general(
            s, dz1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (128, cah)
        ds = jax.lax.dot_general(dz1, cw1_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = ds * np.float32(1.0 / npix)

        # conv2 adjoint cotangent: dc2 = da·g + ds (interior only)
        def dc2_fn(pidx, off):
            sl = da[:, pidx, pl.ds(off, mflat), :]
            return (sl * g[:, None, :] + ds[:, None, :]) * mask
    else:
        # plain ResBlock: dc2 = da · res_scale
        def dc2_fn(pidx, off):
            return da[:, pidx, pl.ds(off, mflat), :] * np.float32(res_scale) * mask

    db2 = _conv_adj(dc2_fn, c1, dc, lambda i: u_ref[0, 1, i],
                    lambda i, val: du_ref.__setitem__(
                        (kloc, 1, i), du_ref[kloc, 1, i] + val),
                    accum_dprev=False, **akw)
    db_ref[kloc, 1] += db2[0]

    # ---- conv1 adjoint: relu gate by the recomputed post-relu c1
    def dc1_fn(pidx, off):
        sl = dc[:, pidx, pl.ds(off, mflat), :]
        act = c1[:, pidx, pl.ds(off, mflat), :].astype(jnp.float32)
        return jnp.where(act > 0.0, sl, 0.0) * mask

    db1 = _conv_adj(dc1_fn, a, da, lambda i: u_ref[0, 0, i],
                    lambda i, val: du_ref.__setitem__(
                        (kloc, 0, i), du_ref[kloc, 0, i] + val),
                    accum_dprev=True, **akw)
    db_ref[kloc, 0] += db1[0]

    @pl.when(kk == nbc - 1)
    def _store_cotangent():
        dx_ref[:] = da[:]


def _bwd_chunk_call(dy, astash, u, bv, cw1, cb1, cw2, cb2,
                    spec: WinoSpec, bs: int, npix: int,
                    gated: bool = True, res_scale: float = 1.0):
    """Backward over one chunk of RCABs (reversed in-kernel). dy: f32
    (T, m², PP, 128) cotangent of the chunk output; astash: (T, nbc, …)
    stashed RCAB inputs. Returns (dx f32, du f32, db, dcw1, dcb1, dcw2,
    dcb2)."""
    from sres_tpu.ops.pallas.winograd_conv import _mask_arr
    return _bwd_chunk_exec(dy, astash, u, bv, cw1, cb1, cw2, cb2,
                           _mask_arr(spec), spec, bs, gated, res_scale)


def _bwd_chunk_exec_impl(dy, astash, u, bv, cw1, cb1, cw2, cb2, mask,
                         spec: WinoSpec, bs: int,
                         gated: bool = True, res_scale: float = 1.0):
    t = dy.shape[0]
    nbc = u.shape[0]
    n2 = spec.n * spec.n
    mp = _rup(spec.mflat)
    m2 = spec.m * spec.m
    xdt = astash.dtype
    cah = cw1.shape[-1]
    npix = spec.h * spec.w
    fblk = pl.BlockSpec((bs, m2, spec.pp, 128), lambda i, k: (i, 0, 0, 0))
    # reverse index maps: kernel step kk processes RCAB nbc-1-kk
    rkblk = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda i, k, _n=nbc: (_n - 1 - k,) + (0,) * len(shape))
    out_k = lambda *shape: pl.BlockSpec(
        shape, lambda i, k: (0,) * len(shape))
    return pl.pallas_call(
        functools.partial(_bwd_chunk_kernel, spec=spec, bs=bs, nbc=nbc,
                          npix=npix, gated=gated, res_scale=res_scale),
        grid=(t // bs, nbc),
        in_specs=[fblk,
                  pl.BlockSpec((bs, 1, m2, spec.pp, 128),
                               lambda i, k, _n=nbc: (i, _n - 1 - k, 0, 0, 0)),
                  rkblk(2, n2, 128, 128), rkblk(2, 128),
                  rkblk(128, cah), rkblk(1, cah), rkblk(cah, 128),
                  rkblk(1, 128),
                  pl.BlockSpec((mp, 1), lambda i, k: (0, 0))],
        out_specs=(fblk,
                   out_k(nbc, 2, n2, 128, 128),
                   out_k(nbc, 2, 128),
                   out_k(nbc, 128, cah), out_k(nbc, 1, cah),
                   out_k(nbc, cah, 128), out_k(nbc, 1, 128)),
        out_shape=(jax.ShapeDtypeStruct((t, m2, spec.pp, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nbc, 2, n2, 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nbc, 2, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nbc, 128, cah), jnp.float32),
                   jax.ShapeDtypeStruct((nbc, 1, cah), jnp.float32),
                   jax.ShapeDtypeStruct((nbc, cah, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nbc, 1, 128), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((bs, m2, spec.pp, 128), jnp.float32),
                        pltpu.VMEM((bs, m2, spec.pp, 128), jnp.float32),
                        pltpu.VMEM((bs, m2, spec.pp, 128), xdt),
                        pltpu.VMEM((bs, m2, spec.pp, 128), xdt),
                        pltpu.VMEM((n2, bs, mp, 128), xdt),
                        pltpu.VMEM((spec.m * spec.n, bs, mp, 128), xdt),
                        pltpu.VMEM((n2, bs, mp, 128), xdt),
                        pltpu.VMEM((n2, bs, mp, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=_interpret(),
    )(dy, astash, u, bv, cw1, cb1, cw2, cb2, mask)


_bwd_chunk_exec = batch_partitioned(
    static_argnums=(9, 10, 11, 12),
    rule=("t a1 a2 a3, t s1 s2 s3 s4, b1 b2 b3 b4 b5, c1 c2 c3, d1 d2 d3, "
          "e1 e2 e3, f1 f2 f3, g1 g2 g3, p1 p2 -> t a1 a2 a3, "
          "h1 h2 h3 h4 h5, i1 i2 i3, j1 j2 j3, k1 k2 k3, l1 l2 l3, m1 m2 m3"),
    summed=(1, 2, 3, 4, 5, 6),
    local_bs_argnum=10,
    batch_args=(0, 1),
)(_bwd_chunk_exec_impl)


# ------------------------------------------------------------ public entry
@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def wino_group(xq: jnp.ndarray, ws: jnp.ndarray, bvec: jnp.ndarray,
               caw1: jnp.ndarray, cab1: jnp.ndarray,
               caw2: jnp.ndarray, cab2: jnp.ndarray,
               m: int, hw: Tuple[int, int], bs: int = 4) -> jnp.ndarray:
    """Differentiable whole-group RCAB chain (same signature/semantics as
    wino_group_fwd). Forward cost = one pallas_call per group; backward =
    one stash sweep + ceil(nb/NB_CHUNK) reversed chunk kernels."""
    return wino_group_fwd(xq, ws, bvec, caw1, cab1, caw2, cab2, m, hw, bs)


def _prep(ws, bvec, cab1, cab2, m, xdt):
    nb = ws.shape[0]
    cah = cab1.shape[-1]
    u = jax.vmap(jax.vmap(lambda w: transform_weights(w, m)))(ws).astype(xdt)
    return (u, bvec.reshape(nb, 2, 128).astype(jnp.float32),
            cab1.reshape(nb, 1, cah).astype(jnp.float32),
            cab2.reshape(nb, 1, 128).astype(jnp.float32))


def _chunk_loop(da, astash, u, bv, cw1, cb1, cw2, cb2, spec, bs, npix,
                gated=True, res_scale=1.0):
    """Reversed chunked backward over the whole RCAB stack. da: f32 chain-
    output cotangent. Returns (da at the chain input, du, db, dcw1, dcb1,
    dcw2, dcb2) with the per-block axes concatenated back in forward
    order."""
    nb = u.shape[0]
    dus, dbs, dw1s, db1s, dw2s, db2s = [], [], [], [], [], []
    for off in reversed(range(0, nb, NB_CHUNK)):
        sl = slice(off, min(off + NB_CHUNK, nb))
        da, du_c, db_c, dcw1_c, dcb1_c, dcw2_c, dcb2_c = _bwd_chunk_call(
            da, astash[:, sl], u[sl], bv[sl], cw1[sl], cb1[sl], cw2[sl],
            cb2[sl], spec, bs, npix, gated, res_scale)
        dus.append(du_c); dbs.append(db_c); dw1s.append(dcw1_c)
        db1s.append(dcb1_c); dw2s.append(dcw2_c); db2s.append(dcb2_c)
    cat = lambda xs: jnp.concatenate(xs[::-1], axis=0)
    return (da, cat(dus), cat(dbs), cat(dw1s), cat(db1s), cat(dw2s),
            cat(db2s))


def _vjp_fwd(xq, ws, bvec, caw1, cab1, caw2, cab2, m, hw, bs):
    if _stash_primal():
        spec = wino_spec(m, *hw)
        u, bv, cb1, cb2 = _prep(ws, bvec, cab1, cab2, m, xq.dtype)
        astash, y = _stash_call(xq, u, bv, caw1.astype(jnp.float32), cb1,
                                caw2.astype(jnp.float32), cb2, spec, bs,
                                hw[0] * hw[1])
        return y, (astash, ws, bvec, caw1, cab1, caw2, cab2)
    y = wino_group_fwd(xq, ws, bvec, caw1, cab1, caw2, cab2, m, hw, bs)
    return y, (xq, ws, bvec, caw1, cab1, caw2, cab2)


def _vjp_bwd(m, hw, bs, res, dy):
    xq, ws, bvec, caw1, cab1, caw2, cab2 = res
    spec = wino_spec(m, *hw)
    npix = hw[0] * hw[1]
    nb = ws.shape[0]
    xdt = xq.dtype                     # == activation dtype in both modes
    u, bv, cb1, cb2 = _prep(ws, bvec, cab1, cab2, m, xdt)
    cw1 = caw1.astype(jnp.float32)
    cw2 = caw2.astype(jnp.float32)
    if _stash_primal():
        astash = xq                    # residual slot 0 IS the stash
    else:
        astash, _ = _stash_call(xq, u, bv, cw1, cb1, cw2, cb2, spec, bs,
                                npix)
    da, du, db, dw1, db1, dw2, db2 = _chunk_loop(
        dy.astype(jnp.float32), astash, u, bv, cw1, cb1, cw2, cb2,
        spec, bs, npix)
    dws = jax.vmap(jax.vmap(
        lambda d: untransform_weight_grad(d, m)))(du).astype(ws.dtype)
    return (da.astype(xdt), dws,
            db.astype(bvec.dtype),
            dw1.astype(caw1.dtype),
            db1.reshape(nb, -1).astype(cab1.dtype),
            dw2.astype(caw2.dtype),
            db2.reshape(nb, -1).astype(cab2.dtype))


wino_group.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------- trailing-conv-folded variants
@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def wino_group_trail(xq: jnp.ndarray, ws: jnp.ndarray, bvec: jnp.ndarray,
                     caw1: jnp.ndarray, cab1: jnp.ndarray,
                     caw2: jnp.ndarray, cab2: jnp.ndarray,
                     wt: jnp.ndarray, bt: jnp.ndarray,
                     m: int, hw: Tuple[int, int], bs: int = 4) -> jnp.ndarray:
    """wino_group + the group's TRAILING conv and group skip (reference
    rcan/network.py:67-69) folded into the same forward pallas_call as one
    extra grid step — one fewer per-conv pipeline round-trip per group.
    wt: (3, 3, 128, 128) block-diag-expanded trailing kernel; bt: (128,).
    Backward = stash sweep (which also emits the trailing conv's input) +
    the per-conv adjoint kernel for the trailing conv + the chunked RCAB
    backward; all gradients stay exact adjoints."""
    return wino_group_fwd(xq, ws, bvec, caw1, cab1, caw2, cab2, m, hw, bs,
                          wt=wt, bt_=bt)


def _trail_vjp_fwd(xq, ws, bvec, caw1, cab1, caw2, cab2, wt, bt, m, hw, bs):
    if _stash_primal():
        spec = wino_spec(m, *hw)
        u, bv, cb1, cb2 = _prep(ws, bvec, cab1, cab2, m, xq.dtype)
        ut = transform_weights(wt, m).astype(xq.dtype)
        astash, y = _stash_call(xq, u, bv, caw1.astype(jnp.float32), cb1,
                                caw2.astype(jnp.float32), cb2, spec, bs,
                                hw[0] * hw[1], ut=ut, bt_=bt)
        return y, (astash, ws, bvec, caw1, cab1, caw2, cab2, wt, bt)
    y = wino_group_trail(xq, ws, bvec, caw1, cab1, caw2, cab2, wt, bt,
                         m, hw, bs)
    return y, (xq, ws, bvec, caw1, cab1, caw2, cab2, wt, bt)


def _trail_vjp_bwd(m, hw, bs, res, dy):
    from sres_tpu.ops.pallas.winograd_conv import _bwd_call
    xq, ws, bvec, caw1, cab1, caw2, cab2, wt, bt = res
    spec = wino_spec(m, *hw)
    npix = hw[0] * hw[1]
    nb = ws.shape[0]
    xdt = xq.dtype
    u, bv, cb1, cb2 = _prep(ws, bvec, cab1, cab2, m, xdt)
    cw1 = caw1.astype(jnp.float32)
    cw2 = caw2.astype(jnp.float32)
    ut = transform_weights(wt, m).astype(xdt)
    if _stash_primal():
        astash, z = xq[:, :nb], xq[:, nb]   # slot 0 = stash (+z at [nb])
    else:
        astash, z = _stash_call(xq, u, bv, cw1, cb1, cw2, cb2, spec, bs,
                                npix)
    # trailing conv adjoint (input = chain output z; no relu)
    dz, dut, dbt = _bwd_call(dy.astype(xdt), z, z, ut, spec, bs, False)
    dwt = untransform_weight_grad(dut, m).astype(wt.dtype)
    da, du, db, dw1, db1, dw2, db2 = _chunk_loop(
        dz.astype(jnp.float32), astash, u, bv, cw1, cb1, cw2, cb2,
        spec, bs, npix)
    # group skip: xq feeds the output directly
    da = da + dy.astype(jnp.float32)
    dws = jax.vmap(jax.vmap(
        lambda d: untransform_weight_grad(d, m)))(du).astype(ws.dtype)
    return (da.astype(xdt), dws,
            db.astype(bvec.dtype),
            dw1.astype(caw1.dtype),
            db1.reshape(nb, -1).astype(cab1.dtype),
            dw2.astype(caw2.dtype),
            db2.reshape(nb, -1).astype(cab2.dtype),
            dwt, dbt.reshape(-1).astype(bt.dtype))


wino_group_trail.defvjp(_trail_vjp_fwd, _trail_vjp_bwd)


# --------------------------------------------- ungated variant (EDSR trunk)
def _dummy_ca(nb, dtype):
    """Inert channel-attention operands for gated=False kernels (the refs
    are declared but never read)."""
    return (jnp.zeros((nb, 128, 8), jnp.float32),
            jnp.zeros((nb, 1, 8), jnp.float32),
            jnp.zeros((nb, 8, 128), jnp.float32),
            jnp.zeros((nb, 1, 128), jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def wino_resgroup(xq: jnp.ndarray, ws: jnp.ndarray, bvec: jnp.ndarray,
                  m: int, hw: Tuple[int, int], bs: int = 4,
                  res_scale: float = 1.0) -> jnp.ndarray:
    """Differentiable chain of plain residual blocks (conv+relu → conv →
    ×res_scale → skip; reference common/residual.py:28 — the EDSR trunk) on
    quad planes: the ungated twin of wino_group. ws: (nb, 2, 3, 3, 128,
    128); bvec: (nb, 2, 128)."""
    nb = ws.shape[0]
    d1, d2, d3, d4 = _dummy_ca(nb, xq.dtype)
    return wino_group_fwd(xq, ws, bvec, d1, d2.reshape(nb, 8),
                          d3, d4.reshape(nb, 128), m, hw, bs,
                          gated=False, res_scale=res_scale)


def _rg_vjp_fwd(xq, ws, bvec, m, hw, bs, res_scale):
    if _stash_primal():
        spec = wino_spec(m, *hw)
        nb = ws.shape[0]
        u = jax.vmap(jax.vmap(
            lambda w: transform_weights(w, m)))(ws).astype(xq.dtype)
        bv = bvec.reshape(nb, 2, 128).astype(jnp.float32)
        cw1, cb1, cw2, cb2 = _dummy_ca(nb, xq.dtype)
        astash, y = _stash_call(xq, u, bv, cw1, cb1, cw2, cb2, spec, bs,
                                hw[0] * hw[1], gated=False,
                                res_scale=res_scale)
        return y, (astash, ws, bvec)
    y = wino_resgroup(xq, ws, bvec, m, hw, bs, res_scale)
    return y, (xq, ws, bvec)


def _rg_vjp_bwd(m, hw, bs, res_scale, res, dy):
    xq, ws, bvec = res
    spec = wino_spec(m, *hw)
    npix = hw[0] * hw[1]
    nb = ws.shape[0]
    xdt = xq.dtype
    u = jax.vmap(jax.vmap(lambda w: transform_weights(w, m)))(ws).astype(xdt)
    bv = bvec.reshape(nb, 2, 128).astype(jnp.float32)
    cw1, cb1, cw2, cb2 = _dummy_ca(nb, xdt)
    if _stash_primal():
        astash = xq                    # residual slot 0 IS the stash
    else:
        astash, _ = _stash_call(xq, u, bv, cw1, cb1, cw2, cb2, spec, bs,
                                npix, gated=False, res_scale=res_scale)
    da, du, db, _, _, _, _ = _chunk_loop(
        dy.astype(jnp.float32), astash, u, bv, cw1, cb1, cw2, cb2,
        spec, bs, npix, gated=False, res_scale=res_scale)
    dws = jax.vmap(jax.vmap(
        lambda d: untransform_weight_grad(d, m)))(du).astype(ws.dtype)
    return (da.astype(xdt), dws, db.astype(bvec.dtype))


wino_resgroup.defvjp(_rg_vjp_fwd, _rg_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def wino_resgroup_trail(xq: jnp.ndarray, ws: jnp.ndarray, bvec: jnp.ndarray,
                        wt: jnp.ndarray, bt: jnp.ndarray,
                        m: int, hw: Tuple[int, int], bs: int = 4,
                        res_scale: float = 1.0) -> jnp.ndarray:
    """wino_resgroup + the trunk's TRAILING conv and global skip (reference
    EDSR body: common/residual.py:28 stack, then conv, then x + body) folded
    into the forward pallas_call — the ungated twin of wino_group_trail."""
    nb = ws.shape[0]
    d1, d2, d3, d4 = _dummy_ca(nb, xq.dtype)
    return wino_group_fwd(xq, ws, bvec, d1, d2.reshape(nb, 8),
                          d3, d4.reshape(nb, 128), m, hw, bs,
                          gated=False, res_scale=res_scale, wt=wt, bt_=bt)


def _rgt_vjp_fwd(xq, ws, bvec, wt, bt, m, hw, bs, res_scale):
    if _stash_primal():
        spec = wino_spec(m, *hw)
        nb = ws.shape[0]
        u = jax.vmap(jax.vmap(
            lambda w: transform_weights(w, m)))(ws).astype(xq.dtype)
        bv = bvec.reshape(nb, 2, 128).astype(jnp.float32)
        cw1, cb1, cw2, cb2 = _dummy_ca(nb, xq.dtype)
        ut = transform_weights(wt, m).astype(xq.dtype)
        astash, y = _stash_call(xq, u, bv, cw1, cb1, cw2, cb2, spec, bs,
                                hw[0] * hw[1], gated=False,
                                res_scale=res_scale, ut=ut, bt_=bt)
        return y, (astash, ws, bvec, wt, bt)
    y = wino_resgroup_trail(xq, ws, bvec, wt, bt, m, hw, bs, res_scale)
    return y, (xq, ws, bvec, wt, bt)


def _rgt_vjp_bwd(m, hw, bs, res_scale, res, dy):
    from sres_tpu.ops.pallas.winograd_conv import _bwd_call
    xq, ws, bvec, wt, bt = res
    spec = wino_spec(m, *hw)
    npix = hw[0] * hw[1]
    nb = ws.shape[0]
    xdt = xq.dtype
    u = jax.vmap(jax.vmap(lambda w: transform_weights(w, m)))(ws).astype(xdt)
    bv = bvec.reshape(nb, 2, 128).astype(jnp.float32)
    cw1, cb1, cw2, cb2 = _dummy_ca(nb, xdt)
    ut = transform_weights(wt, m).astype(xdt)
    if _stash_primal():
        astash, z = xq[:, :nb], xq[:, nb]   # slot 0 = stash (+z at [nb])
    else:
        astash, z = _stash_call(xq, u, bv, cw1, cb1, cw2, cb2, spec, bs,
                                npix, gated=False, res_scale=res_scale)
    dz, dut, dbt = _bwd_call(dy.astype(xdt), z, z, ut, spec, bs, False)
    dwt = untransform_weight_grad(dut, m).astype(wt.dtype)
    da, du, db, _, _, _, _ = _chunk_loop(
        dz.astype(jnp.float32), astash, u, bv, cw1, cb1, cw2, cb2,
        spec, bs, npix, gated=False, res_scale=res_scale)
    da = da + dy.astype(jnp.float32)
    dws = jax.vmap(jax.vmap(
        lambda d: untransform_weight_grad(d, m)))(du).astype(ws.dtype)
    return (da.astype(xdt), dws, db.astype(bvec.dtype),
            dwt, dbt.reshape(-1).astype(bt.dtype))


wino_resgroup_trail.defvjp(_rgt_vjp_fwd, _rgt_vjp_bwd)
