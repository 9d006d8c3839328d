"""Pallas TPU kernel: Winograd F(m×m, 3×3) convolution on quad-plane layout.

The production path behind ``model.winograd`` for the lane-packed RCAN trunk
(reference convs: sres/model/rcan/network.py:50-80). Direct convolution at
64 logical features is MXU-FLOP-bound (PERF.md roofline: the bf16 step is
88.5% conv fusions and the trunk's useful-FLOP ceiling is half of peak);
Winograd computes the same conv with n²/(9·... ) — concretely 2.25× (m=2)
or 4× (m=4) — fewer MACs. A pure-XLA Winograd drowns in HBM traffic
materializing the n² transformed taps; here the transforms live in VMEM:

- activations are persistent quad-plane buffers (ops/winograd.py:to_quad):
  every input tap d[di,dj] and every output tile position is a STATIC
  contiguous row slice of a flattened parity plane (wrap columns masked —
  the slice trick proven by the round-2 residual-group kernel),
- the input transform V = BᵀdB is factorized into two passes of ±coef
  slice combinations (VPU adds) staged through a VMEM scratch,
- each transform tap is ONE (rows, 128) @ (128, 128) MXU matmul in bf16
  with f32 accumulation — full 128-lane occupancy on the packed trunk,
- the inverse transform Y = AᵀMA + bias (+ optional fused relu) writes
  masked slices back to quad planes, keeping plane borders exactly zero,
- the backward is the EXACT ADJOINT (not a second Winograd conv): dM from
  the A-transform of the masked cotangent, dV = dM·Uᵀ, dx by BᵀdVB
  overlap-add, and dU = VᵀdM accumulated in-kernel across the sample grid
  (untransformed to the 3×3 weight grad in XLA: G-adjoint, exact). The only
  backward residuals are the op's own input (and the forward output when
  relu is fused, which the autodiff graph keeps alive anyway) — none of the
  per-block stashes that sank the fused residual-group kernel.

Numerics: transforms for m=2 are exact (±1, ±0.5); m=4 amplifies ~24× but
bf16 precision is scale-free and every matmul accumulates in f32 — error
stays in the same class as the direct bf16 conv (tested).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sres_tpu.ops.pallas.partition import batch_partitioned
from sres_tpu.ops.winograd import (WinoSpec, interior_mask,
                                   untransform_weight_grad, wino_spec,
                                   transform_weights)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Debug-only stage ablation for on-chip profiling (scripts/bench/
# micro_winograd.py --ablate N). 0 = full kernel; 1 = input transform only;
# 2 = + tap GEMMs (skip inverse transform); 3 = pipeline no-op (block
# copy-in/zero-out only); 4 = tap reads only (no combines/scratch writes);
# production code never sets this.
ABLATE = 0


def _rup(x: int, q: int = 16) -> int:
    return ((x + q - 1) // q) * q


def _nz(row: np.ndarray) -> Sequence[Tuple[float, int]]:
    return [(float(c), i) for i, c in enumerate(row) if c != 0.0]


def _combine(terms):
    """Σ coef·value with the first term seeding the accumulator (f32)."""
    acc = None
    for coef, val in terms:
        v = val.astype(jnp.float32)
        v = v if coef == 1.0 else (np.float32(coef) * v)
        acc = v if acc is None else acc + v
    return acc


# ------------------------------------------------------------------ forward
def _fwd_kernel(xq_ref, u_ref, b_ref, mask_ref, yq_ref, w1, mm,
                *, spec: WinoSpec, bs: int, relu: bool):
    m, n = spec.m, spec.n
    mflat, mp = spec.mflat, _rup(spec.mflat)
    bt, at = spec.bt, spec.at
    xdt = xq_ref.dtype
    mask = mask_ref[pl.ds(0, mflat), :]  # (mflat, 1) → broadcasts over (bs, ·, 128)

    @pl.when(pl.program_id(0) == 0)
    def _zero_scratch():
        # stage-1 tail rows (mflat..mp) are never written; they must read as
        # zero in the full-row stage-2 combinations and matmuls
        w1[:] = jnp.zeros_like(w1)

    def idx(i, j):
        return i * n + j

    # Every stage operates on ALL bs samples at once — (bs, mflat, 128)
    # vector ops with STATIC scratch offsets. The round-3 ablation showed the
    # per-sample loop form spent 68% of the kernel in stage 1: bs× the slice
    # bookkeeping and dynamic-offset stores dominated the actual VPU math.

    if ABLATE == 3:  # pipeline no-op: block copy-in + zero-out only
        yq_ref[:] = jnp.zeros_like(yq_ref)
        yq_ref[0, 0, pl.ds(0, mflat), :] = xq_ref[0, 0, pl.ds(0, mflat), :]
        return

    if ABLATE == 4:  # tap reads only: accumulate all n² taps, no w1 writes
        acc = None
        for p in range(n):
            for q in range(n):
                pidx, off = spec.in_tap(p, q)
                t_ = xq_ref[:, pidx, pl.ds(off, mflat), :].astype(jnp.float32)
                acc = t_ if acc is None else acc + t_
        yq_ref[:] = jnp.zeros_like(yq_ref)
        yq_ref[:, 0, pl.ds(0, mflat), :] = acc.astype(xdt)
        return

    # stage 1: w1[p, tj] = Σ_q BT[tj, q] · d[p, q]
    for p in range(n):
        taps = {}
        for q in range(n):
            pidx, off = spec.in_tap(p, q)
            taps[q] = xq_ref[:, pidx, pl.ds(off, mflat), :]
        for tj in range(n):
            acc = _combine([(c, taps[q]) for c, q in _nz(bt[tj])])
            w1[idx(p, tj), :, pl.ds(0, mflat), :] = acc.astype(xdt)

    if ABLATE == 1:  # input transform only: token write defeats DCE
        yq_ref[:] = jnp.zeros_like(yq_ref)
        yq_ref[0, 0, pl.ds(0, mflat), :] = w1[0, 0, pl.ds(0, mflat), :]
        return

    # stage 2 + GEMM: V[ti, tj] = Σ_p BT[ti, p] · w1[p, tj];  M = V @ U
    # ((bs·mp, 128) @ (128, 128) — mp is 16-row aligned so the collapse of
    # (bs, mp) into the GEMM M dimension is a no-op relayout)
    for ti in range(n):
        for tj in range(n):
            v = _combine([(c, w1[idx(p, tj), :, :, :]) for c, p in _nz(bt[ti])])
            mm[idx(ti, tj), :, :, :] = jnp.dot(
                v.astype(xdt).reshape(bs * mp, 128), u_ref[idx(ti, tj)],
                preferred_element_type=jnp.float32).reshape(bs, mp, 128)

    if ABLATE == 2:  # + tap GEMMs, skip the inverse transform
        yq_ref[:] = jnp.zeros_like(yq_ref)
        yq_ref[0, 0, pl.ds(0, mflat), :] = mm[0, 0, pl.ds(0, mflat), :].astype(xdt)
        return

    # inverse transform + bias (+ relu) + masked quad writes
    bias = b_ref[0, :].astype(jnp.float32)
    yq_ref[:] = jnp.zeros_like(yq_ref)
    for u in range(m):
        zrow = {}
        for tj in range(n):
            zrow[tj] = _combine([(c, mm[idx(ti, tj), :, pl.ds(0, mflat), :])
                                 for c, ti in _nz(at[u])])
        for v_ in range(m):
            y = _combine([(c, zrow[tj]) for c, tj in _nz(at[v_])]) + bias
            if relu:
                y = jnp.maximum(y, 0.0)
            pidx, off = spec.out_tap(u, v_)
            yq_ref[:, pidx, pl.ds(off, mflat), :] = (y * mask).astype(xdt)


def _mask_arr(spec: WinoSpec):
    """(mp, 1) interior mask as an explicit operand — custom_partitioning
    requires the wrapped jaxprs to be closed-over-constant-free."""
    mp = _rup(spec.mflat)
    return jnp.asarray(np.pad(interior_mask(spec),
                              ((0, mp - spec.mflat), (0, 0))))


def _fwd_call(xq, u, b, spec: WinoSpec, bs: int, relu: bool):
    assert xq.shape[0] % bs == 0, (xq.shape, bs)
    return _fwd_exec(xq, u, b, _mask_arr(spec), spec, bs, relu)


def _fwd_exec_impl(xq, u, b, mask, spec: WinoSpec, bs: int, relu: bool):
    t = xq.shape[0]
    n2 = spec.n * spec.n
    mp = _rup(spec.mflat)
    xdt = xq.dtype
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec, bs=bs, relu=relu),
        grid=(t // bs,),
        in_specs=[
            pl.BlockSpec((bs, spec.m * spec.m, spec.pp, 128),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((n2, 128, 128), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
            pl.BlockSpec((mp, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bs, spec.m * spec.m, spec.pp, 128),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, spec.m * spec.m, spec.pp, 128), xdt),
        scratch_shapes=[pltpu.VMEM((n2, bs, mp, 128), xdt),
                        pltpu.VMEM((n2, bs, mp, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(xq, u, b, mask)


_fwd_exec = batch_partitioned(
    static_argnums=(4, 5, 6),
    rule="t a1 a2 a3, b1 b2 b3, c1 c2, p1 p2 -> t a1 a2 a3",
    local_bs_argnum=5,
)(_fwd_exec_impl)


# ----------------------------------------------------------------- backward
def _bwd_kernel(g_ref, xq_ref, yq_ref, u_ref, mask_ref,
                dx_ref, du_ref, db_ref, w1, gm, zz, dxa,
                *, spec: WinoSpec, bs: int, relu: bool):
    m, n = spec.m, spec.n
    mflat, mp = spec.mflat, _rup(spec.mflat)
    bt, at = spec.bt, spec.at
    xdt = xq_ref.dtype
    mask = mask_ref[pl.ds(0, mflat), :]
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _zero():
        w1[:] = jnp.zeros_like(w1)
        zz[:] = jnp.zeros_like(zz)
        du_ref[:] = jnp.zeros_like(du_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    def idx(i, j):
        return i * n + j

    # All stages vectorized over the bs samples (see the forward kernel note:
    # per-sample loops were the dominant kernel cost, not the math).

    # --- dM = (A ⊗ A)-adjoint of the masked (relu-gated) output cotangent
    db_acc = jnp.zeros((1, 1, 128), jnp.float32)
    for u in range(m):
        gtap = {}
        for v_ in range(m):
            pidx, off = spec.out_tap(u, v_)
            g = g_ref[:, pidx, pl.ds(off, mflat), :].astype(jnp.float32)
            if relu:
                y = yq_ref[:, pidx, pl.ds(off, mflat), :].astype(jnp.float32)
                g = jnp.where(y > 0.0, g, 0.0)
            g = g * mask
            db_acc = db_acc + jnp.sum(g, axis=(0, 1), keepdims=True)
            gtap[v_] = g
        for tj in range(n):
            acc = _combine([(c, gtap[v_]) for c, v_ in _nz(at[:, tj])])
            zz[u * n + tj, :, pl.ds(0, mflat), :] = acc.astype(xdt)
    db_ref[:] += db_acc[0]

    # stage-1 of V recompute: w1[p, tj] = Σ_q BT[tj, q] · d[p, q]  (from xq)
    for p in range(n):
        taps = {}
        for q in range(n):
            pidx, off = spec.in_tap(p, q)
            taps[q] = xq_ref[:, pidx, pl.ds(off, mflat), :]
        for tj in range(n):
            acc = _combine([(c, taps[q]) for c, q in _nz(bt[tj])])
            w1[idx(p, tj), :, pl.ds(0, mflat), :] = acc.astype(xdt)

    # per tap: gm = Σ_u AT[u, ti]·zz[u, tj];  dU += Vᵀgm;  dv = gm·Uᵀ → gm
    for ti in range(n):
        for tj in range(n):
            g_tap = _combine([(c, zz[u * n + tj, :, :, :])
                              for c, u in _nz(at[:, ti])])
            g_bf = g_tap.astype(xdt).reshape(bs * mp, 128)
            v = _combine([(c, w1[idx(p, tj), :, :, :])
                          for c, p in _nz(bt[ti])]).astype(xdt).reshape(bs * mp, 128)
            du_ref[idx(ti, tj)] += jax.lax.dot_general(
                v, g_bf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv = jax.lax.dot_general(
                g_bf, u_ref[idx(ti, tj)], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            gm[idx(ti, tj), :, :, :] = dv.reshape(bs, mp, 128).astype(xdt)

    # dx: stage s2[ti, q] = Σ_tj BT[tj, q]·dv[ti, tj] (reuses w1), then
    # dd[p, q] = Σ_ti BT[ti, p]·s2[ti, q], masked overlap-add into dxa
    for ti in range(n):
        for q in range(n):
            acc = _combine([(c, gm[idx(ti, tj), :, :, :]) for c, tj in _nz(bt[:, q])])
            w1[idx(ti, q), :, :, :] = acc.astype(xdt)
    dxa[:] = jnp.zeros_like(dxa)
    for p in range(n):
        for q in range(n):
            dd = _combine([(c, w1[idx(ti, q), :, pl.ds(0, mflat), :])
                           for c, ti in _nz(bt[:, p])])
            pidx, off = spec.in_tap(p, q)
            dxa[:, pidx, pl.ds(off, mflat), :] += dd * mask
    dx_ref[:] = dxa[:].astype(xdt)


def _bwd_call(g, xq, yq, u, spec: WinoSpec, bs: int, relu: bool):
    return _bwd_exec(g, xq, yq, u, _mask_arr(spec), spec, bs, relu)


def _bwd_exec_impl(g, xq, yq, u, mask, spec: WinoSpec, bs: int, relu: bool):
    t = xq.shape[0]
    n2 = spec.n * spec.n
    mp = _rup(spec.mflat)
    m2 = spec.m * spec.m
    xdt = xq.dtype
    blk = lambda: pl.BlockSpec((bs, m2, spec.pp, 128), lambda i: (i, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec, bs=bs, relu=relu),
        grid=(t // bs,),
        in_specs=[blk(), blk(), blk(),
                  pl.BlockSpec((n2, 128, 128), lambda i: (0, 0, 0)),
                  pl.BlockSpec((mp, 1), lambda i: (0, 0))],
        out_specs=(blk(),
                   pl.BlockSpec((n2, 128, 128), lambda i: (0, 0, 0)),
                   pl.BlockSpec((1, 128), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((t, m2, spec.pp, 128), xdt),
                   jax.ShapeDtypeStruct((n2, 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((n2, bs, mp, 128), xdt),
                        pltpu.VMEM((n2, bs, mp, 128), xdt),
                        pltpu.VMEM((spec.m * spec.n, bs, mp, 128), xdt),
                        pltpu.VMEM((bs, m2, spec.pp, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(g, xq, yq, u, mask)


_bwd_exec = batch_partitioned(
    static_argnums=(5, 6, 7),
    rule=("t a1 a2 a3, t a1 a2 a3, t a1 a2 a3, b1 b2 b3, p1 p2 "
          "-> t a1 a2 a3, c1 c2 c3, d1 d2"),
    summed=(1, 2),
    local_bs_argnum=6,
    batch_args=(0, 1, 2),
)(_bwd_exec_impl)


# ------------------------------------------------------- chained forward
def _chain_fwd_kernel(xq_ref, u_ref, b_ref, mask_ref, yq_ref, qc, w1, mm,
                      *, spec: WinoSpec, bs: int, nk: int, relu: bool):
    """One grid step = one conv k applied to the resident activations.

    Grid is (T//bs, K) with k fastest: the activation block is carried
    across the K steps in the qc scratch (initialized from xq at k==0, conv
    output written back in place — safe because stage 1 fully consumes it
    into w1 first), so HBM sees each activation block exactly twice for the
    WHOLE chain instead of twice per conv. The round-3 bisection measured
    the per-conv pipeline at 0.163 ms vs 0.090 ms of transform+GEMM work —
    this kernel exists to amortize exactly that. The full transformed-weight
    stack (K, n², 128, 128) is one revisited block: resident in VMEM,
    streamed from HBM once per kernel call.
    """
    m, n = spec.m, spec.n
    mflat, mp = spec.mflat, _rup(spec.mflat)
    bt, at = spec.bt, spec.at
    xdt = xq_ref.dtype
    mask = mask_ref[pl.ds(0, mflat), :]
    k = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (k == 0))
    def _zero_scratch():
        w1[:] = jnp.zeros_like(w1)

    @pl.when(k == 0)
    def _load_block():
        qc[:] = xq_ref[:]

    def idx(i, j):
        return i * n + j

    from sres_tpu.ops.winograd import at_apply, bt_apply

    # stage 1 from the resident activations
    for p in range(n):
        taps = []
        for q in range(n):
            pidx, off = spec.in_tap(p, q)
            taps.append(qc[:, pidx, pl.ds(off, mflat), :])
        rows = bt_apply(m, taps)
        for tj in range(n):
            w1[idx(p, tj), :, pl.ds(0, mflat), :] = rows[tj].astype(xdt)

    # tap GEMMs against conv k's transformed weights
    for tj in range(n):
        vs = bt_apply(m, [w1[idx(p, tj), :, :, :] for p in range(n)])
        for ti in range(n):
            mm[idx(ti, tj), :, :, :] = jnp.dot(
                vs[ti].astype(xdt).reshape(bs * mp, 128), u_ref[0, idx(ti, tj)],
                preferred_element_type=jnp.float32).reshape(bs, mp, 128)

    # inverse transform back into the resident buffer (masked interiors over
    # borders that stay zero from the k==0 load)
    bias = b_ref[0, 0, :].astype(jnp.float32)
    zcol = {}
    for tj in range(n):
        zs = at_apply(m, [mm[idx(ti, tj), :, pl.ds(0, mflat), :]
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
            qc[:, pidx, pl.ds(off, mflat), :] = (y * mask).astype(xdt)

    @pl.when(k == nk - 1)
    def _store_block():
        yq_ref[:] = qc[:]


def wino_chain_fwd(xq: jnp.ndarray, ws: jnp.ndarray, bvec: jnp.ndarray,
                   m: int, hw: Tuple[int, int], bs: int = 4,
                   relu: bool = True) -> jnp.ndarray:
    """Chain of K Winograd 3×3 SAME convs (+relu) on quad planes in ONE
    pallas_call. ws: (K, 3, 3, 128, 128); bvec: (K, 128). Forward only —
    the probe/serving path (no custom VJP; do not differentiate through)."""
    spec = wino_spec(m, *hw)
    t = xq.shape[0]
    nk = ws.shape[0]
    assert t % bs == 0, (t, bs)
    n2 = spec.n * spec.n
    mp = _rup(spec.mflat)
    xdt = xq.dtype
    u = jax.vmap(lambda w: transform_weights(w, m))(ws).astype(xdt)
    mask = jnp.asarray(np.pad(interior_mask(spec),
                              ((0, mp - spec.mflat), (0, 0))))
    blk = lambda: pl.BlockSpec((bs, spec.m * spec.m, spec.pp, 128),
                               lambda i, k: (i, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_chain_fwd_kernel, spec=spec, bs=bs, nk=nk,
                          relu=relu),
        grid=(t // bs, nk),
        in_specs=[
            blk(),
            pl.BlockSpec((1, n2, 128, 128), lambda i, k: (k, 0, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda i, k: (k, 0, 0)),
            pl.BlockSpec((mp, 1), lambda i, k: (0, 0)),
        ],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((t, spec.m * spec.m, spec.pp, 128), xdt),
        scratch_shapes=[pltpu.VMEM((bs, spec.m * spec.m, spec.pp, 128), xdt),
                        pltpu.VMEM((n2, bs, mp, 128), xdt),
                        pltpu.VMEM((n2, bs, mp, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(xq, u, bvec.reshape(nk, 1, 128).astype(jnp.float32), mask)


# ------------------------------------------------------- chained RCAB group
def _group_fwd_kernel(xq_ref, u_ref, b_ref, cw1_ref, cb1_ref, cw2_ref,
                      cb2_ref, mask_ref, yq_ref, qc, rb, w1, mm,
                      *, spec: WinoSpec, bs: int, nb: int, npix: int,
                      gated: bool = True, res_scale: float = 1.0,
                      trail: bool = False):
    """One grid step = one full residual block on VMEM-resident activations.
    gated=True: RCAB (conv+relu → conv → channel attention → block skip;
    reference CA: sres/model/rcan/network.py:31-48) — CA runs in-kernel
    (plane borders are exactly zero, so the global mean is the plane sum /
    npix). gated=False: plain ResBlock (conv+relu → conv → ×res_scale →
    skip; reference: sres/model/common/residual.py:28 — EDSR trunk); the CA
    refs are inert. Same pipeline-amortization rationale as
    _chain_fwd_kernel.

    trail=True: the LAST grid step (k == nb-1) is not a residual block but
    the group's TRAILING conv + group skip (reference rcan/network.py:67-69:
    body conv after the RCAB stack, then x + body) — weight slot [k, 0] of
    that step holds the trailing conv, slot [k, 1] and the CA operands are
    inert pads. Folding it in saves one per-conv pallas_call round-trip per
    group (the per-conv block pipeline is 65% of its wall time, PERF.md)."""
    m, n = spec.m, spec.n
    mflat, mp = spec.mflat, _rup(spec.mflat)
    bt, at = spec.bt, spec.at
    xdt = xq_ref.dtype
    mask = mask_ref[pl.ds(0, mflat), :]
    k = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (k == 0))
    def _zero_scratch():
        w1[:] = jnp.zeros_like(w1)

    @pl.when(k == 0)
    def _load_block():
        qc[:] = xq_ref[:]

    def idx(i, j):
        return i * n + j

    def conv(src, dst, slot, relu, zero_dst):
        from sres_tpu.ops.winograd import at_apply, bt_apply
        for p in range(n):
            taps = []
            for q in range(n):
                pidx, off = spec.in_tap(p, q)
                taps.append(src[:, pidx, pl.ds(off, mflat), :])
            rows = bt_apply(m, taps)
            for tj in range(n):
                w1[idx(p, tj), :, pl.ds(0, mflat), :] = rows[tj].astype(xdt)
        for tj in range(n):
            vs = bt_apply(m, [w1[idx(p, tj), :, :, :] for p in range(n)])
            for ti in range(n):
                mm[idx(ti, tj), :, :, :] = jnp.dot(
                    vs[ti].astype(xdt).reshape(bs * mp, 128),
                    u_ref[0, slot, idx(ti, tj)],
                    preferred_element_type=jnp.float32).reshape(bs, mp, 128)
        if zero_dst:
            dst[:] = jnp.zeros_like(dst)
        bias = b_ref[0, slot, :].astype(jnp.float32)
        zcol = {}
        for tj in range(n):
            zs = at_apply(m, [mm[idx(ti, tj), :, pl.ds(0, mflat), :]
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

    def _residual_block():
        # RCAB: conv1+relu → conv2 (in place: stage 1 fully consumes rb into
        # w1 before the inverse transform writes it; borders stay zero)
        conv(qc, rb, 0, True, True)
        conv(rb, rb, 1, False, False)

        if gated:
            # channel attention: pooled mean → 1×1 convs → sigmoid gate
            s = jnp.sum(rb[:, :, :, :].astype(jnp.float32), axis=(1, 2))
            mean = s * np.float32(1.0 / npix)
            g = jnp.maximum(jnp.dot(mean, cw1_ref[0],
                                    preferred_element_type=jnp.float32)
                            + cb1_ref[0], 0.0)
            g = jax.nn.sigmoid(jnp.dot(g, cw2_ref[0],
                                       preferred_element_type=jnp.float32)
                               + cb2_ref[0])
            gate = g[:, None, None, :]
        else:
            gate = np.float32(res_scale)

        # block skip with the gated/scaled residual
        qc[:] = (qc[:].astype(jnp.float32)
                 + rb[:].astype(jnp.float32) * gate).astype(xdt)

    if trail:
        pl.when(k < nb - 1)(_residual_block)

        @pl.when(k == nb - 1)
        def _trailing_conv():
            # trailing conv (no relu) + group skip from the pristine input
            # block (xq_ref always holds the original operand block)
            conv(qc, rb, 0, False, True)
            qc[:] = (xq_ref[:].astype(jnp.float32)
                     + rb[:].astype(jnp.float32)).astype(xdt)
    else:
        _residual_block()

    @pl.when(k == nb - 1)
    def _store_block():
        yq_ref[:] = qc[:]


def wino_group_fwd(xq: jnp.ndarray, ws: jnp.ndarray, bvec: jnp.ndarray,
                   caw1: jnp.ndarray, cab1: jnp.ndarray,
                   caw2: jnp.ndarray, cab2: jnp.ndarray,
                   m: int, hw: Tuple[int, int], bs: int = 4,
                   gated: bool = True, res_scale: float = 1.0,
                   wt: Optional[jnp.ndarray] = None,
                   bt_: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """A whole residual group's RCAB stack (reference rcan/network.py:50-66)
    in ONE pallas_call over quad planes. ws: (nb, 2, 3, 3, 128, 128) spatial
    conv weights (block-diag-expanded); bvec: (nb, 2, 128); caw1/cab1/caw2/
    cab2: packed channel-attention 1×1 weights (nb, 128, ch)/(nb, 1, ch)/
    (nb, ch, 128)/(nb, 1, 128). Forward only (serving/eval path — no VJP).

    wt/bt_ ((3, 3, 128, 128) / (128,)), when given, fold the group's
    TRAILING conv + group skip (reference rcan/network.py:67-69) into the
    same pallas_call as one extra grid step — otherwise they stay outside
    (wino_conv_quad)."""
    spec = wino_spec(m, *hw)
    t = xq.shape[0]
    nb = ws.shape[0]
    assert t % bs == 0, (t, bs)
    n2 = spec.n * spec.n
    mp = _rup(spec.mflat)
    xdt = xq.dtype
    u = jax.vmap(jax.vmap(lambda w: transform_weights(w, m)))(ws).astype(xdt)
    cah = caw1.shape[-1]
    trail = wt is not None
    if trail:
        ut = jnp.stack([transform_weights(wt, m).astype(xdt),
                        jnp.zeros((n2, 128, 128), xdt)])
        u = jnp.concatenate([u, ut[None]], axis=0)
        bvec = jnp.concatenate(
            [bvec, jnp.stack([bt_.astype(bvec.dtype),
                              jnp.zeros((128,), bvec.dtype)])[None]], axis=0)
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], axis=0)
        caw1, cab1, caw2, cab2 = map(zpad, (caw1, cab1, caw2, cab2))
        nb = nb + 1
    return _group_call(xq, u, bvec.reshape(nb, 2, 128).astype(jnp.float32),
                       caw1.astype(jnp.float32),
                       cab1.reshape(nb, 1, cah).astype(jnp.float32),
                       caw2.astype(jnp.float32),
                       cab2.reshape(nb, 1, 128).astype(jnp.float32),
                       _mask_arr(spec), spec, bs, gated, res_scale, trail)


def _group_call_impl(xq, u, bv, cw1, cb1, cw2, cb2, mask, spec, bs, gated,
                     res_scale, trail):
    t = xq.shape[0]
    nb = u.shape[0]
    n2 = spec.n * spec.n
    mp = _rup(spec.mflat)
    xdt = xq.dtype
    cah = cw1.shape[-1]
    blk = lambda: pl.BlockSpec((bs, spec.m * spec.m, spec.pp, 128),
                               lambda i, k: (i, 0, 0, 0))
    kblk = lambda *shape: pl.BlockSpec((1,) + shape,
                                       lambda i, k: (k,) + (0,) * len(shape))
    return pl.pallas_call(
        functools.partial(_group_fwd_kernel, spec=spec, bs=bs, nb=nb,
                          npix=spec.h * spec.w, gated=gated,
                          res_scale=res_scale, trail=trail),
        grid=(t // bs, nb),
        in_specs=[
            blk(),
            kblk(2, n2, 128, 128),
            kblk(2, 128),
            kblk(128, cah), kblk(1, cah), kblk(cah, 128), kblk(1, 128),
            pl.BlockSpec((mp, 1), lambda i, k: (0, 0)),
        ],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((t, spec.m * spec.m, spec.pp, 128), xdt),
        scratch_shapes=[pltpu.VMEM((bs, spec.m * spec.m, spec.pp, 128), xdt),
                        pltpu.VMEM((bs, spec.m * spec.m, spec.pp, 128), xdt),
                        pltpu.VMEM((n2, bs, mp, 128), xdt),
                        pltpu.VMEM((n2, bs, mp, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(xq, u, bv, cw1, cb1, cw2, cb2, mask)


_group_call = batch_partitioned(
    static_argnums=(8, 9, 10, 11, 12),
    rule=("t a1 a2 a3, b1 b2 b3 b4 b5, c1 c2 c3, d1 d2 d3, e1 e2 e3, "
          "f1 f2 f3, g1 g2 g3, p1 p2 -> t a1 a2 a3"),
    local_bs_argnum=9,
)(_group_call_impl)


# ------------------------------------------------------------- public entry
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def wino_conv_quad(xq: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                   m: int, hw: Tuple[int, int], relu: bool = False,
                   bs: int = 1) -> jnp.ndarray:
    """Winograd 3×3 SAME conv on quad-plane activations.

    xq: (T, m², PP, 128) quad planes (ops/winograd.py:to_quad); w: (3, 3,
    128, 128) spatial-domain kernel (block-diagonal for the lane-packed
    trunk); b: (128,) bias (pass zeros when unused). Returns quad planes of
    the conv output (optionally relu'd), borders exactly zero.
    """
    spec = wino_spec(m, *hw)
    u = transform_weights(w, m).astype(xq.dtype)
    return _fwd_call(xq, u, b.reshape(1, 128).astype(jnp.float32),
                     spec, bs, relu)


def _vjp_fwd(xq, w, b, m, hw, relu, bs):
    spec = wino_spec(m, *hw)
    u = transform_weights(w, m).astype(xq.dtype)
    yq = _fwd_call(xq, u, b.reshape(1, 128).astype(jnp.float32),
                   spec, bs, relu)
    return yq, (xq, yq if relu else xq[:0], u,
                jnp.zeros((0,), w.dtype), jnp.zeros((0,), b.dtype))


def _vjp_bwd(m, hw, relu, bs, res, g):
    xq, yq, u, wdt_z, bdt_z = res
    wdt, bdt = wdt_z.dtype, bdt_z.dtype
    spec = wino_spec(m, *hw)
    yq_in = yq if relu else xq  # unused by the kernel when relu=False
    dxq, du, db = _bwd_call(g.astype(xq.dtype), xq, yq_in, u, spec, bs, relu)
    dw = untransform_weight_grad(du, m).astype(wdt)
    return dxq, dw, db.reshape(-1).astype(bdt)


wino_conv_quad.defvjp(_vjp_fwd, _vjp_bwd)
