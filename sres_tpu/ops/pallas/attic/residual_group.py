"""Fused lane-packed ResidualGroup Pallas kernel (forward + custom VJP).

Replaces a whole RCAN residual group (nblocks × RCAB + trailing conv + skip;
reference: sres/model/rcan/network.py:67-80) with one kernel whose
activations never leave VMEM between convs. Built on the round-2 microbench
findings (scripts/bench/micro_rcab.py, PERF.md):

- activations carry TWO tiles' channels packed to C=128 (full MXU lane
  occupancy; weights are block-diagonal — the 2x MAC redundancy is the
  structural price of 64 logical features on a 128-lane MXU, exactly
  offsetting the lane padding it removes),
- every conv is 9 accumulated (M, 128) @ (128, 128) MXU matmuls whose A
  operands are STATIC contiguous row slices of a zero-padded flattened
  (Hp·Wp, 128) activation buffer — no im2col materialization, no masked
  shifts (the failure modes of the round-1 RCAB kernels, ops/pallas/rcab.py),
- channel attention runs on the same VMEM values (no fusion break),
- per-RCAB weights stream per grid step (automatic double-buffered DMA),
- the backward re-streams per-block stashes written during forward and
  accumulates weight grads across the tile sweep; the running activation
  cotangent rides an input/output-aliased HBM buffer between block sweeps.

Pad-column bookkeeping: the padded layout makes each conv read garbage into
the horizontal pad columns; a precomputed (M, 1) interior mask re-zeroes them
after every conv so buffer borders stay exactly zero — matching XLA's
zero-padded conv semantics.
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


def _geom(h: int, w: int) -> Tuple[int, int, int, int]:
    """(P buffer rows, S first interior row, M matmul rows, Wp padded width).
    P is rounded up to a multiple of 128 — Mosaic requires block/slice dims
    aligned to the sublane tiling; the extra rows stay zero."""
    hp, wp = h + 2, w + 2
    p = ((hp * wp + 127) // 128) * 128
    return p, wp + 1, (h - 1) * wp + w, wp


def interior_mask(h: int, w: int) -> np.ndarray:
    """(M, 1) f32: 1 on interior cells, 0 on the horizontal pad columns that
    fall inside the matmul row range."""
    p, s, m, wp = _geom(h, w)
    col = np.arange(s, s + m) % wp
    return ((col >= 1) & (col <= w)).astype(np.float32)[:, None]


def pad_to_kernel_layout(x: jnp.ndarray) -> jnp.ndarray:
    """(T, H, W, C) → (T, P, C) zero-padded flattened layout (P 128-aligned)."""
    t, h, w, c = x.shape
    p = _geom(h, w)[0]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = xp.reshape(t, (h + 2) * (w + 2), c)
    return jnp.pad(flat, ((0, 0), (0, p - flat.shape[1]), (0, 0)))


def unpad_from_kernel_layout(y: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    t, p, c = y.shape
    core = y[:, :(h + 2) * (w + 2), :]
    return core.reshape(t, h + 2, w + 2, c)[:, 1:1 + h, 1:1 + w, :]


def _taps(wp: int):
    return [(dy - 1) * wp + (dx - 1) for dy in range(3) for dx in range(3)]


# --------------------------------------------------------------- forward
def _fwd_kernel(xpad_ref, w1_ref, b1_ref, w2_ref, b2_ref, wd_ref, bd_ref,
                wu_ref, bu_ref, wg_ref, bg_ref, mask_ref,
                y_ref, sx_ref, sa_ref, sc_ref, ss_ref,
                act, apad, cpad, skip,
                *, nblocks: int, h: int, w: int):
    p, s, m, wp = _geom(h, w)
    b = pl.program_id(1)
    mask = mask_ref[:]
    npix = float(h * w)
    taps = _taps(wp)

    def conv9(buf, w_ref3, bias):
        acc = jnp.zeros((m, 128), jnp.float32) + bias
        for t9, off in enumerate(taps):
            acc = acc + jnp.dot(buf[pl.ds(s + off, m), :], w_ref3[t9],
                                preferred_element_type=jnp.float32)
        return acc * mask

    @pl.when(b == 0)
    def _init():
        act[:] = xpad_ref[0]
        skip[:] = xpad_ref[0]
        apad[:] = jnp.zeros_like(apad)
        cpad[:] = jnp.zeros_like(cpad)

    @pl.when(b < nblocks)
    def _rcab():
        sx_ref[0, 0] = act[:]                         # stash x_b
        r1 = conv9(act, w1_ref[0], b1_ref[0, 0].astype(jnp.float32))
        a_int = jax.nn.relu(r1)
        apad[pl.ds(s, m), :] = (a_int * mask).astype(apad.dtype)
        sa_ref[0, 0] = apad[:]                        # stash relu output
        c_int = conv9(apad, w2_ref[0], b2_ref[0, 0].astype(jnp.float32))
        cpad[pl.ds(s, m), :] = c_int.astype(cpad.dtype)
        sc_ref[0, 0] = cpad[:]                        # stash conv2 output
        mvec = jnp.sum(c_int, axis=0, keepdims=True) / npix
        cdt = act.dtype
        v = jnp.dot(mvec.astype(cdt), wd_ref[0],
                    preferred_element_type=jnp.float32) + bd_ref[0, 0].astype(jnp.float32)
        hvec = jax.nn.relu(v)
        u = jnp.dot(hvec.astype(cdt), wu_ref[0],
                    preferred_element_type=jnp.float32) + bu_ref[0, 0].astype(jnp.float32)
        gate = jax.nn.sigmoid(u)                      # (1, 128) f32
        ss_ref[0, 0] = gate.astype(ss_ref.dtype)
        xin = act[pl.ds(s, m), :].astype(jnp.float32)
        act[pl.ds(s, m), :] = (xin + c_int * gate).astype(act.dtype)

    @pl.when(b == nblocks)
    def _group_conv():
        sx_ref[0, 0] = act[:]                         # x_NB: group-conv input
        g_int = conv9(act, wg_ref, bg_ref[0].astype(jnp.float32))
        out = skip[pl.ds(s, m), :].astype(jnp.float32) + g_int
        y_ref[0] = jnp.zeros((p, 128), y_ref.dtype)
        y_ref[0, pl.ds(s, m), :] = out.astype(y_ref.dtype)


def _fwd_call(xpad, w1, b1, w2, b2, wd, bd, wu, bu, wg, bg, mask,
              nblocks: int, h: int, w: int):
    t, p, c = xpad.shape
    assert c == 128, "kernel is specialized to packed C=128"
    dt = xpad.dtype
    m = _geom(h, w)[2]
    hid = wd.shape[-1]
    nb = nblocks

    def const(shape):
        return pl.BlockSpec(shape, lambda ti, bi, _n=len(shape): (0,) * _n)

    def per_b(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda ti, bi, _n=len(shape): (jnp.minimum(bi, nb - 1),) + (0,) * _n)

    def stash_spec(shape, clamp):
        if clamp:
            return pl.BlockSpec((1, 1) + shape,
                                lambda ti, bi, _n=len(shape):
                                (jnp.minimum(bi, nb - 1), ti) + (0,) * _n)
        return pl.BlockSpec((1, 1) + shape,
                            lambda ti, bi, _n=len(shape): (bi, ti) + (0,) * _n)

    out_shape = (
        jax.ShapeDtypeStruct((t, p, 128), dt),                      # y
        jax.ShapeDtypeStruct((nb + 1, t, p, 128), dt),              # stash x
        jax.ShapeDtypeStruct((nb, t, p, 128), dt),                  # stash a
        jax.ShapeDtypeStruct((nb, t, p, 128), dt),                  # stash c
        jax.ShapeDtypeStruct((nb, t, 1, 128), jnp.float32),         # stash gate
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nblocks=nb, h=h, w=w),
        grid=(t, nb + 1),
        in_specs=[
            pl.BlockSpec((1, p, 128), lambda ti, bi: (ti, 0, 0)),
            per_b((9, 128, 128)), per_b((1, 128)),
            per_b((9, 128, 128)), per_b((1, 128)),
            per_b((128, hid)), per_b((1, hid)),
            per_b((hid, 128)), per_b((1, 128)),
            const((9, 128, 128)), const((1, 128)), const((m, 1)),
        ],
        out_specs=(
            pl.BlockSpec((1, p, 128), lambda ti, bi: (ti, 0, 0)),
            stash_spec((p, 128), clamp=False),
            stash_spec((p, 128), clamp=True),
            stash_spec((p, 128), clamp=True),
            stash_spec((1, 128), clamp=True),
        ),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((p, 128), dt), pltpu.VMEM((p, 128), dt),
                        pltpu.VMEM((p, 128), dt), pltpu.VMEM((p, 128), dt)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xpad, w1, b1, w2, b2, wd, bd, wu, bu, wg, bg, mask)


# --------------------------------------------------------------- backward
def _bwd_kernel(skipg_ref, sx_ref, sa_ref, sc_ref, ss_ref,
                w1_ref, w2_ref, wd_ref, bd_ref, wu_ref, wg_ref, mask_ref,
                dyo_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dwd_ref, dbd_ref, dwu_ref, dbu_ref, dwg_ref, dbg_ref,
                gpad, dx_acc, dyv, sem,
                *, nblocks: int, h: int, w: int):
    """Grid (nblocks+1, tiles): step 0 = group conv, step k>0 = RCAB
    nblocks-k (reverse order via the stash index maps). The running activation
    cotangent rides the dx OUTPUT buffer (ANY space) moved by EXPLICIT
    per-step DMA — the block pipeline always copies blocked inputs in from
    the pristine operand, so only reading back our own output can carry
    state between sweeps. Step 0 seeds the chain from the group-output
    cotangent, which is already VMEM-resident as the (blocked) skipg input.
    Weight grads accumulate across the tile sweep."""
    p, s, m, wp = _geom(h, w)
    ti = pl.program_id(1)
    first_tile = ti == 0
    cdt = gpad.dtype
    mask = mask_ref[:]
    npix = float(h * w)
    taps = _taps(wp)
    bstep = pl.program_id(0)

    def convT(buf, get_w):
        """dx[s:+M] = Σ_t g[s-off_t : +M] @ W[t]^T (g zero on pads/borders)."""
        acc = jnp.zeros((m, 128), jnp.float32)
        for t9, off in enumerate(taps):
            a = buf[pl.ds(s - off, m), :]
            acc = acc + jax.lax.dot_general(a, get_w(t9), (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32)
        return acc * mask

    def wgrads(in_ref4, g_bf, dw_ref):
        # per-block dw refs have a leading size-1 block axis; the group-conv
        # dw ref (const spec) does not
        blocked = len(dw_ref.shape) == 4
        for t9, off in enumerate(taps):
            a = in_ref4[0, 0, pl.ds(s + off, m), :]
            dw = jax.lax.dot_general(a, g_bf, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if blocked:
                dw_ref[0, t9] += dw
            else:
                dw_ref[t9] += dw

    def load_g(from_carrier: bool):
        """Fetch the running cotangent tile: step 0 reads the pipelined
        skipg VMEM block; later sweeps DMA back what WE wrote into the dx
        output buffer. Returns the masked interior; fills the padded
        bf16 buffer."""
        if from_carrier:
            cp = pltpu.make_async_copy(dyo_ref.at[ti], dyv, sem.at[0])
            cp.start()
            cp.wait()
            g_int = dyv[pl.ds(s, m), :].astype(jnp.float32) * mask
        else:
            g_int = skipg_ref[0, pl.ds(s, m), :].astype(jnp.float32) * mask
        gpad[:] = jnp.zeros_like(gpad)
        gpad[pl.ds(s, m), :] = g_int.astype(gpad.dtype)
        return g_int

    def store_g():
        cp = pltpu.make_async_copy(dx_acc, dyo_ref.at[ti], sem.at[1])
        cp.start()
        cp.wait()

    @pl.when(bstep == 0)
    def _group_bwd():
        @pl.when(first_tile)
        def _z():
            dwg_ref[:] = jnp.zeros_like(dwg_ref)
            dbg_ref[:] = jnp.zeros_like(dbg_ref)
        g_int = load_g(False)
        dbg_ref[0, :] += jnp.sum(g_int, axis=0)
        wgrads(sx_ref, g_int.astype(cdt), dwg_ref)
        dx_int = convT(gpad, lambda t9: wg_ref[t9])
        # y = skip + conv(x_NB): only the conv path enters the running chain
        # cotangent; the skip path targets the GROUP INPUT and is added at
        # the last RCAB step from the pristine skipg operand
        dx_acc[:] = jnp.zeros_like(dx_acc)
        dx_acc[pl.ds(s, m), :] = dx_int.astype(dx_acc.dtype)
        store_g()

    @pl.when(bstep > 0)
    def _rcab_bwd():
        @pl.when(first_tile)
        def _z():
            for r in (dw1_ref, db1_ref, dw2_ref, db2_ref,
                      dwd_ref, dbd_ref, dwu_ref, dbu_ref):
                r[:] = jnp.zeros_like(r)
        g_int = load_g(True)                               # dy for y_b
        c_int = sc_ref[0, 0, pl.ds(s, m), :].astype(jnp.float32)
        gate = ss_ref[0, 0]                                # (1, 128) f32
        # y = x + c ⊙ gate
        dc = g_int * gate
        dsg = jnp.sum(g_int * c_int, axis=0, keepdims=True)
        du = dsg * gate * (1.0 - gate)
        # CA recompute (tiny): mvec, v
        mvec = jnp.sum(c_int, axis=0, keepdims=True) / npix
        v = jnp.dot(mvec.astype(cdt), wd_ref[0],
                    preferred_element_type=jnp.float32) + bd_ref[0, 0].astype(jnp.float32)
        hvec = jax.nn.relu(v)
        dbu_ref[0, 0] += du[0]
        dwu_ref[0] += jax.lax.dot_general(hvec.astype(cdt),
                                          du.astype(cdt),
                                          (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        dh = jax.lax.dot_general(du.astype(cdt), wu_ref[0],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv = jnp.where(v > 0.0, dh, 0.0)
        dbd_ref[0, 0] += dv[0]
        dwd_ref[0] += jax.lax.dot_general(mvec.astype(cdt),
                                          dv.astype(cdt),
                                          (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        dm = jax.lax.dot_general(dv.astype(cdt), wd_ref[0],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dc = dc + (dm / npix) * mask                      # broadcast over rows
        # conv2 backward
        db2_ref[0, 0] += jnp.sum(dc, axis=0)
        gpad[:] = jnp.zeros_like(gpad)
        gpad[pl.ds(s, m), :] = dc.astype(gpad.dtype)
        wgrads(sa_ref, dc.astype(cdt), dw2_ref)
        da = convT(gpad, lambda t9: w2_ref[0, t9])
        # relu backward (sign from the stashed relu output); compare in f32
        # — Mosaic rejects sub-32-bit comparisons on this target
        a_int = sa_ref[0, 0, pl.ds(s, m), :].astype(jnp.float32)
        dr1 = jnp.where(a_int > 0.0, da, 0.0)
        # conv1 backward
        db1_ref[0, 0] += jnp.sum(dr1, axis=0)
        gpad[:] = jnp.zeros_like(gpad)
        gpad[pl.ds(s, m), :] = dr1.astype(gpad.dtype)
        wgrads(sx_ref, dr1.astype(cdt), dw1_ref)
        dx_int = convT(gpad, lambda t9: w1_ref[0, t9])
        # RCAB skip: dy passes through; at the LAST step (first RCAB) the
        # group-level skip cotangent also lands on the group input
        is_last = (bstep == nblocks).astype(jnp.float32)
        sk = skipg_ref[0, pl.ds(s, m), :].astype(jnp.float32) * mask
        dx_acc[:] = jnp.zeros_like(dx_acc)
        dx_acc[pl.ds(s, m), :] = (g_int + dx_int + is_last * sk).astype(dx_acc.dtype)
        store_g()


def _bwd_call(skipg, sx, sa, sc, ss, w1, w2, wd, bd, wu, wg, mask,
              nblocks: int, h: int, w: int):
    t, p, _ = skipg.shape
    dt = skipg.dtype
    m = _geom(h, w)[2]
    hid = wd.shape[-1]
    nb = nblocks

    def const(shape):
        return pl.BlockSpec(shape, lambda bi, ti, _n=len(shape): (0,) * _n)

    # bstep k>0 addresses RCAB b = nb-k; step 0 (group conv) clamps onto an
    # unused slot (nb-1) for the nb-sized arrays and slot nb for the x stash
    def per_b_rev(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda bi, ti, _n=len(shape):
                            (jnp.clip(nb - bi, 0, nb - 1),) + (0,) * _n)

    def stash_rev(shape, has_extra_slot=False):
        hi = nb if has_extra_slot else nb - 1
        return pl.BlockSpec((1, 1) + shape,
                            lambda bi, ti, _n=len(shape):
                            (jnp.clip(nb - bi, 0, hi), ti) + (0,) * _n)

    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((t, p, 128), dt),              # dy carrier / dx
        jax.ShapeDtypeStruct((nb, 9, 128, 128), f32),
        jax.ShapeDtypeStruct((nb, 1, 128), f32),
        jax.ShapeDtypeStruct((nb, 9, 128, 128), f32),
        jax.ShapeDtypeStruct((nb, 1, 128), f32),
        jax.ShapeDtypeStruct((nb, 128, hid), f32),
        jax.ShapeDtypeStruct((nb, 1, hid), f32),
        jax.ShapeDtypeStruct((nb, hid, 128), f32),
        jax.ShapeDtypeStruct((nb, 1, 128), f32),
        jax.ShapeDtypeStruct((9, 128, 128), f32),
        jax.ShapeDtypeStruct((1, 128), f32),
    )
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, nblocks=nb, h=h, w=w),
        grid=(nb + 1, t),
        in_specs=[
            pl.BlockSpec((1, p, 128), lambda bi, ti: (ti, 0, 0)),       # skipg
            stash_rev((p, 128), has_extra_slot=True),   # sx
            stash_rev((p, 128)),                        # sa
            stash_rev((p, 128)),                        # sc
            stash_rev((1, 128)),                        # ss
            per_b_rev((9, 128, 128)),
            per_b_rev((9, 128, 128)),
            per_b_rev((128, hid)),
            per_b_rev((1, hid)),
            per_b_rev((hid, 128)),
            const((9, 128, 128)), const((m, 1)),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            per_b_rev((9, 128, 128)),
            per_b_rev((1, 128)),
            per_b_rev((9, 128, 128)),
            per_b_rev((1, 128)),
            per_b_rev((128, hid)),
            per_b_rev((1, hid)),
            per_b_rev((hid, 128)),
            per_b_rev((1, 128)),
            const((9, 128, 128)), const((1, 128)),
        ),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((p, 128), dt), pltpu.VMEM((p, 128), dt),
                        pltpu.VMEM((p, 128), dt),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(skipg, sx, sa, sc, ss, w1, w2, wd, bd, wu, wg, mask)
    return grads


# ----------------------------------------------------------- public entry
@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def fused_residual_group(xpad, w1, b1, w2, b2, wd, bd, wu, bu, wg, bg,
                         nblocks: int, h: int, w: int):
    """One packed residual group on padded-layout activations.

    xpad: (T, (H+2)(W+2), 128) bf16 — zero-padded flattened packed tiles.
    w1/w2: (NB, 9, 128, 128) per-tap block-diagonal conv weights;
    b1/b2: (NB, 1, 128); wd/bd, wu/bu: CA weights (NB, 128, hid)/(NB, 1, hid)
    and (NB, hid, 128)/(NB, 1, 128); wg/bg: trailing group conv (9, 128, 128)
    / (1, 128). Returns the padded-layout group output (T, P, 128).
    """
    mask = jnp.asarray(interior_mask(h, w))
    y, *_ = _fwd_call(xpad, w1, b1, w2, b2, wd, bd, wu, bu, wg, bg, mask,
                      nblocks, h, w)
    return y


def _vjp_fwd(xpad, w1, b1, w2, b2, wd, bd, wu, bu, wg, bg, nblocks, h, w):
    mask = jnp.asarray(interior_mask(h, w))
    y, sx, sa, sc, ss = _fwd_call(xpad, w1, b1, w2, b2, wd, bd, wu, bu, wg, bg,
                                  mask, nblocks, h, w)
    return y, (sx, sa, sc, ss, w1, w2, wd, bd, wu, wg, mask)


def _vjp_bwd(nblocks, h, w, res, g):
    sx, sa, sc, ss, w1, w2, wd, bd, wu, wg, mask = res
    gb = g.astype(sx.dtype)
    (dx, dw1, db1, dw2, db2, dwd, dbd, dwu, dbu, dwg, dbg) = _bwd_call(
        gb, sx, sa, sc, ss, w1, w2, wd, bd, wu, wg, mask,
        nblocks, h, w)
    c = lambda d, wref: d.astype(wref.dtype)
    return (dx, c(dw1, w1), c(db1, w1), c(dw2, w2), c(db2, w2),
            c(dwd, wd), c(dbd, bd), c(dwu, wu), c(dbu, wu),
            c(dwg, wg), c(dbg, wg))


fused_residual_group.defvjp(_vjp_fwd, _vjp_bwd)
