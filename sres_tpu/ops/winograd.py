"""Winograd F(m×m, 3×3) convolution: transform constants, the quad-plane
activation layout, weight transforms, and a pure-jnp reference.

Why: the RCAN trunk (reference: sres/model/rcan/network.py:50-80) is 410
3×3 convs at 64 logical features; PERF.md's roofline shows direct
convolution is MXU-FLOP-bound there (the step is 88.5% conv fusions).
Winograd computes the SAME convolution with 2.25× (m=2) / 4× (m=4) fewer
MACs: per output tile, Y = Aᵀ[(G g Gᵀ) ⊙ (Bᵀ d B)]A — n²=(m+2)² elementwise
tap products replace m²·9 MACs, and over channels each tap product becomes a
(tiles, Cin)@(Cin, Cout) matmul that rides the MXU at full 128-lane
occupancy on the lane-packed trunk.

Materializing the transformed taps in HBM inflates traffic ~(n²/m²)× — a
pure-XLA Winograd is bandwidth-bound and LOSES (measured: see PERF.md round
3) — so the production path is the Pallas kernel
(ops/pallas/winograd_conv.py) whose transforms live in VMEM. This module
holds everything layout- and math-related that both sides share:

Quad-plane layout
-----------------
``to_quad`` stores the zero-padded (H+2, W+2) image as m² parity planes
``plane(a,b)[r,c] = xpad[m·r+a, m·c+b]`` flattened to (ph·pw, C) rows.
In this layout BOTH the Winograd input taps (d[di,dj] over the tile grid)
and the output tile writes are STATIC CONTIGUOUS row slices (with a
wrap-column mask, the trick proven by the round-2 residual-group kernel):
no strided access, no im2col. The layout is persistent across a conv chain
— elementwise ops, residual adds and channel attention are layout-agnostic
(plane borders stay exactly zero), so the relayout cost is paid once per
trunk, not per conv.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# F(2x2, 3x3): exact (all coefficients 0/±1/±0.5) — Lavin & Gray (2015).
_BT2 = np.array([[1, 0, -1, 0],
                 [0, 1, 1, 0],
                 [0, -1, 1, 0],
                 [0, 1, 0, -1]], np.float64)
_G2 = np.array([[1, 0, 0],
                [0.5, 0.5, 0.5],
                [0.5, -0.5, 0.5],
                [0, 0, 1]], np.float64)
_AT2 = np.array([[1, 1, 1, 0],
                 [0, 1, -1, -1]], np.float64)

# F(4x4, 3x3): 4x MAC reduction; transform amplification ~x24 is benign for
# bf16 (relative precision is scale-free) and the GEMM accumulates in f32.
_BT4 = np.array([[4, 0, -5, 0, 1, 0],
                 [0, -4, -4, 1, 1, 0],
                 [0, 4, -4, -1, 1, 0],
                 [0, -2, -1, 2, 1, 0],
                 [0, 2, -1, -2, 1, 0],
                 [0, 4, 0, -5, 0, 1]], np.float64)
_G4 = np.array([[1 / 4, 0, 0],
                [-1 / 6, -1 / 6, -1 / 6],
                [-1 / 6, 1 / 6, -1 / 6],
                [1 / 24, 1 / 12, 1 / 6],
                [1 / 24, -1 / 12, 1 / 6],
                [0, 0, 1]], np.float64)
_AT4 = np.array([[1, 1, 1, 1, 1, 0],
                 [0, 1, -1, 2, -2, 0],
                 [0, 1, 1, 4, 4, 0],
                 [0, 1, -1, 8, -8, 1]], np.float64)

_MATS = {2: (_BT2, _G2, _AT2), 4: (_BT4, _G4, _AT4)}


class WinoSpec(NamedTuple):
    """Geometry of one F(m, 3) conv at a fixed (H, W) spatial size."""
    m: int          # output tile side
    n: int          # input tile side = m + 2
    h: int
    w: int
    th: int         # tiles per column = H // m
    tw: int         # tiles per row   = W // m
    ph: int         # plane rows = th + 1
    pw: int         # plane cols = tw + 1
    pp: int         # padded flat plane rows (multiple of 8)
    mflat: int      # flat slice length covering the (th, tw) tile window

    @property
    def bt(self) -> np.ndarray:
        return _MATS[self.m][0]

    @property
    def g(self) -> np.ndarray:
        return _MATS[self.m][1]

    @property
    def at(self) -> np.ndarray:
        return _MATS[self.m][2]

    def in_tap(self, di: int, dj: int) -> Tuple[int, int]:
        """(plane index, flat offset) of input tap d[di, dj]."""
        return (di % self.m) * self.m + (dj % self.m), \
            (di // self.m) * self.pw + (dj // self.m)

    def out_tap(self, u: int, v: int) -> Tuple[int, int]:
        """(plane index, flat offset) of output tile position (u, v)."""
        a, b = (u + 1) % self.m, (v + 1) % self.m
        return a * self.m + b, ((u + 1) // self.m) * self.pw + ((v + 1) // self.m)


def wino_spec(m: int, h: int, w: int) -> WinoSpec:
    if m not in _MATS:
        raise ValueError(f"Winograd tile m must be one of {sorted(_MATS)}, got {m}")
    if h % m or w % m:
        raise ValueError(f"H={h}, W={w} must be multiples of the tile size {m}")
    th, tw = h // m, w // m
    ph, pw = th + 1, tw + 1
    pp = ((ph * pw + 15) // 16) * 16  # 16-row aligned (bf16 sublane tiling)
    mflat = (th - 1) * pw + tw
    return WinoSpec(m, m + 2, h, w, th, tw, ph, pw, pp, mflat)


def interior_mask(spec: WinoSpec) -> np.ndarray:
    """(mflat, 1) f32: 1 on tile cells, 0 on the pw-pitch wrap columns."""
    k = np.arange(spec.mflat)
    return ((k % spec.pw) < spec.tw).astype(np.float32)[:, None]


# ------------------------------------------------------------------ layout
def to_quad(x: jnp.ndarray, spec: WinoSpec) -> jnp.ndarray:
    """(T, H, W, C) → (T, m², PP, C) zero-padded parity planes."""
    m = spec.m
    t, h, w, c = x.shape
    assert (h, w) == (spec.h, spec.w)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    planes = []
    for a in range(m):
        for b in range(m):
            pl_ = xp[:, a::m, b::m, :]
            planes.append(jnp.pad(pl_, ((0, 0), (0, spec.ph - pl_.shape[1]),
                                        (0, spec.pw - pl_.shape[2]), (0, 0))))
    q = jnp.stack(planes, axis=1).reshape(t, m * m, spec.ph * spec.pw, c)
    return jnp.pad(q, ((0, 0), (0, 0), (0, spec.pp - spec.ph * spec.pw), (0, 0)))


def from_quad(q: jnp.ndarray, spec: WinoSpec) -> jnp.ndarray:
    """(T, m², PP, C) → (T, H, W, C) (inverse of to_quad, crops the pad)."""
    m = spec.m
    t = q.shape[0]
    c = q.shape[-1]
    planes = q[:, :, :spec.ph * spec.pw, :].reshape(
        t, m, m, spec.ph, spec.pw, c)
    full = planes.transpose(0, 3, 1, 4, 2, 5).reshape(
        t, m * spec.ph, m * spec.pw, c)
    return full[:, 1:spec.h + 1, 1:spec.w + 1, :]


# ------------------------------------------------- factored transform programs
# Straight-line evaluators for the four linear maps the kernels apply to
# row-sets of (rows, 128) vectors: BT (input transform, both sides), BTᵀ
# (dx adjoint), AT (inverse transform), ATᵀ (dM adjoint). The m=4 programs
# share even/odd subexpressions — ~2× fewer VPU mul/adds than evaluating
# each matrix row independently (the _nz/_combine form). All accumulate in
# f32; exactness is asserted against the matrices in tests/test_winograd.py.

def _f32(xs):
    return [x.astype(jnp.float32) for x in xs]


def bt_apply(m, d):
    """out[i] = Σ_q BT[i, q]·d[q]."""
    f = _f32(d)
    if m == 4:
        p = f[4] - np.float32(4.0) * f[2]
        q = np.float32(4.0) * f[1] - f[3]
        s = f[4] - f[2]
        t = np.float32(2.0) * (f[1] - f[3])
        return [np.float32(4.0) * f[0] - np.float32(5.0) * f[2] + f[4],
                p - q, p + q, s - t, s + t,
                np.float32(4.0) * f[1] - np.float32(5.0) * f[3] + f[5]]
    return [f[0] - f[2], f[1] + f[2], f[2] - f[1], f[1] - f[3]]


def bt_t_apply(m, x):
    """out[q] = Σ_i BT[i, q]·x[i]."""
    f = _f32(x)
    if m == 4:
        u = f[1] + f[2]
        v = f[1] - f[2]
        w = f[3] + f[4]
        z = f[3] - f[4]
        return [np.float32(4.0) * f[0],
                np.float32(4.0) * (f[5] - v) - np.float32(2.0) * z,
                np.float32(-5.0) * f[0] - np.float32(4.0) * u - w,
                v + np.float32(2.0) * z - np.float32(5.0) * f[5],
                f[0] + u + w,
                f[5]]
    return [f[0], f[1] - f[2] + f[3], f[1] + f[2] - f[0], -f[3]]


def at_apply(m, y):
    """out[u] = Σ_i AT[u, i]·y[i] (n inputs → m outputs)."""
    f = _f32(y)
    if m == 4:
        s1 = f[1] + f[2]
        d1 = f[1] - f[2]
        s2 = f[3] + f[4]
        d2 = f[3] - f[4]
        return [f[0] + s1 + s2,
                d1 + np.float32(2.0) * d2,
                s1 + np.float32(4.0) * s2,
                d1 + np.float32(8.0) * d2 + f[5]]
    return [f[0] + f[1] + f[2], f[1] - f[2] - f[3]]


def at_t_apply(m, g):
    """out[i] = Σ_u AT[u, i]·g[u] (m inputs → n outputs)."""
    f = _f32(g)
    if m == 4:
        s = f[0] + f[2]
        t = f[1] + f[3]
        u = f[0] + np.float32(4.0) * f[2]
        v = np.float32(2.0) * f[1] + np.float32(8.0) * f[3]
        return [f[0], s + t, s - t, u + v, u - v, f[3]]
    return [f[0], f[0] + f[1], f[0] - f[1], -f[1]]


# ------------------------------------------------------------------ weights
# The weight transforms are compensated (double-f32) straight-line VPU
# programs, NOT einsums. Two reasons, both diagnosed round 4
# (scripts/bench/export_wino_diag.py + PERF.md):
#
# 1. Serving-artifact bitwise parity. The artifact bakes params, so XLA
#    constant-folds the transform on the HOST (exact IEEE f32); a live
#    apply with runtime params lowers an einsum to MXU passes — bf16 at
#    default precision (2.6e-3 output mismatch vs the artifact) and still
#    not bitwise at Precision.HIGHEST (the multi-pass decomposition rounds
#    differently than the host evaluator; the residual ~1e-7 discrepancy
#    in U flips one bf16 ULP inside the kernel's matmuls → 1.6e-3).
#    Elementwise IEEE f32 mul/add IS bitwise identical between the
#    constant folder and the TPU VPU, so a fixed elementwise program makes
#    baked and runtime transforms agree exactly (tests/test_winograd.py
#    asserts the lowering stays dot-free).
#
# 2. Gradient stability of the group chain. The m=4 chain backward is
#    measured to amplify generic U-perturbations ~1e8× into dx (a few
#    recomputed pre-activations sit within ~1e-4 of the relu boundary, and
#    the transform-domain cotangent is ~5e3× the output scale), so the
#    naive-f32 straight-line form — 1-2 ULP from exact, same rms as the
#    einsum but rounded in a different pattern — moved dx by 6e-3 RELATIVE
#    vs the direct-conv oracle (measured: ~68 flipped positions spread
#    through the chain). Dekker TwoProd + Knuth TwoSum make each output
#    element CORRECTLY ROUNDED (≤0.5 ULP, the irreducible f32 output
#    floor; measured 3.1e-10 rms vs exact-f64 at the bench weight scale),
#    which agrees with the einsum everywhere except sparse 1-ULP tie
#    sites — the group gradcheck passes with original margins. The
#    transform is tiny (n²·9·Cin·Cout MACs per conv), so the extra ~15
#    VPU ops per MAC are free at step scale.

_SPLITTER = np.float32(4097.0)          # 2^12 + 1 (Veltkamp split, f32)


def _veltkamp(a):
    """a → (hi, lo) with a = hi + lo exactly, each half ≤12 mantissa bits."""
    c = _SPLITTER * a
    hi = c - (c - a)
    return hi, a - hi


@functools.lru_cache(maxsize=None)
def _const_split(c: float):
    """Trace-time Veltkamp split of a transform coefficient (f32 scalars);
    returns (c32, hi, lo, is_pow2). Power-of-two coefficients multiply
    exactly — no compensation needed."""
    c32 = np.float32(c)
    mant, _ = np.frexp(np.float64(c32))
    if abs(mant) == 0.5:
        return c32, None, None, True
    t = np.float32(_SPLITTER * c32)
    hi = np.float32(t - np.float32(t - c32))
    return c32, hi, np.float32(c32 - hi), False


def _two_sum(a, b):
    """Knuth: a + b = s + e exactly (6 flops, branch-free IEEE f32)."""
    s = a + b
    bb = s - a
    return s, (a - bb) + (b - (s - bb))


def _comp_lincomb(coeffs, xs):
    """Σ_i c_i·x_i in double-f32: coeffs are python floats (trace-time),
    xs are (hi, lo) pairs (lo may be None). Returns (hi, lo)."""
    s = e = None
    for c, (xh, xl) in zip(coeffs, xs):
        if c == 0.0:
            continue
        c32, ch, cl, pow2 = _const_split(float(c))
        p = xh * c32
        pe = None
        if not pow2:                    # Dekker TwoProd: p + pe = xh·c32
            ah, al = _veltkamp(xh)
            pe = ((ah * ch - p) + ah * cl + al * ch) + al * cl
        if s is None:
            s, se = p, None
        else:
            s, se = _two_sum(s, p)
        for term in (se, pe, (xl * c32 if xl is not None else None)):
            if term is not None:
                e = term if e is None else e + term
    return s, e


def transform_weights(w: jnp.ndarray, m: int) -> jnp.ndarray:
    """(3, 3, Cin, Cout) → (n², Cin, Cout) transform-domain weights
    U[tap] = (G ⊗ G) w in f32 (block-diagonal structure of lane-packed
    weights is preserved — G acts on the spatial axes only). Compensated
    straight-line program — see the block comment above for why this is
    not an einsum."""
    n = m + 2
    g = _MATS[m][1]                                       # float64 numpy
    wf = w.astype(jnp.float32)
    wp = [(wf[p], None) for p in range(3)]
    rows = [_comp_lincomb(g[t], wp) for t in range(n)]    # n × (3, Ci, Co)
    taps = []
    for t in range(n):
        rh, rl = rows[t]
        cols = [(rh[q], None if rl is None else rl[q]) for q in range(3)]
        for s_ in range(n):
            th, tl = _comp_lincomb(g[s_], cols)
            taps.append(th if tl is None else th + tl)
    return jnp.stack(taps, axis=0)                        # (n², Ci, Co)


def untransform_weight_grad(du: jnp.ndarray, m: int) -> jnp.ndarray:
    """Adjoint of transform_weights: (n², Cin, Cout) → (3, 3, Cin, Cout)
    (same compensated straight-line form)."""
    n = m + 2
    g = _MATS[m][1]
    duf = du.astype(jnp.float32)
    cols = []                                             # cols[t][q] pairs
    for t in range(n):
        xs = [(duf[t * n + s], None) for s in range(n)]
        cols.append([_comp_lincomb(g[:, q], xs) for q in range(3)])
    rows = []
    for p in range(3):
        outq = []
        for q in range(3):
            h, l = _comp_lincomb(g[:, p], [cols[t][q] for t in range(n)])
            outq.append(h if l is None else h + l)
        rows.append(jnp.stack(outq, axis=0))
    return jnp.stack(rows, axis=0)                        # (3, 3, Ci, Co)


def flip_transpose_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) → the kernel of the input-gradient conv: spatially
    flipped, I/O transposed (standard conv-transpose relabeling)."""
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


# ---------------------------------------------------------------- reference
def wino_conv_ref(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None,
                  m: int) -> jnp.ndarray:
    """Pure-jnp Winograd conv on NHWC (einsum form) — the math oracle the
    Pallas kernel and the quad layout are tested against. SAME padding,
    stride 1, 3×3. Slow (materializes all taps); tests only."""
    bt, g, at = (jnp.asarray(a, jnp.float32) for a in _MATS[m])
    n = m + 2
    t, h, wd, c = x.shape
    th, tw = h // m, wd // m
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    # d[p, q, t, r, s, c] = xp[t, m*r + p, m*s + q, c]
    d = jnp.stack([jnp.stack([
        jax.lax.dynamic_slice(xp, (0, p, q, 0), (t, (th - 1) * m + 1, (tw - 1) * m + 1, c))[:, ::m, ::m, :]
        for q in range(n)], 0) for p in range(n)], 0)
    v = jnp.einsum("ip,jq,pqtrsc->ijtrsc", bt, bt, d)
    u = jnp.einsum("tp,sq,pqio->tsio", g, g, w.astype(jnp.float32))
    mm = jnp.einsum("ijtrsc,ijcd->ijtrsd", v, u)
    y = jnp.einsum("ui,vj,ijtrsd->trusvd", at, at, mm)
    y = y.reshape(t, th * m, tw * m, w.shape[3])
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y
