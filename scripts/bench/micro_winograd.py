"""On-chip A/B: direct lane-packed 3×3 conv chains vs the Winograd kernel
(ops/pallas/winograd_conv.py), fwd and fwd+bwd — the go/no-go gate for
``model.winograd`` on the RCAN trunk (PERF.md round 3).

Chain of K convs (relu between, like the trunk) at the bench operating
point: 36 packed samples (batch 72), 48×48, C=128 block-diag-equivalent
dense weights. Quad-layout conversion happens once per chain, as in real
trunk usage. Timing rules per CLAUDE.md: the step loop runs ON DEVICE
(lax.fori_loop inside one jit) and a value is fetched inside the timed
region (axon tunnel).

  python scripts/bench/micro_winograd.py --only direct_fwd,wino2_fwd
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from sres_tpu.ops.winograd import from_quad, to_quad, wino_spec
from sres_tpu.ops.pallas.winograd_conv import wino_chain_fwd, wino_conv_quad

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def conv(x, w, b):
    y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=DN,
                                 preferred_element_type=x.dtype)
    return y + b


def timeit(step_body, args, steps):
    def run(x, rest, n):
        def body(_, c):
            x, acc = c
            x, out = step_body(x, *rest)
            return (x, acc + out.astype(jnp.float32))
        return lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))

    runner = jax.jit(run, static_argnums=2)
    x0 = jnp.array(args[0])
    xw, accw = runner(x0, args[1:], steps)
    float(accw)
    t0 = time.perf_counter()
    _, acc = runner(xw, args[1:], steps)
    acc = float(acc)
    dt = (time.perf_counter() - t0) / steps
    return dt * 1000.0, acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=36, help="packed samples")
    ap.add_argument("--hw", type=int, default=48)
    ap.add_argument("--nconvs", type=int, default=20)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--bs", type=int, default=1, help="samples per kernel block")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--ablate", type=int, default=0,
                    help="fwd-kernel stage ablation: 1 = input transform "
                         "only, 2 = + tap GEMMs (no inverse transform). "
                         "Output is WRONG — timing only (fwd variants).")
    args = ap.parse_args()
    if args.ablate:
        import sres_tpu.ops.pallas.winograd_conv as _wc
        _wc.ABLATE = args.ablate
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "TPU required (kernel interpret mode on "
                          "CPU is not a benchmark)"}))
        return

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    B, HW, K = args.batch, args.hw, args.nconvs
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, HW, HW, 128)).astype(np.float32)).astype(dtype)
    ws = [jnp.asarray((rng.normal(size=(3, 3, 128, 128)) * 0.03).astype(np.float32))
          for _ in range(K)]
    bs_ = [jnp.asarray((rng.normal(size=(128,)) * 0.01).astype(np.float32))
           for _ in range(K)]
    want = lambda n: (not args.only) or n in args.only.split(",")
    results = {}
    # per-conv useful (logical-64) fwd FLOPs at this size, for reference
    fl_conv = 2 * B * HW * HW * 128 * 128 * 9

    def direct_chain(x, ws, bs2):
        for w, b in zip(ws, bs2):
            x = jax.nn.relu(conv(x, w.astype(dtype), b.astype(dtype)))
        return x

    def wino_chain(m):
        spec = wino_spec(m, HW, HW)

        def f(x, ws, bs2):
            q = to_quad(x, spec)
            for w, b in zip(ws, bs2):
                q = wino_conv_quad(q, w, b, m, (HW, HW), True, args.bs)
            return from_quad(q, spec)
        return f

    def wino_chain_fused(m):
        spec = wino_spec(m, HW, HW)
        wstack = jnp.stack(ws)
        bstack = jnp.stack(bs_)

        def f(x, ws_unused, bs_unused):
            q = to_quad(x, spec)
            q = wino_chain_fwd(q, wstack, bstack, m, (HW, HW), args.bs, True)
            return from_quad(q, spec)
        return f

    # ---- RCAB-group A/B (conv+relu → conv → CA → skip, ×nblocks): the
    # production decision for model.winograd (wino_group = one pallas_call
    # per group, differentiable via the chunked-backward VJP)
    NB = max(1, args.nconvs // 2)
    rng2 = np.random.default_rng(1)
    gws = jnp.asarray((rng2.normal(size=(NB, 2, 3, 3, 128, 128)) * 0.03).astype(np.float32))
    gbv = jnp.asarray((rng2.normal(size=(NB, 2, 128)) * 0.01).astype(np.float32))
    cah = 64
    gcw1 = jnp.asarray((rng2.normal(size=(NB, 128, cah)) * 0.1).astype(np.float32))
    gcb1 = jnp.asarray((rng2.normal(size=(NB, cah)) * 0.1).astype(np.float32))
    gcw2 = jnp.asarray((rng2.normal(size=(NB, cah, 128)) * 0.1).astype(np.float32))
    gcb2 = jnp.asarray((rng2.normal(size=(NB, 128)) * 0.1).astype(np.float32))
    gargs = (gws, gbv, gcw1, gcb1, gcw2, gcb2)

    def group_direct(x, *g):
        ws_, bv_, cw1_, cb1_, cw2_, cb2_ = g
        q = x
        for i in range(NB):
            r = jax.nn.relu(conv(q, ws_[i, 0].astype(dtype), bv_[i, 0].astype(dtype)))
            r = conv(r, ws_[i, 1].astype(dtype), bv_[i, 1].astype(dtype))
            mean = jnp.mean(r.astype(jnp.float32), axis=(1, 2))
            gt = jax.nn.relu(mean @ cw1_[i] + cb1_[i])
            gt = jax.nn.sigmoid(gt @ cw2_[i] + cb2_[i])
            q = q + (r.astype(jnp.float32) * gt[:, None, None, :]).astype(dtype)
        return q

    def group_wino(m):
        from sres_tpu.ops.pallas.wino_group_grad import wino_group
        spec = wino_spec(m, HW, HW)

        def f(x, *g):
            q = to_quad(x, spec)
            q = wino_group(q, *g, m, (HW, HW), args.bs)
            return from_quad(q, spec)
        return f

    def fwd_step(chain):
        def step(x, *rest):
            s = jnp.sum(chain(x, *rest).astype(jnp.float32))
            return x + (0.0 * s).astype(x.dtype), s
        return step

    def fb_step(chain):
        def loss(rest, x):
            return jnp.sum(chain(x, *rest).astype(jnp.float32) ** 2)
        vag = jax.value_and_grad(loss)

        def step(x, *rest):
            l, gr = vag(rest, x)
            dep = l + sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(gr))
            return x + (0.0 * dep).astype(x.dtype), l
        return step

    def record(name, ms):
        results[name] = dict(ms=round(ms, 2),
                             ms_per_conv=round(ms / K, 4),
                             tflops_fwd_equiv=round(fl_conv * K / ms / 1e9, 1))

    if want("direct_fwd"):
        ms, _ = timeit(fwd_step(direct_chain), (x, ws, bs_), args.steps)
        record("direct_fwd", ms)
    for m in (2, 4):
        if want(f"wino{m}_fwd"):
            ms, _ = timeit(fwd_step(wino_chain(m)), (x, ws, bs_), args.steps)
            record(f"wino{m}_fwd", ms)
    for m in (2, 4):
        if want(f"wino{m}_chain_fwd"):
            ms, _ = timeit(fwd_step(wino_chain_fused(m)), (x, ws, bs_),
                           args.steps)
            record(f"wino{m}_chain_fwd", ms)
    if want("direct_fb"):
        ms, _ = timeit(fb_step(direct_chain), (x, ws, bs_), args.steps)
        record("direct_fb", ms)
    for m in (2, 4):
        if want(f"wino{m}_fb"):
            ms, _ = timeit(fb_step(wino_chain(m)), (x, ws, bs_), args.steps)
            record(f"wino{m}_fb", ms)

    def record_g(name, ms):
        results[name] = dict(ms=round(ms, 2), nblocks=NB,
                             ms_per_conv=round(ms / (2 * NB), 4),
                             tflops_fwd_equiv=round(
                                 fl_conv * 2 * NB / ms / 1e9, 1))

    if want("group_direct_fwd"):
        ms, _ = timeit(fwd_step(group_direct), (x,) + gargs, args.steps)
        record_g("group_direct_fwd", ms)
    if want("group_direct_fb"):
        ms, _ = timeit(fb_step(group_direct), (x,) + gargs, args.steps)
        record_g("group_direct_fb", ms)
    for m in (2, 4):
        if want(f"wino{m}_group_fwd"):
            ms, _ = timeit(fwd_step(group_wino(m)), (x,) + gargs, args.steps)
            record_g(f"wino{m}_group_fwd", ms)
        if want(f"wino{m}_group_fb"):
            ms, _ = timeit(fb_step(group_wino(m)), (x,) + gargs, args.steps)
            record_g(f"wino{m}_group_fb", ms)

    print(json.dumps(dict(batch=B, hw=HW, nconvs=K, bs=args.bs,
                          ablate=args.ablate,
                          dtype=str(dtype.__name__), results=results)))


if __name__ == "__main__":
    main()
