"""Measure the REAL hardware ceiling through the axon tunnel.

Round-5 motivation: the round-4 micro table (PERF.md) reports the 20-RCAB
group fwd+bwd at 10.65 ms — that is ~2936 dense GFLOP in 10.65 ms = 276
TFLOP/s, ABOVE the v5e's 197 TFLOP/s bf16 spec that every roofline number
(423 t/s speed of light, 98.5 TF/s packed ceiling, mfu) assumes. Either the
chip behind the tunnel exceeds v5e spec (e.g. a bf16-accumulate fast path,
or a different part than the "TPU v5 lite" label suggests), or XLA's
backward exploits structure. This probe settles it with first-principles
measurements:

  1. dense bf16 matmul peak (f32 accum and bf16 accum), MXU-shaped
  2. the bench-shaped conv (36,48,48,128)@(3,3,128,128): fwd and fwd+bwd
  3. the same conv at C=64 (the unpacked trunk shape)

All probes are SERIAL on-device chains (each iteration consumes the
previous result; weights are variance-preserving so magnitudes stay
bounded) inside one jit with one value fetch — the ~15 ms/dispatch tunnel
round-trip never touches the timed region, and XLA cannot hoist or DCE
the compute.

Usage: timeout 1800 python scripts/bench/peak_probe.py [--iters N]
Prints one JSON line per probe + a summary line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--mm", type=int, default=8192, help="matmul M=N=K")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--conv-batch", type=int, default=36, dest="conv_batch",
                   help="conv probe batch (shrink for CPU smoke tests: XLA:CPU "
                        "runs conv thunks single-threaded inside fori_loop)")
    p.add_argument("--straightline", action="store_true",
                   help="only the unrolled straight-line conv-chain probes "
                        "(the production-step shape; no fori_loop harness)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    if args.straightline:
        nc = 4 if args.cpu else 50
        straightline_probe(nconvs=nc, batch=args.conv_batch, with_ca=False)
        straightline_probe(nconvs=nc, batch=args.conv_batch, with_ca=True)
        return

    results = {}

    def timed(name, fn, x, flops_per_iter, *extra):
        # operands pass as ARGUMENTS, never closure constants — a closed-over
        # array bakes into the HLO and blows the tunnel's HTTP request limit
        # at large sizes (measured: 16384^2 bf16 -> HTTP 413)
        f = jax.jit(fn)
        y = f(x, *extra)  # compile + warm
        float(np.asarray(y).ravel()[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = f(x, *extra)
            float(np.asarray(y).ravel()[0])  # value fetch INSIDE timed region
            best = min(best, time.perf_counter() - t0)
        tfs = flops_per_iter * args.iters / best / 1e12
        ms = best / args.iters * 1e3
        results[name] = dict(ms_per_iter=round(ms, 4), tflops=round(tfs, 1))
        print(json.dumps({name: results[name]}), flush=True)

    # --- 1. dense matmul peak ---------------------------------------------
    M = args.mm
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32), jnp.bfloat16)
    # variance-preserving: var(out) = M * var(b) * var(in) = var(in)
    b = jnp.asarray((rng.normal(size=(M, M)) / np.sqrt(M)).astype(np.float32),
                    jnp.bfloat16)
    mm_flops = 2.0 * M * M * M

    def mm_loop(pet):
        def f(x, bb):
            def body(_, c):
                return jnp.dot(c, bb, preferred_element_type=pet).astype(jnp.bfloat16)
            y = jax.lax.fori_loop(0, args.iters, body, x)
            return jnp.sum(y[:1, :1])
        return f

    timed("matmul_bf16_f32acc", mm_loop(jnp.float32), a, mm_flops, b)
    timed("matmul_bf16_bf16acc", mm_loop(jnp.bfloat16), a, mm_flops, b)

    # --- 2. bench-shaped conv, dense 128 ----------------------------------
    N, H, W, C = args.conv_batch, 48, 48, 128
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32), jnp.bfloat16)
    # fan-in 9*C: variance-preserving serial conv chain
    w = jnp.asarray((rng.normal(size=(3, 3, C, C)) / np.sqrt(9 * C)).astype(np.float32),
                    jnp.bfloat16)
    conv_flops = 2.0 * N * H * W * 9 * C * C
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    def conv_fn(pet):
        def f(x0):
            def body(_, c):
                return jax.lax.conv_general_dilated(
                    c, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                    preferred_element_type=pet).astype(jnp.bfloat16)
            y = jax.lax.fori_loop(0, args.iters, body, x0)
            return jnp.sum(y[:1, :1, :1, :1])
        return f

    timed("conv128_fwd_bf16acc", conv_fn(jnp.bfloat16), x, conv_flops)
    timed("conv128_fwd_f32acc", conv_fn(jnp.float32), x, conv_flops)

    # fwd+bwd: grad wrt (x, w) of one conv; chain the dx back as next input,
    # renormalized (the rsqrt reduction is ~0.1% of the 73 GFLOP iteration)
    def conv_fb_body(c):
        def one(xx, ww):
            y = jax.lax.conv_general_dilated(
                xx, ww, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=dn, preferred_element_type=jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        dx, dw = jax.grad(one, argnums=(0, 1))(c, w)
        dxf = dx.astype(jnp.float32)
        nrm = jax.lax.rsqrt(jnp.mean(dxf * dxf) + 1e-12)
        # dw folds in with negligible weight so its computation is live
        return ((dxf * nrm) + jnp.sum(dw).astype(jnp.float32) * 1e-20).astype(jnp.bfloat16)

    def conv_fb(x0):
        y = jax.lax.fori_loop(0, args.iters, lambda _, c: conv_fb_body(c), x0)
        return jnp.sum(y[:1, :1, :1, :1])

    # fwd+dx+dw = 3x the conv FLOPs
    timed("conv128_fwd_bwd", conv_fb, x, 3 * conv_flops)

    # --- 3. unpacked C=64 conv (does 64 lanes cost the same as 128?) ------
    x64 = jnp.asarray(rng.normal(size=(2 * N, H, W, 64)).astype(np.float32), jnp.bfloat16)
    w64 = jnp.asarray((rng.normal(size=(3, 3, 64, 64)) / np.sqrt(9 * 64)).astype(np.float32),
                      jnp.bfloat16)
    conv64_flops = 2.0 * (2 * N) * H * W * 9 * 64 * 64
    dn64 = jax.lax.conv_dimension_numbers(x64.shape, w64.shape, ("NHWC", "HWIO", "NHWC"))

    def conv64_fn(x0):
        def body(_, c):
            return jax.lax.conv_general_dilated(
                c, w64, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn64,
                preferred_element_type=jnp.bfloat16).astype(jnp.bfloat16)
        y = jax.lax.fori_loop(0, args.iters, body, x0)
        return jnp.sum(y[:1, :1, :1, :1])

    timed("conv64_fwd_b72", conv64_fn, x64, conv64_flops)

    # --- 4. matmul peak across shapes (is 8192³ really the ceiling?) ------
    for Mm in (max(256, args.mm // 2), args.mm * 2):
        aa = jnp.asarray(rng.normal(size=(Mm, Mm)).astype(np.float32), jnp.bfloat16)
        bb = jnp.asarray((rng.normal(size=(Mm, Mm)) / np.sqrt(Mm)).astype(np.float32),
                         jnp.bfloat16)

        def mml(x, bb):
            def body(_, c):
                return jnp.dot(c, bb, preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)
            y = jax.lax.fori_loop(0, args.iters, body, x)
            return jnp.sum(y[:1, :1])

        timed(f"matmul_bf16_{Mm}", mml, aa, 2.0 * Mm ** 3, bb)

    # the bench conv's im2col GEMM: (N·H·W, 9·C) @ (9·C, C) — what a Pallas
    # direct-chain kernel's MXU work would look like per conv
    Mi, Ki, Ni = max(N, 4) * H * W, 9 * C, C
    ai = jnp.asarray(rng.normal(size=(Mi, Ki)).astype(np.float32), jnp.bfloat16)
    bi = jnp.asarray((rng.normal(size=(Ki, Ni)) / np.sqrt(Ki)).astype(np.float32),
                     jnp.bfloat16)
    bi_back = jnp.asarray((rng.normal(size=(Ni, Ki)) / np.sqrt(Ni)).astype(np.float32),
                          jnp.bfloat16)

    def im2col_loop(x, bif, bib):
        def body(_, c):
            y = jnp.dot(c, bif, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)          # (Mi, Ni)
            return jnp.dot(y, bib, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)       # back to (Mi, Ki)
        y = jax.lax.fori_loop(0, args.iters, body, x)
        return jnp.sum(y[:1, :1])

    # two GEMMs per iter: forward-shaped + expand-shaped
    timed("im2col_gemm_pair", im2col_loop, ai,
          2.0 * Mi * Ki * Ni + 2.0 * Mi * Ni * Ki, bi, bi_back)

    # --- 5. int8 matmul peak (the 394 TOPS path; serving already uses it) --
    a8 = jnp.asarray(rng.integers(-127, 127, size=(M, M)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, size=(M, M)), jnp.int8)

    def mm8(x, bb8):
        def body(_, c):
            y = jax.lax.dot_general(
                c, bb8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # renormalize to int8 range cheaply (shift) to keep the chain live
            return (y >> 8).astype(jnp.int8)
        y = jax.lax.fori_loop(0, args.iters, body, x)
        return jnp.sum(y[:1, :1])

    timed("matmul_int8_int32acc", mm8, a8, 2.0 * M * M * M, b8)

    print(json.dumps({"summary": results}))


def straightline_probe(iters: int = 3, nconvs: int = 50, batch: int = 36,
                       with_ca: bool = False) -> None:
    """Straight-line (UNROLLED, no fori_loop) conv-chain timing — the shape
    XLA's emitter sees in the production step. The fori_loop harness that
    produced the round-4 micro table (micro_winograd.py timeit) understates
    XLA conv throughput ~1.8x: the loop boundary defeats cross-conv
    pipelining. Run via: python scripts/bench/peak_probe.py --straightline
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    H = W = 48
    C = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, H, W, C)).astype(np.float32),
                    jnp.bfloat16)
    ws = jnp.asarray((rng.normal(size=(nconvs, 3, 3, C, C)) / np.sqrt(9 * C)
                      ).astype(np.float32), jnp.bfloat16)
    cw1 = jnp.asarray((rng.normal(size=(nconvs, C, C // 2)) * 0.1
                       ).astype(np.float32), jnp.bfloat16)
    cw2 = jnp.asarray((rng.normal(size=(nconvs, C // 2, C)) * 0.1
                       ).astype(np.float32), jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x.shape, ws[0].shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def chain(x0, ws, cw1, cw2):
        c = x0
        for i in range(nconvs):
            y = jax.lax.conv_general_dilated(
                c, ws[i], (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                preferred_element_type=jnp.bfloat16)
            if with_ca and i % 2 == 1:
                # RCAB channel attention every 2nd conv + block skip
                m = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
                g = jax.nn.relu(m @ cw1[i].astype(jnp.float32))
                g = jax.nn.sigmoid(g @ cw2[i].astype(jnp.float32))
                c = c + (y.astype(jnp.float32)
                         * g[:, None, None, :]).astype(jnp.bfloat16)
            else:
                c = jax.nn.relu(y)
        return jnp.sum(c[:1, :1, :1, :1])

    f = jax.jit(chain)
    import time as _t
    y = f(x, ws, cw1, cw2)
    float(np.asarray(y).ravel()[0])
    best = float("inf")
    for _ in range(iters):
        t0 = _t.perf_counter()
        y = f(x, ws, cw1, cw2)
        float(np.asarray(y).ravel()[0])
        best = min(best, _t.perf_counter() - t0)
    flops = 2.0 * batch * H * W * 9 * C * C * nconvs
    name = "straightline_group_ca" if with_ca else "straightline_chain"
    print(json.dumps({name: {
        "ms_total": round(best * 1e3, 3),
        "ms_per_conv": round(best * 1e3 / nconvs, 4),
        "tflops_dense": round(flops / best / 1e12, 1)}}), flush=True)


if __name__ == "__main__":
    main()
