"""On-chip microbenchmarks for the RCAN trunk optimization campaign (round 2).

Measures fwd+bwd wall time of 20-RCAB chains (the unit PERF.md calibrated:
XLA baseline 17.3 ms at batch 72, 48x48, C=64, bf16) under candidate
restructurings, plus raw conv calibration points, WITHOUT touching the model
zoo. All timings fetch a value inside the timed region (axon tunnel:
block_until_ready returns early).

Variants:
  base64      current structure: C=64 chain, batch B
  noca64      same without channel attention (isolates CA cost)
  pack128d    2 tiles packed into C=128, block-diagonal DENSE weights (2x
              FLOPs, full lane occupancy), batch B/2
  pack128g    same packing via feature_group_count=2 grouped convs (no
              wasted FLOPs if the TPU emitter keeps groups in one pass)
  conv64/128/128g  single 3x3 conv calibration (TFLOP/s)
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run without install;
# late insert so the interpreter's sitecustomize (axon TPU plugin
# registration) never resolves the repo's top-level config/ tree

import argparse
import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def conv(x, w, b=None, groups=1):
    y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)] if w.shape[0] == 3
                                 else [(0, 0), (0, 0)],
                                 dimension_numbers=DN, feature_group_count=groups,
                                 preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def rcab(x, p, ca=True, groups=1):
    r = conv(x, p["w1"], p["b1"], groups)
    r = jax.nn.relu(r)
    r = conv(r, p["w2"], p["b2"], groups)
    if ca:
        g = jnp.mean(r, axis=(1, 2), keepdims=True)
        g = jax.nn.relu(conv(g, p["w3"], p["b3"], groups))
        g = jax.nn.sigmoid(conv(g, p["w4"], p["b4"], groups))
        r = r * g
    return x + r


def make_params(key, nblocks, cin, cout, red, dtype, blockdiag=False, grouped=False):
    """cin/cout are LOGICAL channel counts (64); blockdiag/grouped build the
    packed-to-128 variants from the same logical weights."""
    ks = jax.random.split(key, nblocks)
    params = []
    for k in ks:
        k1, k2, k3, k4 = jax.random.split(k, 4)
        s = 0.05
        w1 = jax.random.normal(k1, (3, 3, cin, cout), jnp.float32) * s
        w2 = jax.random.normal(k2, (3, 3, cout, cout), jnp.float32) * s
        w3 = jax.random.normal(k3, (1, 1, cout, cout // red), jnp.float32) * s
        w4 = jax.random.normal(k4, (1, 1, cout // red, cout), jnp.float32) * s

        def bd(w):  # block_diag(w, w) on the I/O axes
            kh, kw, ci, co = w.shape
            out = jnp.zeros((kh, kw, 2 * ci, 2 * co), jnp.float32)
            out = out.at[:, :, :ci, :co].set(w)
            return out.at[:, :, ci:, co:].set(w)

        def gr(w):  # grouped layout: I stays logical, O doubled
            return jnp.concatenate([w, w], axis=3)

        tx = bd if blockdiag else (gr if grouped else (lambda w: w))
        mul = 2 if (blockdiag or grouped) else 1
        p = {
            "w1": tx(w1).astype(dtype), "b1": jnp.zeros((cout * mul,), dtype),
            "w2": tx(w2).astype(dtype), "b2": jnp.zeros((cout * mul,), dtype),
            "w3": tx(w3).astype(dtype), "b3": jnp.zeros((cout // red * mul,), dtype),
            "w4": tx(w4).astype(dtype), "b4": jnp.zeros((cout * mul,), dtype),
        }
        params.append(p)
    return params


def chain_loss(params, x, ca=True, groups=1):
    for p in params:
        x = rcab(x, p, ca=ca, groups=groups)
    return jnp.sum(x.astype(jnp.float32) ** 2)


def timeit(step_body, args, steps, warmup):
    """step_body(carry, *rest) -> (carry, scalar). The whole steps-loop runs
    ON DEVICE (lax.fori_loop inside one jit) — through the axon tunnel every
    python-level dispatch costs ~15 ms of round-trip latency, so host-side
    loops measure the tunnel, not the chip. One value fetch at the end."""
    from jax import lax as _lax

    def run(x, rest, n):
        def body(_, c):
            x, acc = c
            x, out = step_body(x, *rest)
            return (x, acc + out.astype(jnp.float32))
        return _lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))

    runner = jax.jit(run, static_argnums=2)
    x0 = jnp.array(args[0])
    xw, accw = runner(x0, args[1:], steps)   # warmup = compile + one pass
    float(accw)
    t0 = time.perf_counter()
    x1, acc = runner(xw, args[1:], steps)
    acc = float(acc)  # fetch inside the timed region
    dt = (time.perf_counter() - t0) / steps
    return dt * 1000.0, acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=72)
    ap.add_argument("--hw", type=int, default=48)
    ap.add_argument("--nblocks", type=int, default=20)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    B, HW, NB = args.batch, args.hw, args.nblocks
    key = jax.random.PRNGKey(0)
    x64 = jax.random.normal(key, (B, HW, HW, 64), jnp.float32).astype(dtype)
    x128 = x64.reshape(B // 2, 2, HW, HW, 64).transpose(0, 2, 3, 1, 4) \
              .reshape(B // 2, HW, HW, 128)

    results = {}
    flops_chain = NB * 2 * (2 * B * HW * HW * 64 * 64 * 9)  # fwd convs only
    want = lambda n: (not args.only) or n in args.only.split(",")

    def grad_fn(ca, groups):
        vag = jax.value_and_grad(partial(chain_loss, ca=ca, groups=groups))

        def step(x, params):
            loss, grads = vag(params, x)
            # serialize successive steps: next input depends on the grads
            dep = loss + sum(jnp.sum(g).astype(jnp.float32)
                             for p in grads for g in p.values())
            return x + (0.0 * dep).astype(x.dtype), loss
        return step

    if want("base64"):
        p = make_params(key, NB, 64, 64, 16, dtype)
        ms, _ = timeit(grad_fn(True, 1), (x64, p), args.steps, args.warmup)
        results["base64"] = dict(ms=round(ms, 2), tflops=round(3 * flops_chain / ms / 1e9, 1))
    if want("noca64"):
        p = make_params(key, NB, 64, 64, 16, dtype)
        ms, _ = timeit(grad_fn(False, 1), (x64, p), args.steps, args.warmup)
        results["noca64"] = dict(ms=round(ms, 2), tflops=round(3 * flops_chain / ms / 1e9, 1))
    if want("pack128d"):
        p = make_params(key, NB, 64, 64, 16, dtype, blockdiag=True)
        ms, _ = timeit(grad_fn(True, 1), (x128, p), args.steps, args.warmup)
        results["pack128d"] = dict(ms=round(ms, 2), tflops=round(3 * flops_chain / ms / 1e9, 1))
    if want("pack128g"):
        p = make_params(key, NB, 64, 64, 16, dtype, grouped=True)
        ms, _ = timeit(grad_fn(True, 2), (x128, p), args.steps, args.warmup)
        results["pack128g"] = dict(ms=round(ms, 2), tflops=round(3 * flops_chain / ms / 1e9, 1))
    if want("noca128d"):
        p = make_params(key, NB, 64, 64, 16, dtype, blockdiag=True)
        ms, _ = timeit(grad_fn(False, 1), (x128, p), args.steps, args.warmup)
        results["noca128d"] = dict(ms=round(ms, 2), tflops=round(3 * flops_chain / ms / 1e9, 1))

    # raw conv calibration (fwd only)
    def convbench(name, x, w, groups=1):
        def step(x, w):
            s = jnp.sum(conv(x, w, groups=groups).astype(jnp.float32))
            return x + (0.0 * s).astype(x.dtype), s
        ms, _ = timeit(step, (x, w), args.steps, args.warmup)
        fl = 2 * x.shape[0] * HW * HW * w.shape[2] * w.shape[3] * 9 * groups
        results[name] = dict(ms=round(ms, 3), tflops=round(fl / ms / 1e9, 1))
    if want("conv64"):
        w = jax.random.normal(key, (3, 3, 64, 64), jnp.float32).astype(dtype) * 0.05
        convbench("conv64", x64, w)
    if want("conv128"):
        w = jax.random.normal(key, (3, 3, 128, 128), jnp.float32).astype(dtype) * 0.05
        convbench("conv128", x128, w)
    if want("conv128g"):
        w = jax.random.normal(key, (3, 3, 64, 128), jnp.float32).astype(dtype) * 0.05
        convbench("conv128g", x128, w, groups=2)

    print(json.dumps(dict(batch=B, hw=HW, nblocks=NB,
                          dtype=str(dtype.__name__), results=results)))


if __name__ == "__main__":
    main()
