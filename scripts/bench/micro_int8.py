"""Probe: is the v5e int8 MXU path (394 TOPS peak vs 197 bf16) reachable
through XLA's conv emitter? Times a C=128 3x3 conv chain at the flagship's
48x48 trunk geometry in bf16 vs int8(+int32 accum), loop ON DEVICE
(lax.fori_loop in one jit, value fetch — axon tunnel rules, CLAUDE.md).

Decides ROADMAP #5 (quantized serving path): build it only if int8 wins
materially here.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run without install;
# late insert so the interpreter's sitecustomize (axon TPU plugin
# registration) never resolves the repo's top-level config/ tree

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C, K, NCONV, ITERS = 36, 48, 48, 128, 3, 20, 20


def run(dtype_in, dtype_acc, label):
    rng = np.random.default_rng(0)
    if dtype_in == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 127, size=(B, H, W, C)), jnp.int8)
        ws = jnp.asarray(rng.integers(-127, 127, size=(NCONV, K, K, C, C)), jnp.int8)
    else:
        x = jnp.asarray(rng.normal(size=(B, H, W, C)), dtype_in)
        ws = jnp.asarray(rng.normal(size=(NCONV, K, K, C, C)) * 0.05, dtype_in)

    dn = jax.lax.conv_dimension_numbers((B, H, W, C), (K, K, C, C),
                                        ("NHWC", "HWIO", "NHWC"))

    def chain(x):
        def body(i, acc):
            w = jax.lax.dynamic_index_in_dim(ws, i % NCONV, 0, keepdims=False)
            y = jax.lax.conv_general_dilated(
                acc, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                preferred_element_type=dtype_acc)
            # re-quantize / renorm so the loop carry keeps the input dtype
            if dtype_in == jnp.int8:
                y = (y >> 12).astype(jnp.int8)
            else:
                y = (y * 0.05).astype(dtype_in)
            return y
        return jax.lax.fori_loop(0, ITERS * NCONV, body, x)

    fn = jax.jit(chain)
    out = fn(x)
    _ = np.asarray(jax.device_get(out)).ravel()[0]  # warmup + fetch
    t0 = time.perf_counter()
    out = fn(x)
    _ = np.asarray(jax.device_get(out)).ravel()[0]
    dt = time.perf_counter() - t0
    nconvs = ITERS * NCONV
    flops = 2 * B * H * W * K * K * C * C * nconvs
    print(f"{label:16s} {1e3 * dt / nconvs:8.3f} ms/conv   "
          f"{flops / dt / 1e12:7.1f} T(FL)OP/s")
    return dt


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices())
    run(jnp.bfloat16, jnp.float32, "bf16->f32")
    run(jnp.int8, jnp.int32, "int8->int32")
