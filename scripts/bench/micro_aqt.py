"""Probe: AQT int8 conv (dynamic absmax quant -> int8 MXU -> dequant) vs the
plain bf16 conv at the flagship trunk geometry. Device-looped timing
(axon tunnel rules, CLAUDE.md). Also prints the quantization error so the
serving-quality tradeoff is on record.

micro_int8.py measured the raw int8 MXU at 1.83x bf16; this measures how
much of that survives AQT's quant/dequant overhead — the go/no-go for the
opt-in quantized serving path (ROADMAP #5).
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


def make_aqt_conv():
    from aqt.jax.v2 import config as aqt_config
    from aqt.jax.v2.aqt_conv_general import make_conv_general_dilated
    return make_conv_general_dilated(
        aqt_config.conv_general_dilated_make(2, lhs_bits=8, rhs_bits=8))


def run(conv_fn, dtype, label):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), dtype)
    ws = jnp.asarray(rng.normal(size=(NCONV, K, K, C, C)) * 0.05, dtype)
    dn = jax.lax.conv_dimension_numbers((B, H, W, C), (K, K, C, C),
                                        ("NHWC", "HWIO", "NHWC"))

    def chain(x):
        def body(i, acc):
            w = jax.lax.dynamic_index_in_dim(ws, i % NCONV, 0, keepdims=False)
            y = conv_fn(acc, w, (1, 1), [(1, 1), (1, 1)],
                        dimension_numbers=dn, preferred_element_type=jnp.float32)
            return (y * 0.05).astype(dtype)
        return jax.lax.fori_loop(0, ITERS * NCONV, body, x)

    fn = jax.jit(chain)
    out = fn(x)
    _ = np.asarray(jax.device_get(out)).ravel()[0]
    t0 = time.perf_counter()
    out = fn(x)
    _ = np.asarray(jax.device_get(out)).ravel()[0]
    dt = time.perf_counter() - t0
    nconvs = ITERS * NCONV
    flops = 2 * B * H * W * K * K * C * C * nconvs
    print(f"{label:14s} {1e3 * dt / nconvs:8.3f} ms/conv   "
          f"{flops / dt / 1e12:7.1f} TFLOP/s(useful)")


def error_probe():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, K, C, C)) * 0.05, jnp.float32)
    dn = jax.lax.conv_dimension_numbers((B, H, W, C), (K, K, C, C),
                                        ("NHWC", "HWIO", "NHWC"))
    args = ((1, 1), [(1, 1), (1, 1)])
    ref = jax.lax.conv_general_dilated(x, w, *args, dimension_numbers=dn)
    q = make_aqt_conv()(x, w, *args, dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
    rel = float(jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref))
    print(f"aqt int8 relative error vs f32 conv: {rel:.4f}")


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices())
    run(jax.lax.conv_general_dilated, jnp.bfloat16, "bf16")
    run(make_aqt_conv(), jnp.bfloat16, "aqt-int8-bf16")
    run(make_aqt_conv(), jnp.float32, "aqt-int8-f32")
    error_probe()
