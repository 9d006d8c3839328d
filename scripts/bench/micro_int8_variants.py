"""Probe: which quantized-conv FORM does the TPU backend accelerate?

The compiled HLO shows AQT's conv is a plain bf16 convolution over
integer-valued operands (no s8 op anywhere) yet it measured 2.8× the plain
bf16 conv — so the int8-MXU selection happens inside the TPU backend
compiler, keyed on the operand producers. This micro times the candidate
forms per-conv at the flagship trunk geometry (device-looped, value-fetch):

  bf16        plain bf16 conv (control)
  aqt         AQT's injected conv (the known-fast form)
  ours        ops/int8_conv forward as shipped (int8 store → bf16 operands)
  ours_bf16o  same but bf16 output (no f32 preferred_element_type)
  roundclip   quantize WITHOUT the int8 round-trip: round/clip in bf16,
              bf16 output — form-identical to AQT's

Whichever non-AQT form reaches AQT's speed becomes int8_conv's lowering.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C, K, NCONV, ITERS = 36, 48, 48, 128, 3, 20, 20


def q8_int8(t):
    tf = t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(tf), axis=(1, 2, 3), keepdims=True)
    scale = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(tf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def q8_roundclip(t):
    tf = t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(tf), axis=(1, 2, 3), keepdims=True)
    scale = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(tf / scale), -127.0, 127.0).astype(jnp.bfloat16)
    return q, scale


def qw_roundclip(w):
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=(0, 1, 2), keepdims=True)
    scale = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    return jnp.clip(jnp.round(wf / scale), -127.0, 127.0).astype(jnp.bfloat16), scale


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    dn = jax.lax.conv_dimension_numbers((B, H, W, C), (K, K, C, C),
                                        ("NHWC", "HWIO", "NHWC"))
    cargs = dict(window_strides=(1, 1), padding=[(1, 1), (1, 1)],
                 dimension_numbers=dn)

    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(x, w, **cargs)

    def conv_ours(x, w):
        xq, sx = q8_int8(x)
        wq, sw_ = qw_roundclip(w)   # weight path identical across variants
        y = jax.lax.conv_general_dilated(
            xq.astype(jnp.bfloat16), wq, preferred_element_type=jnp.float32,
            **cargs)
        return (y * sx).astype(jnp.bfloat16)

    def conv_ours_bf16o(x, w):
        xq, sx = q8_int8(x)
        wq, sw_ = qw_roundclip(w)
        y = jax.lax.conv_general_dilated(xq.astype(jnp.bfloat16), wq, **cargs)
        return (y.astype(jnp.float32) * sx).astype(jnp.bfloat16)

    def conv_roundclip(x, w):
        xq, sx = q8_roundclip(x)
        wq, sw_ = qw_roundclip(w)
        y = jax.lax.conv_general_dilated(xq, wq, **cargs)
        return (y.astype(jnp.float32) * sx).astype(jnp.bfloat16)

    from sres_tpu.models.layers import aqt_conv_fn
    _aqt = aqt_conv_fn()

    def conv_aqt(x, w):
        return _aqt(x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    for label, fn in [("bf16", conv_bf16), ("aqt", conv_aqt),
                      ("ours", conv_ours), ("ours_bf16o", conv_ours_bf16o),
                      ("roundclip", conv_roundclip)]:
        x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
        ws = jnp.asarray(rng.normal(size=(NCONV, K, K, C, C)) * 0.05, jnp.bfloat16)

        def chain(x):
            def body(i, acc):
                w = jax.lax.dynamic_index_in_dim(ws, i % NCONV, 0, keepdims=False)
                return (fn(acc, w) * 0.05).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, ITERS * NCONV, body, x)

        j = jax.jit(chain)
        out = j(x)
        _ = np.asarray(jax.device_get(out)).ravel()[0]
        t0 = time.perf_counter()
        out = j(x)
        _ = np.asarray(jax.device_get(out)).ravel()[0]
        dt = time.perf_counter() - t0
        nconvs = ITERS * NCONV
        flops = 2 * B * H * W * K * K * C * C * nconvs
        print(f"{label:11s} {1e3 * dt / nconvs:8.3f} ms/conv   "
              f"{flops / dt / 1e12:7.1f} TFLOP/s(useful)")


if __name__ == "__main__":
    main()
