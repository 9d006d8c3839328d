"""Probe: which int8 BACKWARD-conv forms does the TPU backend accelerate?

int8_full (ops/int8_conv.py) hand-writes the VJP so dx and dw also run
s8×s8, but the full step measured 519 ms at batch 144 vs AQT's 139.6 —
the backward convs are evidently not riding the int8 MXU. This micro
times each backward contraction FORM in isolation at the flagship trunk
geometry (lane-packed C=128, 48×48, device-looped, value-fetch):

  dx_bf16         plain bf16 input-gradient conv (control)
  dx_flip_after   shipped form: conv(convert(gq), flip(convert(wq)))
                  — the flip sits BETWEEN convert and conv
  dx_flip_before  conv(convert(gq), convert(flip-then-quantized wq))
                  — clean convert producers on both operands
  dw_bf16         plain bf16 weight-gradient conv (control; window 48×48,
                  output 3×3, B contracted)
  dw_int8         conv(convert(xq), convert(gq)) in the weight-grad form

Whichever int8 form fails to beat its bf16 control identifies the
non-accelerated conv; the fix goes into ops/int8_conv.py.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from sres_tpu.ops.int8_conv import _DN_DX, _DN_DW

B, H, W, C, K, NCONV, ITERS = 72, 48, 48, 128, 3, 20, 10


def q8(t, axes):
    tf = t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(tf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(tf / scale), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    pad1 = [(1, 1), (1, 1)]

    # --- dx forms: g (B,H,W,O) ⋆ w (K,K,I,O) → (B,H,W,I); O contracted ---
    def dx_bf16(g, w):
        return lax.conv_general_dilated(
            g, jnp.flip(w, (0, 1)), (1, 1), pad1, dimension_numbers=_DN_DX)

    def dx_flip_after(g, w):
        gq, sg = q8(g, (1, 2, 3))
        wq, sw = q8(w, (0, 1, 3))
        y = lax.conv_general_dilated(
            gq.astype(jnp.bfloat16), jnp.flip(wq, (0, 1)).astype(jnp.bfloat16),
            (1, 1), pad1, dimension_numbers=_DN_DX)
        return (y.astype(jnp.float32) * (sg * sw.reshape(1, 1, 1, -1))
                ).astype(jnp.bfloat16)

    def dx_flip_before(g, w):
        gq, sg = q8(g, (1, 2, 3))
        wq, sw = q8(jnp.flip(w, (0, 1)), (0, 1, 3))   # flip THEN quantize
        y = lax.conv_general_dilated(
            gq.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
            (1, 1), pad1, dimension_numbers=_DN_DX)
        return (y.astype(jnp.float32) * (sg * sw.reshape(1, 1, 1, -1))
                ).astype(jnp.bfloat16)

    def dx_std_form(g, w):
        """dx as a STANDARD forward-form conv: flip+transpose the weights
        first, then quantize — both operands are clean convert(s8) in the
        exact NHWC/HWIO shape the accelerated forward uses."""
        gq, sg = q8(g, (1, 2, 3))
        wt = jnp.transpose(jnp.flip(w, (0, 1)), (0, 1, 3, 2))  # (K,K,O,I)
        wtq, swt = q8(wt, (0, 1, 2))                           # per-"O"(=I)
        dn = lax.conv_dimension_numbers((B, H, W, C), (K, K, C, C),
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            gq.astype(jnp.bfloat16), wtq.astype(jnp.bfloat16),
            (1, 1), pad1, dimension_numbers=dn)
        return (y.astype(jnp.float32) * (sg * swt.reshape(1, 1, 1, -1))
                ).astype(jnp.bfloat16)

    def fwd_int8_control(g, w):
        """the known-accelerated standard int8 forward form, same harness."""
        gq, sg = q8(g, (1, 2, 3))
        wq, sw = q8(w, (0, 1, 2))
        dn = lax.conv_dimension_numbers((B, H, W, C), (K, K, C, C),
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            gq.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
            (1, 1), pad1, dimension_numbers=dn)
        return (y.astype(jnp.float32) * sg).astype(jnp.bfloat16)

    g0 = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
    ws = jnp.asarray(rng.normal(size=(NCONV, K, K, C, C)) * 0.05, jnp.bfloat16)

    for label, fn in [("fwd_int8_ctrl", fwd_int8_control),
                      ("dx_bf16", dx_bf16), ("dx_flip_after", dx_flip_after),
                      ("dx_flip_before", dx_flip_before),
                      ("dx_std_form", dx_std_form)]:
        def chain(g):
            def body(i, acc):
                w = lax.dynamic_index_in_dim(ws, i % NCONV, 0, keepdims=False)
                return (fn(acc, w) * 0.05).astype(jnp.bfloat16)
            return lax.fori_loop(0, ITERS * NCONV, body, g)

        j = jax.jit(chain)
        _ = np.asarray(jax.device_get(j(g0))).ravel()[0]
        t0 = time.perf_counter()
        _ = np.asarray(jax.device_get(j(g0))).ravel()[0]
        dt = time.perf_counter() - t0
        n = ITERS * NCONV
        flops = 2 * B * H * W * K * K * C * C * n
        print(f"{label:15s} {1e3 * dt / n:8.3f} ms/conv   "
              f"{flops / dt / 1e12:7.1f} TFLOP/s(useful)")

    # --- dw forms: x (B,H,W,I) ⋆ g (B,H,W,O) → (K,K,I,O); B contracted ---
    pad_dw = [(1, 1), (1, 1)]
    x0 = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)

    def dw_bf16(x, g):
        return lax.conv_general_dilated(
            x, g, (1, 1), pad_dw, dimension_numbers=_DN_DW)

    def dw_int8(x, g):
        xq, sx = q8(x, (1, 2, 3))
        gq, sg = q8(g * sx, None)
        y = lax.conv_general_dilated(
            xq.astype(jnp.bfloat16), gq.astype(jnp.bfloat16),
            (1, 1), pad_dw, dimension_numbers=_DN_DW)
        return (y.astype(jnp.float32) * sg).astype(jnp.float32)

    def dw_tapdot_int8(x, g):
        """dw as 9 per-tap s8×s8 dot_generals (the canonical int8-MXU op)
        instead of a 48×48-window conv: dw[kh,kw,i,o] = x_shift·g over BHW."""
        xq, sx = q8(x, (1, 2, 3))
        gq, sg = q8(g * sx, None)
        xp = jnp.pad(xq.astype(jnp.bfloat16),
                     ((0, 0), (1, 1), (1, 1), (0, 0)))
        gm = gq.astype(jnp.bfloat16).reshape(-1, C)
        taps = []
        for kh in range(K):
            for kw in range(K):
                xs = xp[:, kh:kh + H, kw:kw + W, :].reshape(-1, C)
                taps.append(jax.lax.dot_general(
                    xs, gm, (((0,), (0,)), ((), ()))))   # (C_in, C_out)
        dw = jnp.stack(taps, 0).reshape(K, K, C, C)
        return dw.astype(jnp.float32) * sg

    for label, fn in [("dw_bf16", dw_bf16), ("dw_int8", dw_int8),
                      ("dw_tapdot_int8", dw_tapdot_int8)]:
        def chain(g):
            def body(i, carry):
                gg, acc = carry
                dwv = fn(x0, gg)
                # scalar dependency so iterations serialize; negligible cost
                gg = gg + (dwv.sum() * 1e-30).astype(jnp.bfloat16)
                return gg, acc + dwv.astype(jnp.float32)
            _, acc = lax.fori_loop(
                0, ITERS * NCONV, body,
                (g, jnp.zeros((K, K, C, C), jnp.float32)))
            return acc

        j = jax.jit(chain)
        _ = np.asarray(jax.device_get(j(g0))).ravel()[0]
        t0 = time.perf_counter()
        _ = np.asarray(jax.device_get(j(g0))).ravel()[0]
        dt = time.perf_counter() - t0
        n = ITERS * NCONV
        flops = 2 * B * H * W * K * K * C * C * n
        print(f"{label:15s} {1e3 * dt / n:8.3f} ms/conv   "
              f"{flops / dt / 1e12:7.1f} TFLOP/s(useful)")


if __name__ == "__main__":
    main()
