"""Quad-layout trunk blocks for Winograd mode (``model.winograd: 2|4``).

Mirror of the lane-packed RCAN trunk modules (models/layers.py: RCAB /
CALayer / ResidualGroup; reference: sres/model/rcan/network.py:31-80) whose
3×3 convs run through the Pallas Winograd kernel
(ops/pallas/winograd_conv.py) on persistent quad-plane activations
(ops/winograd.py). Child module and param names are chosen to produce the
EXACT param tree of the direct path (RCAB_i/Conv_j/Conv_0/{kernel,bias},
CALayer_0/Conv_j/...), so checkpoints, torch import/export and the golden
parity tests are winograd-agnostic.

Layout invariants relied on throughout: plane borders are exactly zero
(the kernel writes masked interiors over a zeroed buffer; relu/add/gating
preserve zeros), so channel attention's global mean is the plane sum over
the true pixel count.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import Conv, torch_bias_init, torch_kernel_init
from sres_tpu.ops.pallas.winograd_conv import wino_conv_quad

Dtype = Any


def expand_blockdiag(kernel: jnp.ndarray, pack: int) -> jnp.ndarray:
    """(k, k, cin, cout) logical → (k, k, p·cin, p·cout) block-diagonal
    (concat form — scatters cost ~6 ms/step on the full RCAN, profiled)."""
    if pack == 1:
        return kernel
    zero = jnp.zeros_like(kernel)
    rows = [jnp.concatenate([kernel if g == j else zero for j in range(pack)],
                            axis=3) for g in range(pack)]
    return jnp.concatenate(rows, axis=2)


class _WinoConvCore(nn.Module):
    """3×3 conv on quad planes; params identical to _PackedConvCore
    (logical kernel + bias under name 'Conv_0')."""
    features: int
    pack: int
    m: int
    hw: tuple
    relu: bool = False
    use_bias: bool = True
    bs: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, q: jnp.ndarray, collect: bool = False) -> jnp.ndarray:
        cin = q.shape[-1] // self.pack
        kernel = self.param("kernel", torch_kernel_init,
                            (3, 3, cin, self.features))
        fan_in = cin * 9
        if self.use_bias:
            bias = self.param("bias", lambda key, shape, dt=jnp.float32:
                              torch_bias_init(key, shape, dt, fan_in),
                              (self.features,))
            bias = jnp.tile(bias, self.pack)
        else:
            bias = jnp.zeros((self.features * self.pack,), jnp.float32)
        big = expand_blockdiag(kernel, self.pack).astype(jnp.float32)
        if collect:
            return big, bias.astype(jnp.float32)
        dt = self.dtype or q.dtype
        return wino_conv_quad(q.astype(dt), big, bias, self.m, self.hw,
                              self.relu, self.bs)


class WinoConv(nn.Module):
    """Drop-in for layers.Conv(kernel_size=3) in quad layout (same tree:
    Conv_i/Conv_0/{kernel,bias})."""
    features: int
    pack: int
    m: int
    hw: tuple
    relu: bool = False
    use_bias: bool = True
    bs: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, q: jnp.ndarray, collect: bool = False) -> jnp.ndarray:
        return _WinoConvCore(self.features, self.pack, self.m, self.hw,
                             self.relu, self.use_bias, self.bs, self.dtype,
                             name="Conv_0")(q, collect)


class WinoCALayer(nn.Module):
    """Channel attention on quad planes (reference rcan/network.py:31):
    global mean = plane sum / true pixel count (borders are zero), 1×1 convs
    on the pooled vector reuse the packed Conv modules unchanged."""
    channels: int
    reduction: int
    npix: int
    pack: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, q: jnp.ndarray, collect: bool = False):
        if collect:
            cpk = q.shape[-1]                 # packed channel count (128)
            cah = (self.channels // self.reduction) * self.pack
            w1, b1 = Conv(self.channels // self.reduction, 1, dtype=self.dtype,
                          pack=self.pack, name="Conv_0")(
                              jnp.zeros((1, 1, 1, cpk), q.dtype), collect=True)
            w2, b2 = Conv(self.channels, 1, dtype=self.dtype, pack=self.pack,
                          name="Conv_1")(
                              jnp.zeros((1, 1, 1, cah), q.dtype), collect=True)
            return (w1.reshape(cpk, cah), b1, w2.reshape(cah, cpk), b2)
        y = jnp.sum(q.astype(jnp.float32), axis=(1, 2), keepdims=False) / self.npix
        y = y[:, None, None, :].astype(q.dtype)          # (T, 1, 1, C·pack)
        y = Conv(self.channels // self.reduction, 1, dtype=self.dtype,
                 pack=self.pack, name="Conv_0")(y)
        y = nn.relu(y)
        y = Conv(self.channels, 1, dtype=self.dtype, pack=self.pack,
                 name="Conv_1")(y)
        gate = jax.nn.sigmoid(y)                          # (T, 1, 1, C·pack)
        return q * gate[:, :, 0, :][:, :, None, :]


class WinoRCAB(nn.Module):
    """RCAB on quad planes: conv+relu (fused) → conv → CA → skip."""
    features: int
    reduction: int
    m: int
    hw: tuple
    pack: int
    bs: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, q: jnp.ndarray, collect: bool = False):
        c1 = WinoConv(self.features, self.pack, self.m, self.hw, relu=True,
                      bs=self.bs, dtype=self.dtype, name="Conv_0")
        c2 = WinoConv(self.features, self.pack, self.m, self.hw, relu=False,
                      bs=self.bs, dtype=self.dtype, name="Conv_1")
        ca = WinoCALayer(self.features, self.reduction,
                         self.hw[0] * self.hw[1], self.pack,
                         dtype=self.dtype, name="CALayer_0")
        if collect:
            w1, b1 = c1(q, collect=True)
            w2, b2 = c2(q, collect=True)
            return (jnp.stack([w1, w2]), jnp.stack([b1, b2])) + ca(q, collect=True)
        r = c1(q)
        r = c2(r)
        r = ca(r)
        return q + r


class WinoResidualGroup(nn.Module):
    """nblocks × WinoRCAB + trailing conv + group skip, all on quad planes.

    ``chain=True`` runs the whole RCAB stack in ONE pallas_call — the
    round-3 bisection measured the per-conv kernel's block pipeline at 65%
    of its wall time, which chaining amortizes across the group. It is
    fully differentiable: ops/pallas/wino_group_grad.py's custom VJP
    recomputes the chain with a per-RCAB input stash, then runs reversed
    chunked backward kernels (exact adjoints, gradchecked). The param tree
    is identical to chain=False (the same child modules declare the params
    in collect mode)."""
    features: int
    reduction: int
    nblocks: int
    m: int
    hw: tuple
    pack: int
    bs: int = 1
    chain: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, q: jnp.ndarray) -> jnp.ndarray:
        if self.chain:
            from sres_tpu.ops.pallas.wino_group_grad import wino_group_trail
            ws, bv, cw1, cb1, cw2, cb2 = [], [], [], [], [], []
            for i in range(self.nblocks):
                w2, b2, a1, ab1, a2, ab2 = WinoRCAB(
                    self.features, self.reduction, self.m, self.hw,
                    self.pack, self.bs, dtype=self.dtype,
                    name=f"RCAB_{i}")(q, collect=True)
                ws.append(w2); bv.append(b2); cw1.append(a1)
                cb1.append(ab1); cw2.append(a2); cb2.append(ab2)
            # the trailing conv + group skip ride the SAME pallas_call as
            # the RCAB chain (one fewer per-conv pipeline round-trip)
            wt, bt = WinoConv(self.features, self.pack, self.m, self.hw,
                              relu=False, bs=self.bs, dtype=self.dtype,
                              name="Conv_0")(q, collect=True)
            return wino_group_trail(q, jnp.stack(ws), jnp.stack(bv),
                                    jnp.stack(cw1), jnp.stack(cb1),
                                    jnp.stack(cw2), jnp.stack(cb2),
                                    wt, bt, self.m, self.hw, self.bs)
        r = q
        for i in range(self.nblocks):
            r = WinoRCAB(self.features, self.reduction, self.m, self.hw,
                         self.pack, self.bs, dtype=self.dtype,
                         name=f"RCAB_{i}")(r)
        r = WinoConv(self.features, self.pack, self.m, self.hw, relu=False,
                     bs=self.bs, dtype=self.dtype, name="Conv_0")(r)
        return q + r
