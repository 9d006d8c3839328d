"""Shared flax building blocks for the SR model zoo (NHWC layout).

Replaces the reference's torch common blocks (sres/model/common/{cnn,residual,
upsample,unet}.py, sres/model/rcan/blocks.py) with TPU-idiomatic flax modules:
convs lower to ``lax.conv_general_dilated`` in NHWC, upsampling tails are
conv + pixel-shuffle (pure reshape/transpose — free for XLA to fuse), and
initializers reproduce torch's Conv2d defaults (kaiming-uniform a=√5) so that
training dynamics track the reference.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.ops.shuffle import pixel_shuffle

Dtype = Any

# torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
# which is variance_scaling(1/3, fan_in, uniform).
torch_kernel_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

# --- padding-aware BatchNorm batch statistics -------------------------------
# Static batch shapes under jit force the trainer to pad ragged batches with
# zero-weight samples (e.g. batch 4 sharded over 8 devices). The reference
# runs eager with dynamic shapes, so its BN train-mode batch statistics see
# only real samples — computing ours over the padded batch silently shifts
# every normalization (discovered by the unet full-stack trajectory A/B,
# round-4; reference: sres/model/common/unet.py:14-16 BatchNorm2d). The
# trainer scopes the per-sample weight vector here around model.apply; the
# weighted statistics are bitwise-identical to the plain path when every
# weight is 1 (multiply-by-1.0 and add-0.0 are exact in f32).
_BN_SAMPLE_WEIGHT: list = [None]


class bn_sample_weight:
    """Context manager scoping a (B,) 0/1 sample-weight vector over a
    model.apply so train-mode BatchNorm statistics skip padding samples.
    Trace-local: hold only within the jitted step that created the array."""

    def __init__(self, w):
        self.w = w

    def __enter__(self):
        _BN_SAMPLE_WEIGHT.append(self.w)

    def __exit__(self, *exc):
        _BN_SAMPLE_WEIGHT.pop()

_AQT_CONV = None


_AQT_SERVING_ONLY_MSG = (
    "model.quantization: 'int8' (AQT) is SERVING-ONLY: AQT's "
    "conv_general_dilated_make returns the raw forward building block, whose "
    "round/clip has zero gradient — trunk weight gradients silently vanish "
    "(discovered round 3; the round-2 'int8 train' throughput never computed "
    "a trunk backward). Use 'int8_fused' or 'int8_full' for quantized "
    "training (ops/int8_conv.py — straight-through estimator, converges "
    "like f32 per PERF.md).")


def aqt_conv_fn():
    """Drop-in ``lax.conv_general_dilated`` that dynamically quantizes both
    operands to int8 (absmax; weights per-output-channel, activations
    per-sample — AQT's conv defaults) and runs on the int8 MXU path (v5e:
    394 TOPS peak vs 197 bf16 — measured 1.38 vs 3.93 ms/conv like-for-like,
    scripts/bench/micro_aqt.py). Opt-in via ``model.quantization: int8``;
    changes numerics (~1.4% relative error per conv) so it is never a
    default.

    SERVING-ONLY: AQT's raw conv block has zero gradient through its
    round/clip (no STE), so a trunk behind it silently stops training.
    Differentiating through this wrapper raises instead (round-3 fix);
    quantized training goes through 'int8_fused'/'int8_full'."""
    global _AQT_CONV
    if _AQT_CONV is None:
        from aqt.jax.v2 import config as aqt_config
        from aqt.jax.v2.aqt_conv_general import make_conv_general_dilated
        _AQT_CONV = make_conv_general_dilated(
            aqt_config.conv_general_dilated_make(2, lhs_bits=8, rhs_bits=8))

    def conv(lhs, rhs, *args, **kwargs):
        @jax.custom_vjp
        def _serving(a, b):
            return _AQT_CONV(a, b, *args, **kwargs)

        def _fwd(a, b):  # traced only under differentiation
            raise NotImplementedError(_AQT_SERVING_ONLY_MSG)

        def _bwd(res, g):
            raise NotImplementedError(_AQT_SERVING_ONLY_MSG)

        _serving.defvjp(_fwd, _bwd)
        return _serving(lhs, rhs)

    return conv


def quant_conv_fn(quant: Optional[str]):
    """conv_general_dilated replacement for a quantization mode: 'int8' =
    AQT, 'int8_fused' = the lean forward-quantized path (ops/int8_conv.py —
    same scale structure, minimal HLO so quant fuses into neighbors),
    'int8_full' = int8_fused plus int8 backward contractions (the training
    speed path), None = no override."""
    if quant == "int8":
        return aqt_conv_fn()
    if quant in ("int8_fused", "int8_full"):
        from sres_tpu.ops.int8_conv import int8_conv_fn
        return int8_conv_fn(full=(quant == "int8_full"))
    if quant:
        raise ValueError(f"Unknown quantization mode {quant!r}")
    return None


def torch_bias_init(key, shape, dtype, fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def pack_tiles(x: jnp.ndarray, pack: int) -> jnp.ndarray:
    """(B, H, W, C) → (B/pack, H, W, C·pack): `pack` tiles' channels side by
    side so convs run with full 128-lane MXU occupancy (PERF.md lane packing;
    measured 1.22× on the RCAN trunk at pack=2, C=64)."""
    b, h, w, c = x.shape
    return x.reshape(b // pack, pack, h, w, c).transpose(0, 2, 3, 1, 4) \
            .reshape(b // pack, h, w, pack * c)


def unpack_tiles(x: jnp.ndarray, pack: int) -> jnp.ndarray:
    b, h, w, pc = x.shape
    return x.transpose(0, 3, 1, 2).reshape(b, pack, pc // pack, h, w) \
            .transpose(0, 1, 3, 4, 2).reshape(b * pack, h, w, pc // pack)


class _PackedConvCore(nn.Module):
    """Conv whose params are the LOGICAL (k,k,cin,cout) kernel but whose
    application is the block-diagonal expansion over `pack` channel groups —
    numerically identical to running each packed tile separately, checkpoint-
    compatible with nn.Conv's {kernel, bias} tree (instantiated with
    name='Conv_0' so packed and unpacked models share param trees)."""
    features: int             # logical output features
    kernel_size: int
    pack: int
    stride: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    padding: Any = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, collect: bool = False) -> jnp.ndarray:
        k, p = self.kernel_size, self.pack
        cin = x.shape[-1] // p
        kernel = self.param("kernel", torch_kernel_init, (k, k, cin, self.features))
        fan_in = cin * k * k
        bias = self.param("bias", lambda key, shape, dt=jnp.float32:
                          torch_bias_init(key, shape, dt, fan_in),
                          (self.features,)) if self.use_bias else None
        # block-diagonal expansion: group g maps channels [g·cin, (g+1)·cin)
        # → [g·cout, (g+1)·cout); off-diagonal blocks are zero. Built with
        # concatenations, not .at[].set — XLA lowers the scatters into ~6 ms
        # of per-step device time on the full RCAN (profiled), concat fuses.
        zero = jnp.zeros_like(kernel)
        rows = [jnp.concatenate([kernel if g == j else zero for j in range(p)],
                                axis=3) for g in range(p)]
        big = jnp.concatenate(rows, axis=2)
        if collect:
            # declare params, skip the conv: return the expanded block-diag
            # weights + packed bias for an external fused kernel (the wino
            # group chain, models/wino_blocks.py). x supplies shape/pack only.
            bb = (jnp.tile(bias, p) if bias is not None
                  else jnp.zeros((self.features * p,)))
            return big.astype(jnp.float32), bb.astype(jnp.float32)
        dt = self.dtype or x.dtype
        pad = self.padding if self.padding is not None else [(k // 2, k // 2)] * 2
        dn = jax.lax.conv_dimension_numbers(x.shape, big.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        conv = quant_conv_fn(self.quant) or jax.lax.conv_general_dilated
        pet = jnp.float32 if self.quant else dt
        y = conv(
            x.astype(dt), big.astype(dt), (self.stride, self.stride), pad,
            dimension_numbers=dn, preferred_element_type=pet).astype(dt)
        if bias is not None:
            y = y + jnp.tile(bias, p).astype(dt)
        return y


class Conv(nn.Module):
    """2D conv with torch-default init and 'same' padding for odd kernels
    (reference default_conv: sres/model/common/cnn.py:8). ``pack`` > 1 runs
    the block-diagonal lane-packed variant with an identical param tree."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    padding: Any = None   # default: torch's k//2 zero padding
    pack: int = 1
    quant: Optional[str] = None   # 'int8': AQT-quantized conv (opt-in)

    @nn.compact
    def __call__(self, x: jnp.ndarray, collect: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        if self.pack > 1 or collect:
            # collect routes through the packed core even at pack=1: its
            # {kernel, bias} params are checkpoint-identical to nn.Conv's
            return _PackedConvCore(
                self.features, k, self.pack, self.stride, self.use_bias,
                self.dtype, self.padding, self.quant, name="Conv_0")(x, collect)
        pad = self.padding if self.padding is not None else [(k // 2, k // 2)] * 2
        fan_in = x.shape[-1] * k * k
        return nn.Conv(
            self.features, (k, k), strides=(self.stride, self.stride), padding=pad,
            use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=lambda key, shape, dt: torch_bias_init(key, shape, dt, fan_in),
            conv_general_dilated=quant_conv_fn(self.quant),
        )(x)


class ConvTranspose(nn.Module):
    """Transposed conv matching torch ConvTranspose2d(k, stride=s, padding=p):
    out = (in-1)*s + k - 2p (used by DBPN/UNet/LapSRN up-projections)."""
    features: int
    kernel_size: int
    stride: int
    torch_padding: int = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.torch_padding
        pad = k - 1 - p
        fan_in = x.shape[-1] * k * k
        return nn.ConvTranspose(
            self.features, (k, k), strides=(s, s), padding=[(pad, pad), (pad, pad)],
            use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=lambda key, shape, dt: torch_bias_init(key, shape, dt, fan_in),
        )(x)


class PReLU(nn.Module):
    """torch-style PReLU; channelwise=True == nn.PReLU(nchannels)."""
    channelwise: bool = False
    init: float = 0.25
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = (x.shape[-1],) if self.channelwise else (1,)
        alpha = self.param("alpha", lambda k, s: jnp.full(s, self.init, jnp.float32), shape)
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class Scale(nn.Module):
    """Learnable scalar multiplier (reference ESRT blocks.Scale)."""
    init: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.param("scale", lambda k, sh: jnp.full(sh, self.init, jnp.float32), (1,))
        return x * s.astype(x.dtype)


class _TorchBNCore(nn.Module):
    """Torch-exact BatchNorm core (replaces flax nn.BatchNorm so training
    dynamics match torch BatchNorm2d bit-for-bit in f32):

    - normalization uses the BIASED batch variance (same as flax), but the
      running-var buffer update uses the UNBIASED variance ×n/(n-1) — flax's
      nn.BatchNorm updates with the biased one, a silent eval-time drift vs
      the reference (round-2 verdict item #4; torch _BatchNorm docs/impl)
    - running = (1-m)·running + m·batch with torch's momentum m directly.

    Param/stat names (scale/bias, mean/var) and the child name 'BatchNorm_0'
    match flax nn.BatchNorm, so checkpoints and torch_import/export trees are
    unchanged."""
    use_running_average: bool
    torch_momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (feat,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (feat,))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            w = _BN_SAMPLE_WEIGHT[-1]
            if w is None:
                mean = jnp.mean(xf, axes)
                var = jnp.mean(jnp.square(xf - mean), axes)
                n = x.size // feat
                bessel = n / max(n - 1, 1)
            else:
                # padding-aware statistics: zero-weight samples contribute
                # exact zeros to both sums; n counts only real elements
                wf = w.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
                per_sample = x.size // (feat * x.shape[0])
                n = jnp.sum(wf) * per_sample
                nsafe = jnp.maximum(n, 1.0)  # all-padding batch: no NaNs
                mean = jnp.sum(xf * wf, axes) / nsafe
                var = jnp.sum(jnp.square(xf - mean) * wf, axes) / nsafe
                bessel = nsafe / jnp.maximum(nsafe - 1.0, 1.0)
            if not self.is_initializing():
                m = self.torch_momentum
                if w is None:
                    keep = 1.0
                else:  # all-padding batch: leave the running stats untouched
                    keep = jnp.where(n > 0, 1.0, 0.0)
                ra_mean.value = ((1.0 - m * keep) * ra_mean.value
                                 + m * keep * mean)
                ra_var.value = ((1.0 - m * keep) * ra_var.value
                                + m * keep * var * bessel)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class BatchNorm(nn.Module):
    """BatchNorm with torch semantics (momentum AND the unbiased running-var
    update — see _TorchBNCore)."""
    use_running_average: bool
    torch_momentum: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _TorchBNCore(
            use_running_average=self.use_running_average,
            torch_momentum=self.torch_momentum, dtype=self.dtype,
            name="BatchNorm_0",
        )(x)


class CALayer(nn.Module):
    """Squeeze-excite channel attention (reference: sres/model/rcan/network.py:31).
    Global average pool → 1×1 bottleneck → sigmoid gate."""
    channels: int
    reduction: int = 16
    dtype: Optional[Dtype] = None
    pack: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, collect: bool = False):
        c1 = Conv(self.channels // self.reduction, 1, dtype=self.dtype,
                  pack=self.pack)
        c2 = Conv(self.channels, 1, dtype=self.dtype, pack=self.pack)
        if collect:
            # declare the same params; return the expanded 1×1 conv weights
            # for the scanned trunk (models/scan_trunk.py). x supplies the
            # packed channel count only.
            cpk = x.shape[-1]
            cah = (self.channels // self.reduction) * self.pack
            w1, b1 = c1(jnp.zeros((1, 1, 1, cpk), x.dtype), collect=True)
            w2, b2 = c2(jnp.zeros((1, 1, 1, cah), x.dtype), collect=True)
            return w1, b1, w2, b2
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = c1(y)
        y = nn.relu(y)
        y = c2(y)
        return x * jax.nn.sigmoid(y)


class RCAB(nn.Module):
    """Residual channel-attention block (reference: rcan/network.py:50)."""
    features: int
    kernel_size: int = 3
    reduction: int = 16
    dtype: Optional[Dtype] = None
    pack: int = 1
    quant: Optional[str] = None   # trunk 3x3 convs only; CA 1x1s stay full-prec

    @nn.compact
    def __call__(self, x: jnp.ndarray, collect: bool = False):
        c1 = Conv(self.features, self.kernel_size, dtype=self.dtype, pack=self.pack,
                  quant=self.quant)
        c2 = Conv(self.features, self.kernel_size, dtype=self.dtype, pack=self.pack,
                  quant=self.quant)
        ca = CALayer(self.features, self.reduction, dtype=self.dtype, pack=self.pack)
        if collect:
            w1, b1 = c1(x, collect=True)
            w2, b2 = c2(x, collect=True)
            return (jnp.stack([w1, w2]), jnp.stack([b1, b2])) + ca(x, collect=True)
        r = c1(x)
        r = nn.relu(r)
        r = c2(r)
        r = ca(r)
        return x + r


class ResidualGroup(nn.Module):
    """nblocks × RCAB + trailing conv + group skip (reference: rcan/network.py:67)."""
    features: int
    kernel_size: int
    reduction: int
    nblocks: int
    dtype: Optional[Dtype] = None
    pack: int = 1
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, collect: bool = False):
        if collect:
            # declare the identical param tree, return per-group stacked
            # weights for the scanned trunk (models/scan_trunk.py):
            # w (nblocks, 2, k, k, Cp, Cp), b (nblocks, 2, Cp), CA operands,
            # trailing conv wt/bt.
            ws, bs, cw1s, cb1s, cw2s, cb2s = [], [], [], [], [], []
            for _ in range(self.nblocks):
                w, b, cw1, cb1, cw2, cb2 = RCAB(
                    self.features, self.kernel_size, self.reduction,
                    dtype=self.dtype, pack=self.pack,
                    quant=self.quant)(x, collect=True)
                ws.append(w); bs.append(b); cw1s.append(cw1)
                cb1s.append(cb1); cw2s.append(cw2); cb2s.append(cb2)
            wt, bt = Conv(self.features, self.kernel_size, dtype=self.dtype,
                          pack=self.pack, quant=self.quant)(x, collect=True)
            return dict(w=jnp.stack(ws), b=jnp.stack(bs),
                        cw1=jnp.stack(cw1s), cb1=jnp.stack(cb1s),
                        cw2=jnp.stack(cw2s), cb2=jnp.stack(cb2s),
                        wt=wt, bt=bt)
        r = x
        for _ in range(self.nblocks):
            r = RCAB(self.features, self.kernel_size, self.reduction,
                     dtype=self.dtype, pack=self.pack, quant=self.quant)(r)
        r = Conv(self.features, self.kernel_size, dtype=self.dtype, pack=self.pack,
                 quant=self.quant)(r)
        return x + r


class ResBlock(nn.Module):
    """conv-relu-conv residual block ×res_scale (reference: common/residual.py:28)."""
    features: int
    kernel_size: int = 3
    use_bias: bool = True
    res_scale: float = 1.0
    dtype: Optional[Dtype] = None
    pack: int = 1
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, collect: bool = False):
        c1 = Conv(self.features, self.kernel_size, use_bias=self.use_bias,
                  dtype=self.dtype, pack=self.pack, quant=self.quant)
        c2 = Conv(self.features, self.kernel_size, use_bias=self.use_bias,
                  dtype=self.dtype, pack=self.pack, quant=self.quant)
        if collect:
            # declare the same params, return stacked block-diag weights for
            # the fused wino_resgroup kernel (EDSR winograd trunk)
            w1, b1 = c1(x, collect=True)
            w2, b2 = c2(x, collect=True)
            return jnp.stack([w1, w2]), jnp.stack([b1, b2])
        r = c1(x)
        r = nn.relu(r)
        r = c2(r)
        return x + r * self.res_scale


class BasicBlock(nn.Module):
    """conv [+BN] [+act] (reference: common/cnn.py:11)."""
    features: int
    kernel_size: int = 3
    use_bias: bool = False
    batch_norm: bool = True
    act: Optional[Callable] = nn.relu
    dtype: Optional[Dtype] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = Conv(self.features, self.kernel_size, use_bias=self.use_bias,
                 dtype=self.dtype, quant=self.quant)(x)
        if self.batch_norm:
            y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if self.act is not None:
            y = self.act(y)
        return y


class SPUpsample(nn.Module):
    """Sub-pixel upsampler: per ×2 (or ×3) stage a conv expands channels r²×
    followed by pixel-shuffle (reference: common/upsample.py:32 /
    rcan/blocks.py:58). The conv is the MXU-heavy op; the shuffle is a free
    layout transform under XLA."""
    scale: int
    features: int
    use_bias: bool = True
    act: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.scale
        if (s & (s - 1)) == 0:  # power of two: ×2 stages
            for _ in range(int(math.log2(s))):
                x = Conv(4 * self.features, 3, use_bias=self.use_bias, dtype=self.dtype)(x)
                x = pixel_shuffle(x, 2)
                x = self._act(x)
        elif s == 3:
            x = Conv(9 * self.features, 3, use_bias=self.use_bias, dtype=self.dtype)(x)
            x = pixel_shuffle(x, 3)
            x = self._act(x)
        else:
            raise NotImplementedError(f"SPUpsample scale {s}")
        return x

    def _act(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.act == "relu":
            return nn.relu(x)
        if self.act == "prelu":
            return PReLU(channelwise=True, dtype=self.dtype)(x)
        return x


class UpsampleStage(nn.Module):
    """'replicate' (conv + nearest-×s) or 'transpose' upsampling with PReLU
    (reference: common/upsample.py:5 — SRDN's upscaler)."""
    features: int
    scale: int
    method: str = "replicate"
    kernel_size: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.method == "replicate":
            y = Conv(self.features, self.kernel_size, dtype=self.dtype)(x)
            b, h, w, c = y.shape
            y = jnp.broadcast_to(y[:, :, None, :, None, :], (b, h, self.scale, w, self.scale, c))
            y = y.reshape(b, h * self.scale, w * self.scale, c)
        elif self.method == "transpose":
            y = ConvTranspose(self.features, self.kernel_size, self.scale, dtype=self.dtype)(x)
        else:
            raise ValueError(f"Unknown upsample method {self.method}")
        return PReLU(init=0.0, dtype=self.dtype)(y)


class BNResidual(nn.Module):
    """conv-BN-PReLU-conv-BN residual (reference: common/residual.py:5, SRDN)."""
    features: int
    kernel_size: int = 3
    momentum: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = Conv(self.features, self.kernel_size, dtype=self.dtype)(x)
        y = BatchNorm(not train, self.momentum, dtype=self.dtype)(y)
        y = PReLU(init=0.0, dtype=self.dtype)(y)
        y = Conv(self.features, self.kernel_size, dtype=self.dtype)(y)
        y = BatchNorm(not train, self.momentum, dtype=self.dtype)(y)
        return x + y


class DoubleConv(nn.Module):
    """(conv-BN-relu)×2 (reference: common/unet.py:7)."""
    features: int
    mid_features: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = self.mid_features or self.features
        x = Conv(mid, 3, use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm(not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = Conv(self.features, 3, use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm(not train, dtype=self.dtype)(x)
        return nn.relu(x)


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def nearest_up(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return y.reshape(b, h * scale, w * scale, c)
