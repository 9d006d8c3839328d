"""RCAN — residual channel-attention network, the flagship/north-star model
(reference: sres/model/rcan/network.py).

Structure: head conv → nlayers × ResidualGroup(nblocks × RCAB) → body conv →
global skip → pixel-shuffle upsampler ×scale → tail conv. Channel-attention
reduction comes from the ``cbottleneck`` hyperparameter (rcan/network.py:14
passes it as the RCAB ``reduction``).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import (Conv, ResidualGroup, SPUpsample, pack_tiles,
                                    unpack_tiles)
from sres_tpu.models.registry import resolve_parms


class RCAN(nn.Module):
    nchannels_in: int
    nchannels_out: int
    nfeatures: int
    nlayers: int            # residual groups
    nblocks: int            # RCABs per group
    cbottleneck: int        # channel-attention reduction
    kernel_size: int
    scale: int
    use_bias: bool = True
    fused: bool = False       # use the fused-RCAB Pallas kernel
    pervar_heads: bool = False  # separate output conv per target variable
    lane_pack: int = 1        # tiles packed per image in the trunk (PERF.md)
    quantization: Optional[str] = None  # 'int8': AQT trunk convs (opt-in,
    # changes numerics; head/tail/upsampler/CA stay full precision)
    winograd: Optional[int] = None  # 2|4: trunk convs via the Pallas
    # Winograd F(m,3) kernel on quad-plane activations (2.25x/4x fewer MACs;
    # ops/pallas/winograd_conv.py). Requires packed channels == 128 and
    # H,W divisible by m; silently falls back to the direct path otherwise.
    # Param tree is identical to the direct path (wino_blocks.py).
    winograd_bs: int = 0  # samples per kernel block; 0 = auto (largest
    # divisor of the packed batch ≤ 4, the measured optimum — PERF.md)
    scan_groups: bool = False  # lax.scan the trunk's identical residual
    # groups (and the RCABs inside them) with stacked params instead of
    # unrolling 410 convs into the HLO — same param tree (collect-mode
    # declaration), bit-identical outputs, ~80x smaller trunk HLO and
    # minutes off tunnel compiles (models/scan_trunk.py). Direct path only:
    # silently ignored under fused/winograd/quantization.
    remat_trunk: Optional[bool] = None  # checkpoint each residual group.
    # None = auto: ON for int8_full (its custom VJP stashes per-conv int8
    # activations — ~9 GB at batch 144 without remat, which blows HBM and
    # measured 297 t/s; group remat keeps only per-group inputs) and ON for
    # scan_groups (scan-with-grad stacks EVERY body intermediate on the
    # (nlayers, nblocks) axes — measured on-chip: 19.4 GB at batch 72,
    # OOM on a 16 GB v5e; group remat saves only the 10 stacked group
    # inputs ≈ 0.4 GB and recomputes inside the backward), OFF otherwise
    # (int8_fused uses native autodiff, XLA remats freely).
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        # all top-level convs carry explicit names: the winograd branch below
        # instantiates the body conv by name, which would otherwise shift
        # flax's auto-name counter and break checkpoint/torch-interop trees
        x = Conv(self.nfeatures, self.kernel_size, use_bias=self.use_bias,
                 dtype=d, name="Conv_0")(x)
        # lane packing: run the trunk on `lane_pack` tiles' channels at once
        # so 64-feature convs fill all 128 MXU lanes — numerically identical
        # (block-diagonal weights), same param tree. Pad an uneven batch.
        # The fused Pallas group kernel operates on packed activations only.
        # fused ALWAYS packs (param tree must not depend on batch size — init
        # runs at batch 1 and relies on the internal pad); plain lane_pack
        # shares the unpacked tree so it may downgrade for tiny batches
        pk = 2 if self.fused else (self.lane_pack if x.shape[0] >= self.lane_pack else 1)
        bpad = (-x.shape[0]) % pk
        if pk > 1 and bpad:
            x = jnp.concatenate([x, jnp.zeros((bpad,) + x.shape[1:], x.dtype)], 0)
        res = pack_tiles(x, pk) if pk > 1 else x
        h, w = res.shape[1], res.shape[2]
        wbs = self.winograd_bs or next(
            d for d in (4, 3, 2, 1) if res.shape[0] % d == 0)
        wino = self.winograd if (
            self.winograd and self.kernel_size == 3 and not self.fused
            and not self.quantization and pk * self.nfeatures == 128
            and h % self.winograd == 0 and w % self.winograd == 0
            and wbs > 0 and res.shape[0] % wbs == 0
        ) else None
        if self.winograd and not wino:
            import logging
            logging.getLogger("sres").info(
                "model.winograd=%s requested but unsupported for this trace "
                "(pack·nfeatures=%d, HxW=%dx%d, batch=%d, quant=%s) — using "
                "the direct conv path (identical results)", self.winograd,
                pk * self.nfeatures, h, w, res.shape[0], self.quantization)
        skip = res
        remat = (self.quantization == "int8_full" if self.remat_trunk is None
                 else bool(self.remat_trunk))
        group_cls = nn.remat(ResidualGroup) if remat else ResidualGroup
        if wino:
            from sres_tpu.models.wino_blocks import (WinoConv,
                                                     WinoResidualGroup)
            from sres_tpu.ops.winograd import from_quad, to_quad, wino_spec
            spec = wino_spec(wino, h, w)
            res = to_quad(res.astype(d) if d else res, spec)
            skip_q = res
            for i in range(self.nlayers):
                # whole-group chain kernels for BOTH train and eval: the
                # custom VJP (ops/pallas/wino_group_grad.py) remats the
                # group from a per-RCAB input stash, so per-conv kernels
                # are only the fallback building block (trailing conv)
                res = WinoResidualGroup(self.nfeatures, self.cbottleneck,
                                        self.nblocks, wino, (h, w), pk,
                                        wbs, chain=True, dtype=d,
                                        name=f"ResidualGroup_{i}")(res)
            res = WinoConv(self.nfeatures, pk, wino, (h, w), relu=False,
                           use_bias=self.use_bias, bs=wbs,
                           dtype=d, name="Conv_1")(res)
            res = from_quad(res + skip_q, spec).astype(skip.dtype)
        elif self.scan_groups and not self.fused and not self.quantization:
            from sres_tpu.models.scan_trunk import scan_trunk
            gps = [ResidualGroup(self.nfeatures, self.kernel_size,
                                 self.cbottleneck, self.nblocks, dtype=d,
                                 pack=pk, name=f"ResidualGroup_{i}")(
                                     res, collect=True)
                   for i in range(self.nlayers)]
            stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gps)
            # remat defaults ON here (see remat_trunk): without it the scan
            # saves every body intermediate stacked over (nlayers, nblocks)
            # — measured 19.4 GB at batch 72, an on-chip OOM.
            scan_remat = (True if self.remat_trunk is None
                          else bool(self.remat_trunk))
            res = scan_trunk(res, stacked, d, remat=scan_remat)
            res = Conv(self.nfeatures, self.kernel_size, use_bias=self.use_bias,
                       dtype=d, pack=pk, name="Conv_1")(res)
            res = res + skip
        else:
            if self.scan_groups:
                import logging
                logging.getLogger("sres").info(
                    "model.scan_groups requested but unsupported with "
                    "fused=%s quantization=%s — using the unrolled trunk "
                    "(identical results)", self.fused, self.quantization)
            for i in range(self.nlayers):
                if self.fused and pk == 2:
                    from sres_tpu.models.fused import FusedResidualGroup
                    res = FusedResidualGroup(self.nfeatures, self.cbottleneck,
                                             self.nblocks, dtype=d)(res)
                else:
                    # explicit name: nn.remat's auto-name is
                    # 'CheckpointResidualGroup_i', which would break checkpoint
                    # and torch-interop param trees
                    res = group_cls(self.nfeatures, self.kernel_size,
                                    self.cbottleneck, self.nblocks, dtype=d,
                                    pack=pk, quant=self.quantization,
                                    name=f"ResidualGroup_{i}")(res)
            res = Conv(self.nfeatures, self.kernel_size, use_bias=self.use_bias,
                       dtype=d, pack=pk, quant=self.quantization,
                       name="Conv_1")(res)
            res = res + skip
        if pk > 1:
            res = unpack_tiles(res, pk)
            if bpad:
                res = res[: res.shape[0] - bpad]
        y = SPUpsample(self.scale, self.nfeatures, dtype=d)(res)
        if self.pervar_heads:
            # shared trunk + independent per-variable reconstruction heads
            # (BASELINE config #3: multi-variable joint SR)
            heads = [Conv(1, self.kernel_size, use_bias=self.use_bias, dtype=d,
                          name=f"Conv_{2 + i}")(y)
                     for i in range(self.nchannels_out)]
            y = jnp.concatenate(heads, axis=-1)
        else:
            y = Conv(self.nchannels_out, self.kernel_size,
                     use_bias=self.use_bias, dtype=d, name="Conv_2")(y)
        return y.astype(jnp.float32)


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, dict(cbottleneck=2, nblocks=20, fused=False,
                                      pervar_heads=False, lane_pack=1,
                                      quantization=None, remat_trunk=None,
                                      winograd=None, winograd_bs=0,
                                      scan_groups=False),
                      nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    return RCAN(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeatures=p["nfeatures"], nlayers=p["nlayers"], nblocks=p["nblocks"],
        cbottleneck=p["cbottleneck"], kernel_size=p["kernel_size"],
        scale=p["scale"], use_bias=p["bias"], fused=bool(p["fused"]),
        pervar_heads=bool(p["pervar_heads"]), lane_pack=int(p["lane_pack"]),
        quantization=p["quantization"], remat_trunk=p["remat_trunk"],
        winograd=(int(p["winograd"]) if p["winograd"] else None),
        winograd_bs=int(p["winograd_bs"]),
        scan_groups=bool(p["scan_groups"]),
        dtype=dtype,
    )
