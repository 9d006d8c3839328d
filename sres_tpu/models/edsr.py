"""EDSR — enhanced deep residual SR (reference: sres/model/edsr/network.py):
head conv → nlayers × ResBlock → body conv → global skip → sub-pixel tail."""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from sres_tpu.models.layers import (Conv, ResBlock, SPUpsample, pack_tiles,
                                    unpack_tiles)
from sres_tpu.models.registry import resolve_parms


class EDSR(nn.Module):
    nchannels_in: int
    nchannels_out: int
    nfeatures: int
    nlayers: int
    kernel_size: int
    scale: int
    res_scale: float = 1.0
    use_bias: bool = True
    lane_pack: int = 1        # tiles packed per image in the trunk (PERF.md)
    quantization: Optional[str] = None  # 'int8': AQT trunk convs (opt-in)
    winograd: Optional[int] = None  # 2|4: trunk ResBlocks via the fused
    # Winograd chain kernel (ops/pallas/wino_group_grad.py:wino_resgroup —
    # one pallas_call for the whole trunk, exact gradients); same gating
    # rules and unchanged param tree as RCAN's winograd mode
    winograd_bs: int = 0      # samples per kernel block; 0 = auto
    scan_groups: bool = False  # lax.scan the identical trunk ResBlocks with
    # stacked collect-mode params — same param tree, depth-invariant HLO
    # (models/scan_trunk.py:scan_resblocks); direct path only, ignored
    # under winograd/quantization
    remat_trunk: Optional[bool] = None  # checkpoint each scanned ResBlock
    # body. None = ON under scan_groups (same rationale as RCAN: scan-with-
    # grad stacks every body intermediate over nlayers; remat keeps only the
    # stacked block inputs). Ignored on the unrolled path.
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        x = Conv(self.nfeatures, self.kernel_size, use_bias=self.use_bias,
                 dtype=d, name="Conv_0")(x)
        pk = self.lane_pack if x.shape[0] >= self.lane_pack else 1
        bpad = (-x.shape[0]) % pk
        if pk > 1 and bpad:
            x = jnp.concatenate([x, jnp.zeros((bpad,) + x.shape[1:], x.dtype)], 0)
        res = pack_tiles(x, pk) if pk > 1 else x
        h, w = res.shape[1], res.shape[2]
        wbs = self.winograd_bs or next(
            dd for dd in (4, 3, 2, 1) if res.shape[0] % dd == 0)
        wino = self.winograd if (
            self.winograd and self.kernel_size == 3 and not self.quantization
            and pk * self.nfeatures == 128 and h % self.winograd == 0
            and w % self.winograd == 0 and res.shape[0] % wbs == 0
        ) else None
        if self.winograd and not wino:
            import logging
            logging.getLogger("sres").info(
                "model.winograd=%s requested but unsupported for this trace "
                "(pack·nfeatures=%d, HxW=%dx%d, batch=%d, quant=%s) — using "
                "the direct conv path (identical results)", self.winograd,
                pk * self.nfeatures, h, w, res.shape[0], self.quantization)
        skip = res
        if wino:
            from sres_tpu.models.wino_blocks import WinoConv
            from sres_tpu.ops.pallas.wino_group_grad import wino_resgroup_trail
            from sres_tpu.ops.winograd import from_quad, to_quad, wino_spec
            spec = wino_spec(wino, h, w)
            ws, bv = [], []
            for i in range(self.nlayers):
                wpair, bpair = ResBlock(self.nfeatures, self.kernel_size,
                                        self.use_bias, self.res_scale,
                                        dtype=d, pack=pk,
                                        name=f"ResBlock_{i}")(res, collect=True)
                ws.append(wpair); bv.append(bpair)
            # trailing conv + global trunk skip fold into the chain kernel
            wt, bt = WinoConv(self.nfeatures, pk, wino, (h, w), relu=False,
                              use_bias=self.use_bias, bs=wbs, dtype=d,
                              name="Conv_1")(res, collect=True)
            resq = to_quad(res.astype(d) if d else res, spec)
            r = wino_resgroup_trail(resq, jnp.stack(ws), jnp.stack(bv),
                                    wt, bt, wino, (h, w), wbs,
                                    float(self.res_scale))
            res = from_quad(r, spec).astype(skip.dtype)
        elif self.scan_groups and not self.quantization:
            import jax as _jax
            from sres_tpu.models.scan_trunk import scan_resblocks
            pairs = [ResBlock(self.nfeatures, self.kernel_size, self.use_bias,
                              self.res_scale, dtype=d, pack=pk,
                              name=f"ResBlock_{i}")(res, collect=True)
                     for i in range(self.nlayers)]
            sw, sb = (_jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pairs))
            scan_remat = (True if self.remat_trunk is None
                          else bool(self.remat_trunk))
            res = scan_resblocks(res, sw, sb, float(self.res_scale), d,
                                 remat=scan_remat)
            res = Conv(self.nfeatures, self.kernel_size, use_bias=self.use_bias,
                       dtype=d, pack=pk, name="Conv_1")(res)
            res = res + skip
        else:
            if self.scan_groups:
                import logging
                logging.getLogger("sres").info(
                    "model.scan_groups requested but unsupported with "
                    "quantization=%s — using the unrolled trunk (identical "
                    "results)", self.quantization)
            for i in range(self.nlayers):
                res = ResBlock(self.nfeatures, self.kernel_size, self.use_bias,
                               self.res_scale, dtype=d, pack=pk,
                               quant=self.quantization,
                               name=f"ResBlock_{i}")(res)
            res = Conv(self.nfeatures, self.kernel_size, use_bias=self.use_bias,
                       dtype=d, pack=pk, quant=self.quantization,
                       name="Conv_1")(res)
            res = res + skip
        if pk > 1:
            res = unpack_tiles(res, pk)
            if bpad:
                res = res[: res.shape[0] - bpad]
        y = SPUpsample(self.scale, self.nfeatures, dtype=d)(res)
        y = Conv(self.nchannels_out, self.kernel_size, use_bias=self.use_bias,
                 dtype=d, name="Conv_2")(y)
        return y.astype(jnp.float32)


def build(model_cfg, nchannels_in: int, nchannels_out: int, dtype=None, temporal_features=None):
    p = resolve_parms(model_cfg, dict(lane_pack=1, quantization=None,
                                      winograd=None, winograd_bs=0,
                                      scan_groups=False, remat_trunk=None),
                      nchannels_in=nchannels_in, nchannels_out=nchannels_out)
    return EDSR(
        nchannels_in=p["nchannels_in"], nchannels_out=p["nchannels_out"],
        nfeatures=p["nfeatures"], nlayers=p["nlayers"], kernel_size=p["kernel_size"],
        scale=p["scale"], res_scale=p["res_scale"], use_bias=p["bias"],
        lane_pack=int(p["lane_pack"]), quantization=p["quantization"],
        winograd=(int(p["winograd"]) if p["winograd"] else None),
        winograd_bs=int(p["winograd_bs"]),
        scan_groups=bool(p["scan_groups"]), remat_trunk=p["remat_trunk"],
        dtype=dtype,
    )
