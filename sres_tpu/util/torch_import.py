"""Import reference (PyTorch) checkpoints into the flax model zoo.

The reference saves ``{training_version}.{train|valid}.pt`` torch checkpoints
(reference: sres/controller/checkpoints.py:20). This module converts their
``model_state_dict`` tensors into our flax parameter pytrees so RCAN/EDSR
models trained by the reference can be served/eval'd here directly — the
basis for f32-tolerance PSNR/RMSE comparison on real SWOT data.

Layout conversion: torch Conv2d weights are (Cout, Cin, kh, kw) → flax
(kh, kw, Cin, Cout).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """torch.load a reference checkpoint → {name: np.ndarray} of the model
    state dict (handles both raw state dicts and the reference's checkpoint
    wrapper with 'model_state_dict')."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def _conv(tw: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    out = {"kernel": tw[f"{name}.weight"].transpose(2, 3, 1, 0)}
    if f"{name}.bias" in tw:
        out["bias"] = tw[f"{name}.bias"]
    return out


def import_rcan(torch_state: Dict[str, np.ndarray], nlayers: int, nblocks: int
                ) -> Dict[str, Any]:
    """Reference RCAN state dict → flax params for models/rcan.py RCAN
    (unfused path). Reference module names (rcan/network.py):
    head.0, body.{g}.body.{b}.body.{0,2} convs + .body.3.conv_du.{0,2} CA,
    body.{g}.body.{nblocks} group conv, body.{nlayers} trailing conv,
    tail.0.0 / (tail.0.2 for ×4) upsampler convs, tail.1 output conv."""
    tw = torch_state
    params: Dict[str, Any] = {"Conv_0": {"Conv_0": _conv(tw, "head.0")}}
    for g in range(nlayers):
        group: Dict[str, Any] = {}
        for b in range(nblocks):
            base = f"body.{g}.body.{b}"
            group[f"RCAB_{b}"] = {
                "Conv_0": {"Conv_0": _conv(tw, f"{base}.body.0")},
                "Conv_1": {"Conv_0": _conv(tw, f"{base}.body.2")},
                "CALayer_0": {
                    "Conv_0": {"Conv_0": _conv(tw, f"{base}.body.3.conv_du.0")},
                    "Conv_1": {"Conv_0": _conv(tw, f"{base}.body.3.conv_du.2")},
                },
            }
        group["Conv_0"] = {"Conv_0": _conv(tw, f"body.{g}.body.{nblocks}")}
        params[f"ResidualGroup_{g}"] = group
    params["Conv_1"] = {"Conv_0": _conv(tw, f"body.{nlayers}")}
    # ×4 upsampler: two PixelShuffle conv stages at tail.0.0 / tail.0.2
    ups: Dict[str, Any] = {}
    stage_names = [k for k in tw if k.startswith("tail.0.") and k.endswith(".weight")]
    for i, key in enumerate(sorted(stage_names, key=lambda s: int(s.split(".")[2]))):
        ups[f"Conv_{i}"] = {"Conv_0": _conv(tw, key[: -len(".weight")])}
    params["SPUpsample_0"] = ups
    params["Conv_2"] = {"Conv_0": _conv(tw, "tail.1")}
    return params


def import_edsr(torch_state: Dict[str, np.ndarray], nlayers: int) -> Dict[str, Any]:
    """Reference EDSR state dict → flax params for models/edsr.py
    (edsr/network.py: head.0, body.{i}.body.{0,2} ResBlock convs,
    body.{nlayers} trailing conv, tail.0.* upsampler, tail.1 output)."""
    tw = torch_state
    params: Dict[str, Any] = {"Conv_0": {"Conv_0": _conv(tw, "head.0")}}
    for i in range(nlayers):
        params[f"ResBlock_{i}"] = {
            "Conv_0": {"Conv_0": _conv(tw, f"body.{i}.body.0")},
            "Conv_1": {"Conv_0": _conv(tw, f"body.{i}.body.2")},
        }
    params["Conv_1"] = {"Conv_0": _conv(tw, f"body.{nlayers}")}
    ups: Dict[str, Any] = {}
    stage_names = [k for k in tw if k.startswith("tail.0.") and k.endswith(".weight")]
    for i, key in enumerate(sorted(stage_names, key=lambda s: int(s.split(".")[2]))):
        ups[f"Conv_{i}"] = {"Conv_0": _conv(tw, key[: -len(".weight")])}
    params["SPUpsample_0"] = ups
    params["Conv_2"] = {"Conv_0": _conv(tw, "tail.1")}
    return params


# --------------------------------------------------------------------------
# generic leaf converters (torch layout → flax layout)
# --------------------------------------------------------------------------

def _convT(tw: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    """torch ConvTranspose2d (Cin, Cout, kh, kw) → flax ConvTranspose kernel
    (kh, kw, Cin, Cout) with the spatial flip (lax.conv_transpose applies the
    kernel unmirrored; torch's op is the mirrored gradient-of-conv)."""
    w = tw[f"{name}.weight"]
    out = {"kernel": np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))}
    if f"{name}.bias" in tw:
        out["bias"] = tw[f"{name}.bias"]
    return out


def _dense(tw: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    out = {"kernel": tw[f"{name}.weight"].T}
    if f"{name}.bias" in tw:
        out["bias"] = tw[f"{name}.bias"]
    return out


def _bn(tw: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    return {"BatchNorm_0": {"scale": tw[f"{name}.weight"], "bias": tw[f"{name}.bias"]}}


def _bn_stats(tw: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    return {"BatchNorm_0": {"mean": tw[f"{name}.running_mean"],
                            "var": tw[f"{name}.running_var"]}}


def _prelu(tw: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    return {"alpha": tw[f"{name}.weight"]}


def _lscale(tw: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    return {"scale": tw[f"{name}.scale"]}


def _ln(tw: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    return {"scale": tw[f"{name}.weight"], "bias": tw[f"{name}.bias"]}


def _wrap(d: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Our layers.Conv/ConvTranspose nest the flax core module one level down."""
    return {"Conv_0": d}


def _wrapT(d: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return {"ConvTranspose_0": d}


def _double_conv(tw, base) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torch DoubleConv {base}.double_conv.{0,1,3,4} → (params, batch_stats)
    for our layers.DoubleConv (common/unet.py:7)."""
    params = {
        "Conv_0": _wrap(_conv(tw, f"{base}.double_conv.0")),
        "BatchNorm_0": _bn(tw, f"{base}.double_conv.1"),
        "Conv_1": _wrap(_conv(tw, f"{base}.double_conv.3")),
        "BatchNorm_1": _bn(tw, f"{base}.double_conv.4"),
    }
    stats = {
        "BatchNorm_0": _bn_stats(tw, f"{base}.double_conv.1"),
        "BatchNorm_1": _bn_stats(tw, f"{base}.double_conv.4"),
    }
    return params, stats


def _spupsample(tw, base: str, scale: int) -> Dict[str, Any]:
    """torch SPUpsample/Upsampler Sequential {base}.{0,2,...} conv stages →
    our SPUpsample Conv_{i} (common/upsample.py:32)."""
    out: Dict[str, Any] = {}
    nstages = 1 if scale in (2, 3) else int(np.log2(scale))
    for i in range(nstages):
        out[f"Conv_{i}"] = _wrap(_conv(tw, f"{base}.{2 * i}"))
    return out


def _calayer(tw, base) -> Dict[str, Any]:
    return {"Conv_0": _wrap(_conv(tw, f"{base}.conv_du.0")),
            "Conv_1": _wrap(_conv(tw, f"{base}.conv_du.2"))}


# --------------------------------------------------------------------------
# per-architecture importers (reference: sres/model/<name>/network.py)
# --------------------------------------------------------------------------

def import_vdsr(tw, nlayers: int) -> Dict[str, Any]:
    """vdsr/network.py: body.{i}.0 conv stack (batch_norm=False path)."""
    params = {}
    for i in range(nlayers):
        params[f"BasicBlock_{i}"] = {"Conv_0": _wrap(_conv(tw, f"body.{i}.0"))}
    return {"params": params}


def import_lapsrn(tw, nstages: int) -> Dict[str, Any]:
    """lapsrn/network.py: inc DoubleConv, per-stage ConvDownscale (transposed
    conv + DoubleConv) and 1×1 crossscale convs."""
    inc_p, inc_s = _double_conv(tw, "inc")
    params: Dict[str, Any] = {"DoubleConv_0": inc_p}
    stats: Dict[str, Any] = {"DoubleConv_0": inc_s}
    for i in range(nstages):
        dc_p, dc_s = _double_conv(tw, f"downscale.{i}.downscale.1")
        params[f"ConvUpStage_{i}"] = {
            "ConvTranspose_0": _wrapT(_convT(tw, f"downscale.{i}.downscale.0")),
            "DoubleConv_0": dc_p,
        }
        stats[f"ConvUpStage_{i}"] = {"DoubleConv_0": dc_s}
        params[f"Conv_{i}"] = _wrap(_conv(tw, f"crossscale.{i}.conv"))
    return {"params": params, "batch_stats": stats}


def _unet_core(tw, base: str, depth: int) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """common/unet.py UNet / unet/network.py UNet → our UNetCore."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for il in range(depth):
        p, s = _double_conv(tw, f"{base}.downscale.{il}.maxpool_conv.1")
        params[f"DoubleConv_{il}"] = p
        stats[f"DoubleConv_{il}"] = s
    for il in range(depth):
        params[f"ConvTranspose_{il}"] = _wrapT(_convT(tw, f"{base}.upscale.{il}.up"))
        p, s = _double_conv(tw, f"{base}.upscale.{il}.conv")
        params[f"DoubleConv_{depth + il}"] = p
        stats[f"DoubleConv_{depth + il}"] = s
    return params, stats


def import_mscnn(tw, nstages: int, unet_depth: int) -> Dict[str, Any]:
    """mscnn/network.py: lapsrn pyramid + optional UNet feature stage."""
    out = import_lapsrn(tw, nstages)
    if unet_depth > 0:
        p, s = _unet_core(tw, "unet", unet_depth)
        out["params"]["UNetCore_0"] = p
        out["batch_stats"]["UNetCore_0"] = s
    return out


def import_unet(tw, depth: int, nups: int) -> Dict[str, Any]:
    """unet/network.py UNetSR: workflow.{0:stem,1:core,2:ups,3:out}."""
    stem_p, stem_s = _double_conv(tw, "workflow.0")
    core_p, core_s = _unet_core(tw, "workflow.1", depth)
    params: Dict[str, Any] = {"DoubleConv_0": stem_p, "UNetCore_0": core_p}
    stats: Dict[str, Any] = {"DoubleConv_0": stem_s, "UNetCore_0": core_s}
    for i in range(nups):
        params[f"ConvTranspose_{i}"] = _wrapT(_convT(tw, f"workflow.2.ups{i}.up"))
        p, s = _double_conv(tw, f"workflow.2.ups{i}.conv")
        params[f"DoubleConv_{i + 1}"] = p
        stats[f"DoubleConv_{i + 1}"] = s
    params["Conv_0"] = _wrap(_conv(tw, "workflow.3.conv"))
    return {"params": params, "batch_stats": stats}


def import_dbpn(tw, depth: int) -> Dict[str, Any]:
    """dbpn/network.py: initial convs + interleaved up/down DenseProjections
    (order up0, down0, up1, down1, ..., up_last)."""
    def proj(base: str, transposed: bool) -> Dict[str, Any]:
        inner = _convT(tw, f"{base}.0") if transposed else _conv(tw, f"{base}.0")
        key = "ConvTranspose_0" if transposed else "Conv_0"
        return {key: {key: inner}, "PReLU_0": _prelu(tw, f"{base}.1")}

    def dense_projection(base: str, up: bool, bottleneck: bool) -> Dict[str, Any]:
        d: Dict[str, Any] = {}
        if bottleneck:
            d["Conv_0"] = _wrap(_conv(tw, f"{base}.bottleneck.0"))
            d["PReLU_0"] = _prelu(tw, f"{base}.bottleneck.1")
        d["_Proj_0"] = proj(f"{base}.conv_1", up)
        d["_Proj_1"] = proj(f"{base}.conv_2", not up)
        d["_Proj_2"] = proj(f"{base}.conv_3", up)
        return d

    params: Dict[str, Any] = {
        "Conv_0": _wrap(_conv(tw, "initial.0")),
        "PReLU_0": _prelu(tw, "initial.1"),
        "Conv_1": _wrap(_conv(tw, "initial.2")),
        "PReLU_1": _prelu(tw, "initial.3"),
        "Conv_2": _wrap(_conv(tw, "reconstruction.0")),
    }
    idx = 0
    for i in range(depth - 1):
        params[f"DenseProjection_{idx}"] = dense_projection(f"upmodules.{i}", True, i > 1)
        idx += 1
        params[f"DenseProjection_{idx}"] = dense_projection(f"downmodules.{i}", False, i != 0)
        idx += 1
    params[f"DenseProjection_{idx}"] = dense_projection(
        f"upmodules.{depth - 1}", True, depth - 1 > 1)
    return {"params": params}


def import_latticenet(tw) -> Dict[str, Any]:
    """latticenet/network.py: stem convs, 4 LatticeBlocks, 6 TDM 1×1 convs,
    tail convs (always 4 body units in the reference)."""
    def cc(base: str) -> Dict[str, Any]:
        return {"Conv_0": _wrap(_conv(tw, f"{base}.conv_mean.0")),
                "Conv_1": _wrap(_conv(tw, f"{base}.conv_mean.2")),
                "Conv_2": _wrap(_conv(tw, f"{base}.conv_std.0")),
                "Conv_3": _wrap(_conv(tw, f"{base}.conv_std.2"))}

    def conv_block3(base: str) -> Dict[str, Any]:
        return {f"Conv_{j}": _wrap(_conv(tw, f"{base}.{2 * j}")) for j in range(3)}

    params: Dict[str, Any] = {
        "Conv_0": _wrap(_conv(tw, "conv1")),
        "Conv_1": _wrap(_conv(tw, "conv2")),
        "Conv_2": _wrap(_conv(tw, "tail.0")),
        "Conv_3": _wrap(_conv(tw, "tail.1")),
    }
    for b in range(4):
        base = f"body_unit{b + 1}"
        params[f"LatticeBlock_{b}"] = {
            "_ConvBlock3_0": conv_block3(f"{base}.conv_block0"),
            "CC_0": cc(f"{base}.fea_ca1"),
            "CC_1": cc(f"{base}.x_ca1"),
            "_ConvBlock3_1": conv_block3(f"{base}.conv_block1"),
            "CC_2": cc(f"{base}.fea_ca2"),
            "CC_3": cc(f"{base}.x_ca2"),
            "Conv_0": _wrap(_conv(tw, f"{base}.compress")),
        }
    # T_tdm1, L_tdm1, T_tdm2, L_tdm2, T_tdm3, L_tdm3 in call order
    for i, tname in enumerate(["T_tdm1", "L_tdm1", "T_tdm2", "L_tdm2", "T_tdm3", "L_tdm3"]):
        params[f"_TDM_{i}"] = {"Conv_0": _wrap(_conv(tw, f"{tname}.0"))}
    return {"params": params}


def import_srdn(tw, nlayers: int, nups: int) -> Dict[str, Any]:
    """srdn/network.py: stem, BN residuals, BN global residual, 'replicate'
    upsampling stages, output conv."""
    params: Dict[str, Any] = {
        "Conv_0": _wrap(_conv(tw, "features.0")),
        "PReLU_0": _prelu(tw, "features.1"),
        "Conv_1": _wrap(_conv(tw, "global_residual.0")),
        "BatchNorm_0": _bn(tw, "global_residual.1"),
        "Conv_2": _wrap(_conv(tw, "result")),
    }
    stats: Dict[str, Any] = {"BatchNorm_0": _bn_stats(tw, "global_residual.1")}
    for i in range(nlayers):
        base = f"residuals.Residual-{i}.rnet"
        params[f"BNResidual_{i}"] = {
            "Conv_0": _wrap(_conv(tw, f"{base}.0")),
            "BatchNorm_0": _bn(tw, f"{base}.1"),
            "PReLU_0": _prelu(tw, f"{base}.2"),
            "Conv_1": _wrap(_conv(tw, f"{base}.3")),
            "BatchNorm_1": _bn(tw, f"{base}.4"),
        }
        stats[f"BNResidual_{i}"] = {
            "BatchNorm_0": _bn_stats(tw, f"{base}.1"),
            "BatchNorm_1": _bn_stats(tw, f"{base}.4"),
        }
    for i in range(nups):
        params[f"UpsampleStage_{i}"] = {
            "Conv_0": _wrap(_conv(tw, f"upscaling.{i}.usnet.0")),
            "PReLU_0": _prelu(tw, f"upscaling.{i}.usnet.2"),
        }
    return {"params": params, "batch_stats": stats}


def import_esrt(tw, nlayers: int, scale: int) -> Dict[str, Any]:
    """esrt/network.py + common/transformer.py. NOTE: the reference defines
    weight-norm lambdas (network.py:66,84, common/common.py:37) but never
    applies them — its convs are plain, and this import (validated by the
    golden forward-parity test) proves plain convs match."""
    def one_conv(base: str) -> Dict[str, Any]:
        return {
            "Conv_0": _wrap(_conv(tw, f"{base}.conv")),
            "PReLU_0": _prelu(tw, f"{base}.relu"),
            "Conv_1": _wrap(_conv(tw, f"{base}.conv1")),
            "Scale_0": _lscale(tw, f"{base}.weight1"),
            "Scale_1": _lscale(tw, f"{base}.weight2"),
        }

    def one_module(base: str) -> Dict[str, Any]:
        return {
            "OneConv_0": one_conv(f"{base}.layer1"),
            "OneConv_1": one_conv(f"{base}.layer2"),
            "Scale_0": _lscale(tw, f"{base}.weight2"),
            "Scale_1": _lscale(tw, f"{base}.weight3"),
            "Conv_0": _wrap(_conv(tw, f"{base}.alise.conv")),
            "CALayer_0": _calayer(tw, f"{base}.atten"),
            "Conv_1": _wrap(_conv(tw, f"{base}.layer4.conv")),
            "Scale_2": _lscale(tw, f"{base}.weight4"),
            "Scale_3": _lscale(tw, f"{base}.weight5"),
        }

    def updown(base: str) -> Dict[str, Any]:
        return {
            "OneModule_0": one_module(f"{base}.encoder"),
            "OneModule_1": one_module(f"{base}.decoder_low"),
            "OneModule_2": one_module(f"{base}.decoder_high"),
            "OneModule_3": one_module(f"{base}.alise"),
            "Conv_0": _wrap(_conv(tw, f"{base}.alise2.conv")),
            "CALayer_0": _calayer(tw, f"{base}.att"),
        }

    def mla(base: str) -> Dict[str, Any]:
        return {
            "LayerNorm_0": _ln(tw, f"{base}.norm1"),
            "EffAttention_0": {
                "Dense_0": _dense(tw, f"{base}.atten.reduce"),
                "Dense_1": _dense(tw, f"{base}.atten.qkv"),
                "Dense_2": _dense(tw, f"{base}.atten.proj"),
            },
            "LayerNorm_1": _ln(tw, f"{base}.norm2"),
            "Dense_0": _dense(tw, f"{base}.mlp.fc1"),
            "Dense_1": _dense(tw, f"{base}.mlp.fc2"),
        }

    params: Dict[str, Any] = {"Conv_0": _wrap(_conv(tw, "head.0"))}
    for i in range(nlayers):
        base = f"body.{i}"
        params[f"Un_{i}"] = {
            "Updownblock_0": updown(f"{base}.encoder1"),
            "Updownblock_1": updown(f"{base}.encoder2"),
            "Updownblock_2": updown(f"{base}.encoder3"),
            "Conv_0": _wrap(_conv(tw, f"{base}.reduce")),
            "MLABlock_0": mla(f"{base}.attention"),
            "Conv_1": _wrap(_conv(tw, f"{base}.alise")),
            "Scale_0": _lscale(tw, f"{base}.weight1"),
            "Scale_1": _lscale(tw, f"{base}.weight2"),
        }
    params["Conv_1"] = _wrap(_conv(tw, "reduce"))
    params["SPUpsample_0"] = _spupsample(tw, "tail.0", scale)
    params["Conv_2"] = _wrap(_conv(tw, "tail.1"))
    params["SPUpsample_1"] = _spupsample(tw, "up.0", scale)
    params["Conv_3"] = _wrap(_conv(tw, "up.1.conv"))
    return {"params": params}


def import_variables(name: str, torch_state: Dict[str, np.ndarray], model_cfg) -> Dict[str, Any]:
    """Reference torch state dict → flax variables ({'params': ..,
    ['batch_stats': ..]}) for every active reference architecture."""
    tw = torch_state
    mc = model_cfg
    nups = len(list(mc.get("downscale_factors", [2, 2])))
    scale = int(np.prod(list(mc.get("downscale_factors", [2, 2]))))
    if name == "rcan":
        return {"params": import_rcan(tw, mc["nlayers"], mc["nblocks"])}
    if name == "edsr":
        return {"params": import_edsr(tw, mc["nlayers"])}
    if name == "vdsr":
        return import_vdsr(tw, mc["nlayers"])
    if name == "lapsrn":
        return import_lapsrn(tw, nups)
    if name == "mscnn":
        return import_mscnn(tw, nups, mc.get("nlayers", 0))
    if name == "unet":
        return import_unet(tw, mc["nlayers"], nups)
    if name == "dbpn":
        return import_dbpn(tw, mc.get("depth", 2))
    if name == "latticenet":
        return import_latticenet(tw)
    if name == "srdn":
        return import_srdn(tw, mc["nlayers"], nups)
    if name == "esrt":
        return import_esrt(tw, mc["nlayers"], scale)
    raise NotImplementedError(f"torch import not implemented for '{name}'")


def import_model(name: str, torch_state: Dict[str, np.ndarray], model_cfg) -> Dict[str, Any]:
    """Legacy entry: params tree only (checkpoint import path)."""
    return import_variables(name, torch_state, model_cfg)["params"]
