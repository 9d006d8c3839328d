"""Inverse interop: export flax-trained RCAN/EDSR weights as a torch-style
state dict the REFERENCE's networks load directly
(`/root/reference/sres/model/rcan/network.py`, `edsr/network.py`, loaded by
FModule.load_state_dict — tail-tolerant, so exact key coverage matters).

Round trip with util/torch_import.py is exact (tests/test_torch_import.py):
kernels go back from flax HWIO to torch OIHW.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _unwrap(node: Dict[str, Any]) -> Dict[str, Any]:
    """Conv modules nest as Conv_i/Conv_0/{kernel,bias} (flax wrapper)."""
    return node["Conv_0"] if "Conv_0" in node and "kernel" not in node else node


def _conv_out(tw: Dict[str, np.ndarray], name: str, node: Dict[str, Any]) -> None:
    node = _unwrap(node)
    tw[f"{name}.weight"] = np.asarray(node["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in node:
        tw[f"{name}.bias"] = np.asarray(node["bias"])


def export_rcan(params: Dict[str, Any], nlayers: int, nblocks: int,
                scale: int = 4) -> Dict[str, np.ndarray]:
    """flax RCAN params (unfused/unpacked tree) → reference rcan/network.py
    state dict. Inverse of torch_import.import_rcan."""
    tw: Dict[str, np.ndarray] = {}
    _conv_out(tw, "head.0", params["Conv_0"])
    for g in range(nlayers):
        group = params[f"ResidualGroup_{g}"]
        for b in range(nblocks):
            rcab = group[f"RCAB_{b}"]
            base = f"body.{g}.body.{b}"
            _conv_out(tw, f"{base}.body.0", rcab["Conv_0"])
            _conv_out(tw, f"{base}.body.2", rcab["Conv_1"])
            _conv_out(tw, f"{base}.body.3.conv_du.0", rcab["CALayer_0"]["Conv_0"])
            _conv_out(tw, f"{base}.body.3.conv_du.2", rcab["CALayer_0"]["Conv_1"])
        _conv_out(tw, f"body.{g}.body.{nblocks}", group["Conv_0"])
    _conv_out(tw, f"body.{nlayers}", params["Conv_1"])
    _export_upsampler(tw, params["SPUpsample_0"], scale)
    _conv_out(tw, "tail.1", params["Conv_2"])
    return tw


def export_edsr(params: Dict[str, Any], nlayers: int,
                scale: int = 4) -> Dict[str, np.ndarray]:
    """flax EDSR params → reference edsr/network.py state dict. Inverse of
    torch_import.import_edsr."""
    tw: Dict[str, np.ndarray] = {}
    _conv_out(tw, "head.0", params["Conv_0"])
    for i in range(nlayers):
        rb = params[f"ResBlock_{i}"]
        _conv_out(tw, f"body.{i}.body.0", rb["Conv_0"])
        _conv_out(tw, f"body.{i}.body.2", rb["Conv_1"])
    _conv_out(tw, f"body.{nlayers}", params["Conv_1"])
    _export_upsampler(tw, params["SPUpsample_0"], scale)
    _conv_out(tw, "tail.1", params["Conv_2"])
    return tw


def _export_upsampler(tw: Dict[str, np.ndarray], ups: Dict[str, Any],
                      scale: int) -> None:
    """Reference tail.0 is nn.Sequential(conv, PixelShuffle[, conv,
    PixelShuffle]) — conv indices 0, 2 for ×4 (import_rcan docstring)."""
    nstages = len([k for k in ups if k.startswith("Conv_")])
    assert scale in (2, 3, 4) and nstages >= 1
    for i in range(nstages):
        _conv_out(tw, f"tail.0.{2 * i}", ups[f"Conv_{i}"])


def save_torch_state(tw: Dict[str, np.ndarray], path: str) -> str:
    """Write a reference-loadable .pt checkpoint (requires torch)."""
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in tw.items()},
               path)
    return path


def export_vdsr(params: Dict[str, Any], nlayers: int) -> Dict[str, np.ndarray]:
    """flax VDSR params → reference vdsr/network.py state dict
    (body.{i}.0 conv stack; batch_norm=False path). Inverse of
    torch_import.import_vdsr."""
    tw: Dict[str, np.ndarray] = {}
    for i in range(nlayers):
        _conv_out(tw, f"body.{i}.0", params[f"BasicBlock_{i}"]["Conv_0"])
    return tw
