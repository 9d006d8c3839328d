"""Import reference (PyTorch) checkpoints into the flax model zoo.

The reference saves ``{training_version}.{train|valid}.pt`` torch checkpoints
(reference: sres/controller/checkpoints.py:20). This module converts their
``model_state_dict`` tensors into our flax parameter pytrees so RCAN/EDSR
models trained by the reference can be served/eval'd here directly — the
basis for bitwise PSNR/RMSE comparison on real SWOT data.

Layout conversion: torch Conv2d weights are (Cout, Cin, kh, kw) → flax
(kh, kw, Cin, Cout).
"""
from __future__ import annotations

from typing import Any, Dict

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


def import_model(name: str, torch_state: Dict[str, np.ndarray], model_cfg) -> Dict[str, Any]:
    """Dispatch by model name (RCAN/EDSR supported so far)."""
    if name == "rcan":
        return import_rcan(torch_state, model_cfg["nlayers"], model_cfg["nblocks"])
    if name == "edsr":
        return import_edsr(torch_state, model_cfg["nlayers"])
    raise NotImplementedError(f"torch import not implemented for '{name}'")
