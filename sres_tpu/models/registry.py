"""Model factory: config-name → flax module (reference: sres/model/manager.py:93
dynamic import + sres/model/common/common.py:22 `init_parms` defaults merge).

Every architecture resolves its hyperparameters from ``cfg().model`` merged
over the shared ``COMMON_PARMS`` defaults, exactly like the reference's
FModule, then returns a flax module whose ``__call__(x, train=False)`` takes
an NHWC LR batch and returns either an HR tensor or a tuple of per-level HR
tensors (multiscale pyramid models: LapSRN/MSCNN).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp

COMMON_PARMS: Dict[str, Any] = dict(
    nchannels_in=1,
    nchannels_out=1,
    nfeatures=64,
    kernel_size=3,
    nlayers=16,
    downscale_factors=[2, 2],
    bias=True,
    batch_norm=False,
    res_scale=1.0,
    ups_mode="bicubic",
)


def resolve_parms(model_cfg: Mapping, extra_defaults: Optional[Dict[str, Any]] = None,
                  **overrides: Any) -> Dict[str, Any]:
    """Merge cfg().model over COMMON_PARMS (+ per-model defaults), mirroring
    the reference init_parms (common/common.py:22-28)."""
    parms = {k: model_cfg.get(k, v) for k, v in COMMON_PARMS.items()}
    for k, v in (extra_defaults or {}).items():
        parms[k] = model_cfg.get(k, v)
    parms.update(overrides)
    dsf = parms["downscale_factors"]
    parms["downscale_factors"] = list(dsf)
    parms["scale"] = math.prod(dsf)
    return parms


def _dtype_of(precision: str):
    return {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
            "f32": jnp.float32, "float32": jnp.float32}[precision]


def model_names():
    from sres_tpu.models import (dbpn, edsr, esrt, lapsrn, latticenet, mscnn,
                                 rcan, srdn, swinir, unet, vdsr)
    return {
        "rcan": rcan.build, "edsr": edsr.build, "vdsr": vdsr.build,
        "lapsrn": lapsrn.build, "mscnn": mscnn.build, "srdn": srdn.build,
        "unet": unet.build, "dbpn": dbpn.build, "latticenet": latticenet.build,
        "esrt": esrt.build, "swinir": swinir.build,
    }


def build_model(model_cfg: Mapping, nchannels_in: int, nchannels_out: int,
                precision: str = "bf16", temporal_features=None):
    """Reference SRModels.get_model equivalent (sres/model/manager.py:93-96):
    dispatch on cfg().model.name, passing task-derived channel counts."""
    name = model_cfg["name"]
    builders = model_names()
    if name not in builders:
        raise KeyError(f"Unknown model '{name}'; available: {sorted(builders)}")
    return builders[name](
        model_cfg, nchannels_in=nchannels_in, nchannels_out=nchannels_out,
        dtype=_dtype_of(precision), temporal_features=temporal_features,
    )
