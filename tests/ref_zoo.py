"""Load the reference's own torch network modules for golden parity tests.

The reference's model code (`/root/reference/sres/model/*/network.py`) only
touches the rest of its stack through ``cfg().model.get`` (common/common.py:23)
and the ``lgm`` logger, so we stub exactly those two modules (hydra/omegaconf/
xarray are not installed here) and import the *real, unmodified* reference
networks. Each parity test then asserts our flax forward == the reference's
torch forward on identical weights — the strongest obtainable proof of
PSNR/RMSE parity without mounted SWOT data.

NOTE: the reference tree is UNTRUSTED third-party content — we execute only
its nn.Module definitions under torch CPU, never its scripts.
"""
from __future__ import annotations

import importlib
import sys
import types

import pytest

REF_ROOT = "/root/reference"

_MODEL_CFG: dict = {}


def _install_stubs() -> None:
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")

        class DictConfig(dict):
            pass

        om.DictConfig = DictConfig
        om.OmegaConf = type("OmegaConf", (), {})
        sys.modules["omegaconf"] = om

    if "sres.base.util.logging" not in sys.modules:
        lg = types.ModuleType("sres.base.util.logging")

        class _Lgm:
            def __getattr__(self, _name):
                return lambda *a, **k: None

        lg.lgm = lambda: _Lgm()
        lg.exception_handled = lambda f: f
        lg.log_timing = lambda f: f
        sys.modules["sres.base.util.logging"] = lg

    if "sres.base.util.config" not in sys.modules:
        cfgmod = types.ModuleType("sres.base.util.config")

        class _Cfg:
            model = _MODEL_CFG

        cfgmod.cfg = lambda: _Cfg
        sys.modules["sres.base.util.config"] = cfgmod


def have_reference() -> bool:
    import os
    return os.path.isdir(f"{REF_ROOT}/sres/model")


requires_reference = pytest.mark.skipif(
    not have_reference(), reason="reference tree not mounted")


def get_ref_model(name: str, model_cfg: dict, nchannels_in: int = 1,
                  nchannels_out: int = 1, seed: int = 0,
                  single_thread: bool = True, **extra):
    """Instantiate ``sres.model.{name}.network.get_model`` from the reference
    tree on CPU with ``model_cfg`` standing in for cfg().model. Seeded: the
    weight draw must not depend on how many tests ran before (marginal f32
    tolerances flipped with test order when init used the ambient RNG).
    single_thread=True pins torch to one thread: oneDNN's multithreaded
    reductions change summation order with thread/allocator state, which
    made the parity tests' f32 drift vary across pytest invocations
    (observed on esrt/mscnn). The baseline A/B benchmark passes False —
    throughput there wants all cores."""
    import torch
    torch.manual_seed(seed)
    if single_thread:
        torch.set_num_threads(1)
    _install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _MODEL_CFG.clear()
    _MODEL_CFG.update(model_cfg)
    net = importlib.import_module(f"sres.model.{name}.network")
    model = net.get_model(nchannels_in=nchannels_in, nchannels_out=nchannels_out,
                          device=torch.device("cpu"), **extra)
    return model.eval()
