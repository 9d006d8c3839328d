"""Local smoke-train on the procedural synthetic dataset (no external data)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run without install;
# late insert so the interpreter's sitecustomize (axon TPU plugin
# registration) never resolves the repo's top-level config/ tree
from typing import Any, Dict, List
from sres_tpu.controller import WorkflowController

cname: str = "sres"
models: List[str] = ["edsr"]
ccustom: Dict[str, Any] = {"task.nepochs": 3, "model.nlayers": 4, "model.nfeatures": 32}

configuration = dict(
    task="synthetic-tiles-48",
    dataset="synthetic",
    pipeline="sres",
    platform="local",
)

if __name__ == "__main__":
    controller = WorkflowController(cname, configuration, interp_loss=True)
    controller.train(models, **ccustom)
