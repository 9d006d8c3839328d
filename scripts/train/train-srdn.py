"""srdn on cape_basin_1x1 / LLC4320 (reference: scripts/train/train-srdn.py)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run without install;
# late insert so the interpreter's sitecustomize (axon TPU plugin
# registration) never resolves the repo's top-level config/ tree
from typing import Any, Dict, List
from sres_tpu.controller import WorkflowController

cname: str = "sres"
models: List[str] = ["srdn"]
ccustom: Dict[str, Any] = {'task.nepochs': 1000, 'task.lr': 0.0001}

configuration = dict(
    task="cape_basin_1x1",
    dataset="LLC4320",
    pipeline="sres",
    platform="explore",
)

if __name__ == "__main__":
    controller = WorkflowController(cname, configuration, interp_loss=True)
    controller.train(models, **ccustom)
