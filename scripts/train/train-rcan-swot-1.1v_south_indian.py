"""rcan-10-20-64 on SST-tiles-48 / swot_south_indian (reference: scripts/train/train-rcan-swot-1.1v_south_indian.py)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run without install;
# late insert so the interpreter's sitecustomize (axon TPU plugin
# registration) never resolves the repo's top-level config/ tree
from typing import Any, Dict, List
from sres_tpu.controller import WorkflowController

cname: str = "sres"
models: List[str] = ["rcan-10-20-64"]
ccustom: Dict[str, Any] = {'task.nepochs': 10}

configuration = dict(
    task="SST-tiles-48",
    dataset="swot_south_indian",
    pipeline="sres",
    platform="explore",
)

if __name__ == "__main__":
    controller = WorkflowController(cname, configuration, interp_loss=True)
    controller.train(models, **ccustom)
