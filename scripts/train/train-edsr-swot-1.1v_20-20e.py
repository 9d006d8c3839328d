"""RCAN ×4 on SWOT SST 20-20E region (reference: scripts/train/train-edsr-swot-1.1v_20-20e.py)."""
from typing import Any, Dict, List
from sres_tpu.controller import WorkflowController

cname: str = "sres"
models: List[str] = ["edsr"]
ccustom: Dict[str, Any] = {"task.nepochs": 10}

configuration = dict(
    task="SST-tiles-48",
    dataset="swot_20-20e",
    pipeline="sres",
    platform="explore",
)

if __name__ == "__main__":
    controller = WorkflowController(cname, configuration, interp_loss=True)
    controller.train(models, **ccustom)
