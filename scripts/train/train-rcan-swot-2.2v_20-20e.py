"""rcan-10-20-64 on SSS_SST-tiles-48 / swot_20-20e (reference: scripts/train/train-rcan-swot-2.2v_20-20e.py)."""
from typing import Any, Dict, List
from sres_tpu.controller import WorkflowController

cname: str = "sres"
models: List[str] = ["rcan-10-20-64"]
ccustom: Dict[str, Any] = {'task.nepochs': 100, 'task.lr': 0.0001}

configuration = dict(
    task="SSS_SST-tiles-48",
    dataset="swot_20-20e",
    pipeline="sres",
    platform="explore",
)

if __name__ == "__main__":
    controller = WorkflowController(cname, configuration, interp_loss=True)
    controller.train(models, **ccustom)
