"""Downsample-robustness sweep: task.data_downsample vs mean loss%%
(reference: scripts/inference/scaling_results-swot-1.1v_20-20e.py)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run without install;
# late insert so the interpreter's sitecustomize (axon TPU plugin
# registration) never resolves the repo's top-level config/ tree
import numpy as np
from sres_tpu.controller import ResultStructure, WorkflowController

cname = "sres"
model = "rcan-10-20-64"
downsample_factors = [1.0, 1.05, 1.1, 1.15, 1.2, 1.25]
timesteps = range(0, 4)

configuration = dict(
    task="SST-tiles-48",
    dataset="swot_20-20e",
    pipeline="sres",
    platform="explore",
)

if __name__ == "__main__":
    for dsf in downsample_factors:
        controller = WorkflowController(cname, configuration)
        controller.initialize(cname, model, **configuration,
                              **{"task.data_downsample": dsf})
        ratios = []
        for ts in timesteps:
            _, losses = controller.inference(ts, ResultStructure.Tiles)
            for vn, ld in losses.items():
                ratios.append(100.0 * ld["model"] / ld["interpolated"])
        print(f"data_downsample={dsf}: mean loss% = {np.mean(ratios):.2f}")
