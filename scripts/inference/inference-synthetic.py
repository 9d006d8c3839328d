"""Offline inference smoke: tiles + image structures on the synthetic dataset
(run scripts/train/train-synthetic.py first)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run without install;
# late insert so the interpreter's sitecustomize (axon TPU plugin
# registration) never resolves the repo's top-level config/ tree
from sres_tpu.controller import ResultStructure, WorkflowController

configuration = dict(task="synthetic-tiles-48", dataset="synthetic",
                     pipeline="sres", platform="local")
overrides = {"model.nlayers": 4, "model.nfeatures": 32}

if __name__ == "__main__":
    controller = WorkflowController("sres", configuration)
    controller.initialize("sres", "edsr", **configuration, **overrides)
    for ts in range(2):
        controller.inference(ts, ResultStructure.Tiles)
    controller.inference(0, ResultStructure.Image)
    # TPU-native region modes: host halo tiling / whole-region SPMD
    controller.inference(0, ResultStructure.Image, region_mode="seamless", save=False)
    controller.inference(0, ResultStructure.Image, region_mode="spatial", save=False)
    print("inference artifacts written")
