"""Export the full region dataset to a zarr store
(reference: scripts/processing/dset_to_zarr.py)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run without install;
# late insert so the interpreter's sitecustomize (axon TPU plugin
# registration) never resolves the repo's top-level config/ tree
from sres_tpu.controller import WorkflowController

cname = "sres"
model = "rcan-10-20-64"

configuration = dict(
    task="SST-tiles-48",
    dataset="swot_20-20e",
    pipeline="sres",
    platform="explore",
)

if __name__ == "__main__":
    controller = WorkflowController(cname, configuration)
    controller.initialize(cname, model, **configuration)
    controller.to_zarr()
