"""Export the full region dataset to a zarr store
(reference: scripts/processing/dset_to_zarr.py)."""
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
