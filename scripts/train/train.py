"""Generic launcher: python train.py --model rcan-10-20-64 --task SST-tiles-48
--dataset swot_20-20e --platform explore [-ne N] [-r] [key=value ...]"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run without install;
# late insert so the interpreter's sitecustomize (axon TPU plugin
# registration) never resolves the repo's top-level config/ tree
import argparse
from sres_tpu.controller import WorkflowController

p = argparse.ArgumentParser()
p.add_argument("--model", required=True)
p.add_argument("--task", required=True)
p.add_argument("--dataset", required=True)
p.add_argument("--platform", default="explore")
p.add_argument("--seed", type=int, default=None,
               help="reproducible runs; default matches the reference: "
                    "int(time.time()/60), i.e. varies per run")
p.add_argument("overrides", nargs="*", help="dot-key overrides: task.lr=1e-4")
args, _ = p.parse_known_args()

ccustom = {}
for ov in args.overrides:
    k, v = ov.split("=", 1)
    try:
        v = eval(v, {}, {})
    except Exception:
        pass
    ccustom[k] = v

configuration = dict(task=args.task, dataset=args.dataset,
                     pipeline="sres", platform=args.platform)
kw = {} if args.seed is None else {"seed": args.seed}
controller = WorkflowController("sres", configuration, interp_loss=True, **kw)
controller.train([args.model], **ccustom)
