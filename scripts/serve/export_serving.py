"""Export an AOT serving artifact for a trained model.

Composes the config (same groups as training), restores the latest or
best-validation checkpoint through the trainer's CheckpointManager, and
writes a jax.export'd forward + manifest (sres_tpu/util/serving.py). The
artifact serves without the model zoo or config tree on the host.

  python scripts/serve/export_serving.py --model rcan-10-20-64 \
      --task SST-tiles-48 --dataset swot_20-20e --platform explore \
      --out /tmp/rcan_serving --batch 72,144 [--best] [key=value ...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--task", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--platform", default="explore")
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=str, default="1",
                   help="comma-separated fixed batch sizes, e.g. 72,144")
    p.add_argument("--symbolic-batch", type=str, default=None,
                   dest="symbolic", metavar="EXPR",
                   help="one artifact over a symbolic batch dim: 'b' for "
                        "plain archs (any batch), '2*b' for lane_pack=2 "
                        "trunks (any even batch)")
    p.add_argument("--best", action="store_true",
                   help="restore the best-validation slot instead of latest")
    p.add_argument("--seed", type=int, default=4456)
    p.add_argument("overrides", nargs="*", help="dot-key overrides")
    args = p.parse_args()

    ccustom = {}
    for ov in args.overrides:
        k, v = ov.split("=", 1)
        try:
            v = eval(v, {}, {})
        except Exception:
            pass
        ccustom[k] = v

    from sres_tpu.config import ConfigContext, cfg
    from sres_tpu.data.inference_io import TSet
    from sres_tpu.trainer import ModelTrainer
    from sres_tpu.util.serving import export_serving

    with ConfigContext("sres", model=args.model, task=args.task,
                       dataset=args.dataset, platform=args.platform,
                       pipeline="sres", **ccustom) as cc:
        trainer = ModelTrainer(cc, seed=args.seed)
        tset = TSet.Validation if args.best else TSet.Train
        meta = trainer.checkpoint_manager.load_checkpoint(
            trainer.state, tset, update_model=True) or {}
        state = meta.get("state", trainer.state)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        tsz = cfg().task.tile_size
        manifest = export_serving(
            trainer.model, variables, (tsz["y"], tsz["x"]),
            len(trainer.input_variables), args.out,
            batch_sizes=[int(b) for b in args.batch.split(",")],
            symbolic_batch=args.symbolic,
            manifest_extra={
                "model": args.model, "task": args.task,
                "dataset": args.dataset, "cid": cc.cid,
                "scale": trainer.scale_factor,
                "checkpoint_slot": tset.value,
                "checkpoint_epoch": meta.get("epoch"),
            })
        print(f"exported {len(manifest['artifacts'])} artifact(s) -> "
              f"{args.out}")


if __name__ == "__main__":
    main()
