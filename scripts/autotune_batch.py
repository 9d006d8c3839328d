"""Autotune the training/eval batch size against the HBM budget.

Finds the largest batch whose compiled step fits the device budget using
AOT ``memory_analysis()`` only — no step is ever dispatched, so the search
is OOM-safe and works through the axon tunnel (each probe costs one
lower+compile; the exponential+binary search needs ~5-8 of them). See
sres_tpu/util/autotune.py for the rationale vs the reference's hand-sized
task yamls.

  python scripts/autotune_batch.py                        # flagship train
  python scripts/autotune_batch.py --mode eval --hi 2048
  python scripts/autotune_batch.py --model-yaml edsr --budget-gb 16
  python scripts/autotune_batch.py --cpu --tiny           # machinery check
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..")))

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="scaled-down flagship — fast machinery check")
    p.add_argument("--mode", default="train",
                   choices=["train", "train_perleaf", "eval", "serve"],
                   help="step to size ('train' = packed_opt Adam, the "
                        "round-4 default)")
    p.add_argument("--model-yaml", default="",
                   help="size a config/model/<NAME>.yaml instead of the "
                        "flagship rcan-10-20-64")
    p.add_argument("--budget-gb", type=float, default=16.0)
    p.add_argument("--headroom-gb", type=float, default=0.25)
    p.add_argument("--lo", type=int, default=8)
    p.add_argument("--hi", type=int, default=1024)
    p.add_argument("--quantum", type=int, default=8)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh

    from sres_tpu.models import build_model
    from sres_tpu.trainer.step import StepConfig, init_state
    from sres_tpu.util.autotune import (build_mode_step, max_batch_fit,
                                        step_probe)

    if args.model_yaml:
        import yaml
        path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "..", "config", "model", f"{args.model_yaml}.yaml")
        mcfg = yaml.safe_load(open(path))
    else:
        nf, nl, nb = (8, 1, 2) if args.tiny else (64, 10, 20)
        mcfg = dict(name="rcan", nfeatures=nf, nlayers=nl, nblocks=nb,
                    cbottleneck=2, kernel_size=3, downscale_factors=[2, 2],
                    loss_fn="l2", lane_pack=2)
    # the probed step must match the model's real geometry: scale and
    # downscale factors come from the model config, not a flagship constant
    dfs = tuple(int(f) for f in mcfg.get("downscale_factors", [2, 2]))
    scale = 1
    for f in dfs:
        scale *= f
    model = build_model(mcfg, 1, 1, precision="bf16")
    opt = optax.adam(1e-4)
    if args.mode == "train":
        opt = optax.flatten(opt)
    state, has_bn = init_state(model, opt,
                               jnp.zeros((1, 48, 48, 1), jnp.float32), seed=0)
    sc = StepConfig(scale=scale, downscale_factors=dfs, down_mode="bicubic",
                    up_mode="bicubic", loss_fn=mcfg.get("loss_fn", "l2"),
                    data_downsample=1.0, target_idx=(0,), nchannels_in=1,
                    has_bn=has_bn)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    builder_mode = "train" if args.mode == "train_perleaf" else args.mode

    def build_step(batch: int):
        return build_mode_step(model, opt, state, has_bn, sc, mesh,
                               builder_mode, batch)

    probed_order = []
    base_probe = step_probe(build_step)

    def probe(batch: int) -> float:
        gb = base_probe(batch)
        probed_order.append((batch, gb))
        print(f"  probe batch {batch:5d}: {gb:7.3f} GB", flush=True)
        return gb

    print(f"autotune {args.model_yaml or 'rcan-10-20-64'} {args.mode} on "
          f"{jax.devices()[0].platform}, budget {args.budget_gb:g} GB "
          f"(headroom {args.headroom_gb:g})")
    batch, gb, probed = max_batch_fit(
        probe, budget_gb=args.budget_gb, headroom_gb=args.headroom_gb,
        lo=args.lo, hi=args.hi, quantum=args.quantum)
    import math
    print(json.dumps({"recommended_batch": batch,
                      # inf (nothing fits / OOM at lo) is not valid JSON
                      "hbm_gb": gb if math.isfinite(gb) else None,
                      "probes": len(probed),
                      "budget_gb": args.budget_gb,
                      "mode": args.mode,
                      "model": args.model_yaml or "rcan-10-20-64"}))
    if batch == 0:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
