"""Per-mode HBM footprint audit (round-3 verdict weak #4 / item #5).

AOT-compiles the step executable for every mode the bench advertises and
reports its device-memory footprint via ``memory_analysis()`` — which works
through the axon tunnel where runtime memory_stats() does not. Enforces the
v5e 16 GB budget (sres_tpu/util/hbm.py); exits 1 if any audited mode is
over. Record the table in PERF.md after a tunnel run.

  python scripts/bench/hbm_audit.py                 # all modes, one chip
  python scripts/bench/hbm_audit.py --modes train,winograd
  python scripts/bench/hbm_audit.py --cpu --tiny    # machinery test (CI)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

MODES = ["train", "train_packed", "winograd", "winograd_stash", "int8_fused",
         "scan_packed", "eval", "serve"]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="scaled-down flagship (fast compiles) — exercises "
                        "the audit machinery, not the production numbers")
    p.add_argument("--modes", default=",".join(MODES))
    p.add_argument("--budget-gb", type=float, default=16.0)
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
    from sres_tpu.util.autotune import build_mode_step
    from sres_tpu.util.hbm import (HBMBudgetError, assert_fits,
                                   compiled_hbm_gb)

    nf, nl, nb, batch = (8, 1, 2, 8) if args.tiny else (64, 10, 20, 72)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    sc = StepConfig(scale=4, downscale_factors=(2, 2), down_mode="bicubic",
                    up_mode="bicubic", loss_fn="l2", data_downsample=1.0,
                    target_idx=(0,), nchannels_in=1, has_bn=False)

    def build(quant=None, wino=None, scan=False, packed=False):
        mcfg = dict(name="rcan", nfeatures=nf, nlayers=nl, nblocks=nb,
                    cbottleneck=2, kernel_size=3, downscale_factors=[2, 2],
                    loss_fn="l2", lane_pack=2, quantization=quant,
                    winograd=wino, scan_groups=scan)
        model = build_model(mcfg, 1, 1, precision="bf16")
        opt = optax.adam(1e-4)
        if packed:
            opt = optax.flatten(opt)
        st, _ = init_state(model, opt, jnp.zeros((1, 48, 48, 1), jnp.float32),
                           seed=0)
        return model, opt, st

    report, ok = {}, True
    for mode in args.modes.split(","):
        b = 144 if mode == "int8_fused" and not args.tiny else batch
        if mode == "winograd_stash":
            os.environ["SRES_WINO_STASH_PRIMAL"] = "1"
        elif "SRES_WINO_STASH_PRIMAL" in os.environ:
            del os.environ["SRES_WINO_STASH_PRIMAL"]
        # model-config variants per audit mode; the step+sample scaffolding
        # itself is shared with scripts/autotune_batch.py (build_mode_step)
        BUILD_KW = {"train": {}, "train_packed": {"packed": True},
                    "winograd": {"wino": 2}, "winograd_stash": {"wino": 2},
                    "int8_fused": {"quant": "int8_fused"},
                    "scan_packed": {"scan": True, "packed": True},
                    "eval": {}, "serve": {}}
        if mode not in BUILD_KW:
            report[mode] = {"error": "unknown mode"}
            ok = False
            continue
        try:
            model, opt, st = build(**BUILD_KW[mode])
            step_mode = mode if mode in ("eval", "serve") else "train"
            fn, sample = build_mode_step(model, opt, st, False, sc, mesh,
                                         step_mode, b)
            c = fn.lower(*sample).compile()
            gb = compiled_hbm_gb(c)
            entry = {"hbm_model_gb": gb, "batch": b}
            try:
                entry["headroom_gb"] = assert_fits(gb, mode,
                                                   budget_gb=args.budget_gb)
            except HBMBudgetError as e:
                entry["over_budget"] = str(e)
                ok = False
            report[mode] = entry
        except Exception as e:  # compile failure IS an audit finding
            report[mode] = {"error": f"{type(e).__name__}: {e}"[:300]}
            ok = False
        print(f"  {mode}: {report[mode]}", file=sys.stderr, flush=True)

    print(json.dumps({"budget_gb": args.budget_gb, "tiny": args.tiny,
                      "modes": report, "pass": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
