"""On-chip compile-time A/B for the compile-time campaign (PERF.md):
times .lower() + .compile() of the FULL flagship train step through the
axon tunnel for the 4 combos of model.scan_groups x pipeline.packed_opt,
plus one warm re-compile to show cache behavior. Run when the tunnel is
up; results go into PERF.md's compile-time table.

Usage: python scripts/bench/compile_ab.py [--combo scan,packed] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--combo", type=str, default="",
                   help="run only one combo: e.g. 'scan,packed', 'scan', "
                        "'packed', 'base'")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh

    from sres_tpu.models import build_model
    from sres_tpu.trainer.step import StepConfig, build_train_step, init_state

    sc = StepConfig(scale=4, downscale_factors=(2, 2), down_mode="bicubic",
                    up_mode="bicubic", loss_fn="l2", data_downsample=1.0,
                    target_idx=(0,), nchannels_in=1, has_bn=False)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    hr = jnp.zeros((72, 1, 192, 192), jnp.float32)
    w = jnp.ones((72,), jnp.float32)

    combos = [("base", False, False), ("scan", True, False),
              ("packed", False, True), ("scan,packed", True, True)]
    if args.combo:
        combos = [c for c in combos if c[0] == args.combo]
    for label, scan, packed in combos:
        mcfg = dict(name="rcan", nfeatures=64, nlayers=10, nblocks=20,
                    cbottleneck=2, kernel_size=3, downscale_factors=[2, 2],
                    loss_fn="l2", lane_pack=2, scan_groups=scan)
        model = build_model(mcfg, 1, 1, precision="bf16")
        opt = optax.adam(1e-4)
        if packed:
            opt = optax.flatten(opt)
        st, _ = init_state(model, opt,
                           jnp.zeros((1, 48, 48, 1), jnp.float32), seed=0)
        fn = build_train_step(model, opt, sc, mesh)
        t0 = time.time()
        low = fn.lower(st, hr, w)
        tl = time.time() - t0
        t0 = time.time()
        compiled = low.compile()
        tc = time.time() - t0
        # one real step to prove the compiled artifact executes
        t0 = time.time()
        st2, m = compiled(st, hr, w)
        loss = float(m["mloss"])
        te = time.time() - t0
        print(f"{label}: lower {tl:.1f}s compile {tc:.1f}s "
              f"first-step {te:.1f}s loss {loss:.5f}", flush=True)


if __name__ == "__main__":
    main()
