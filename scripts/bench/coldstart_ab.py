"""Serving cold-start A/B: time-to-first-prediction for the two deploy
flows (docs/MIGRATION.md "Serving / deployment"):

  full   — compose config-equivalent model, init/restore params, jit, run
           (what a reference-style serving host does at process start)
  aot    — load_serving(artifact) and run (jax.export module; python-side
           model build/trace/lower skipped, backend compile remains and
           hits the XLA compilation cache when warm)

Each arm runs in a SUBPROCESS so import/trace costs are honestly counted.
Prints one line per arm. --cpu for the offline contract; on the real chip
the delta is dominated by the tunnel's multi-minute trace+compile.

  python scripts/bench/coldstart_ab.py [--cpu] [--nfeatures 64 ...]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import textwrap
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

ARM = textwrap.dedent("""
    import json, os, sys, time
    t0 = time.time()
    if {cpu}:
        import jax; jax.config.update("jax_platforms", "cpu")
    import jax, jax.numpy as jnp, numpy as np
    sys.path.insert(0, {repo!r})
    lr = jnp.zeros((2, 48, 48, 1), jnp.float32)
    if {aot}:
        from sres_tpu.util.serving import load_serving
        fn = load_serving({art!r}, batch=2)
        y = fn(lr)
    else:
        from sres_tpu.models import build_model
        m = build_model(json.loads({mcfg!r}), 1, 1, precision="f32")
        v = m.init(jax.random.PRNGKey(0), lr)
        fn = jax.jit(lambda a: m.apply(v, a, train=False))
        y = fn(lr)
    print("TTFP %.2f" % (time.time() - t0), float(jnp.sum(y)))
""")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--nfeatures", type=int, default=64)
    p.add_argument("--nlayers", type=int, default=10)
    p.add_argument("--nblocks", type=int, default=20)
    p.add_argument("--lane_pack", type=int, default=2)
    args = p.parse_args()

    mcfg = dict(name="rcan", nfeatures=args.nfeatures, nlayers=args.nlayers,
                nblocks=args.nblocks, cbottleneck=2, kernel_size=3,
                downscale_factors=[2, 2], loss_fn="l2",
                lane_pack=args.lane_pack)

    # export once (not timed: deployment-time cost, not serving cold start)
    art = tempfile.mkdtemp(prefix="coldstart_art_")
    env = dict(os.environ)
    prep = textwrap.dedent(f"""
        import json, sys
        if {args.cpu}:
            import jax; jax.config.update("jax_platforms", "cpu")
        import jax, jax.numpy as jnp
        sys.path.insert(0, {REPO!r})
        from sres_tpu.models import build_model
        from sres_tpu.util.serving import export_serving
        m = build_model(json.loads({json.dumps(mcfg)!r}), 1, 1, precision="f32")
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 48, 48, 1), jnp.float32))
        export_serving(m, v, (48, 48), 1, {art!r}, batch_sizes=[2])
    """)
    subprocess.run([sys.executable, "-c", prep], env=env, check=True)

    for label, aot in (("full", False), ("aot", True)):
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-c", ARM.format(
                cpu=args.cpu, aot=aot, repo=REPO, art=art,
                mcfg=json.dumps(mcfg))],
            env=env, capture_output=True, text=True)
        wall = time.time() - t0
        line = (r.stdout.strip().splitlines() or ["?"])[-1]
        print(f"{label}: subprocess wall {wall:.2f}s | in-process {line}"
              + ("" if r.returncode == 0 else f" | FAILED {r.stderr[-300:]}"))


if __name__ == "__main__":
    main()
