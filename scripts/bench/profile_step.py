"""Trace-profile the flagship train step and print a device-op time
decomposition (the tool behind PERF.md's "where the time goes" tables).

Runs N steps under ``jax.profiler`` with a Perfetto JSON trace, then buckets
device-op wall time by kernel category (conv / dW fusions / converts+reduces
/ copies / rest). Works on CPU (--cpu) and on the chip through the axon
tunnel (the trace collector runs host-side; device ops appear on the TPU
tracks).

Usage: python scripts/bench/profile_step.py [--cpu] [--int8] [--steps 3]
       [--batch 72] [--lane_pack 2]
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))  # run without install;
# late insert so the interpreter's sitecustomize (axon TPU plugin
# registration) never resolves the repo's top-level config/ tree

import argparse
import glob
import gzip
import json
import os
import tempfile
from collections import defaultdict


def bucket(name: str) -> str:
    n = name.lower()
    if "reduce" in n or "convert" in n:    # before conv: 'convert' contains 'conv'
        return "convert+reduce fusions"
    if "convolution" in n or n.startswith("conv"):
        return "convolutions (fwd+dx+dW)"
    if "transpose" in n and "fusion" in n:
        return "transpose fusions"
    if n.startswith("copy") or "copy" in n:
        return "copies"
    if "fusion" in n:
        return "elementwise/other fusions"
    if "dynamic" in n or "slice" in n or "concatenate" in n or "pad" in n:
        return "data movement (slice/concat/pad)"
    if "dot" in n or "matmul" in n:
        return "matmuls"
    return "other"


def parse_perfetto(tdir: str):
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True) + \
        glob.glob(f"{tdir}/**/perfetto_trace.json.gz", recursive=True)
    if not paths:
        raise SystemExit(f"no perfetto trace under {tdir}; files: "
                         f"{glob.glob(tdir + '/**/*', recursive=True)[:20]}")
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    # device tracks: process/thread names containing TPU/device; fall back to
    # every complete ('X') event that looks like an XLA op
    tid_names = {}
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e["args"].get("name", "")
    # per-op device time lives ONLY on the 'XLA Ops' thread of the device
    # process; 'XLA Modules'/'Steps' tracks are whole-span rows that would
    # double-count everything
    device_keys = {k for k, v in tid_names.items() if v == "XLA Ops"}
    totals = defaultdict(float)
    sources = defaultdict(float)
    nops = 0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if (e.get("pid"), e.get("tid")) not in device_keys:
            continue
        args = e.get("args", {})
        # authoritative category from the XLA profiler when present
        cat = args.get("hlo_category") or bucket(e["name"])
        totals[cat] += e["dur"] / 1e3  # us → ms
        src = args.get("source")
        if src:
            sources[src.split("/")[-1]] += e["dur"] / 1e3
        nops += 1
    return totals, nops, sources


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int8-fused", action="store_true", dest="int8_fused")
    p.add_argument("--int8-full", action="store_true", dest="int8_full")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--batch", type=int, default=72)
    p.add_argument("--lane_pack", type=int, default=2)
    p.add_argument("--nfeatures", type=int, default=64)
    p.add_argument("--nlayers", type=int, default=10)
    p.add_argument("--nblocks", type=int, default=20)
    p.add_argument("--packed-opt", action=argparse.BooleanOptionalAction,
                   dest="packed_opt", default=True,
                   help="flat-vector Adam (pipeline.packed_opt, the default "
                        "since round 4) — profile the production step")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from sres_tpu.models import build_model
    from sres_tpu.parallel.mesh import get_mesh
    from sres_tpu.trainer.step import StepConfig, build_train_step, init_state

    mcfg = dict(name="rcan", nfeatures=args.nfeatures, nlayers=args.nlayers,
                nblocks=args.nblocks, cbottleneck=2, kernel_size=3,
                downscale_factors=[2, 2], loss_fn="l2", lane_pack=args.lane_pack,
                quantization=("int8_full" if args.int8_full
                              else "int8_fused" if args.int8_fused
                              else "int8" if args.int8 else None))
    model = build_model(mcfg, 1, 1, precision="f32" if args.cpu else "bf16")
    optimizer = optax.adam(1e-4)
    if args.packed_opt:
        optimizer = optax.flatten(optimizer)
    state, has_bn = init_state(model, optimizer,
                               jnp.zeros((1, 48, 48, 1), jnp.float32), seed=0)
    sc = StepConfig(scale=4, downscale_factors=(2, 2), down_mode="bicubic",
                    up_mode="bicubic", loss_fn="l2", data_downsample=1.0,
                    target_idx=(0,), nchannels_in=1, has_bn=has_bn)
    mesh = get_mesh({"data": -1})
    step = build_train_step(model, optimizer, sc, mesh)
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.normal(size=(args.batch, 1, 192, 192)).astype(np.float32))
    w = jnp.ones((args.batch,), jnp.float32)
    for _ in range(2):                                   # warmup + relayout
        state, metrics = step(state, hr, w)
    float(metrics["mloss"])

    tdir = tempfile.mkdtemp(prefix="sres_profile_")
    jax.profiler.start_trace(tdir, create_perfetto_trace=True)
    for _ in range(args.steps):
        state, metrics = step(state, hr, w)
    loss = float(metrics["mloss"])                        # force execution
    jax.profiler.stop_trace()

    totals, nops, sources = parse_perfetto(tdir)
    total = sum(totals.values())
    mode = ("int8_full" if args.int8_full else
            "int8_fused" if args.int8_fused else
            "int8" if args.int8 else ("f32" if args.cpu else "bf16"))
    print(f"\n{args.steps} steps, batch {args.batch}, {mode}, "
          f"lane_pack {args.lane_pack}; loss {loss:.4f}; "
          f"{nops} device ops, {total:.1f} ms total device time "
          f"({total / args.steps:.1f} ms/step):")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"  {ms / args.steps:8.2f} ms/step  {100 * ms / total:5.1f}%  {name}")
    if sources:
        print("top sources (jaxpr provenance):")
        for src, ms in sorted(sources.items(), key=lambda kv: -kv[1])[:8]:
            print(f"  {ms / args.steps:8.2f} ms/step  {src}")
    print(f"trace: {tdir}")


if __name__ == "__main__":
    main()
