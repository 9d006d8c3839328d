"""End-to-end REGION inference benchmark: the user-facing workflow number.

bench.py measures tiles/s on resident batches; this script times the full
product path instead — `ModelTrainer.infer_region` (trainer/trainer.py:633):
host timeslice load, padded-batch H2D, mesh-sharded forward, on-device
denormalize + mosaic assembly, and the D2H fetch of the four assembled
region images (target/model/interpolated/input). The reference's equivalent
is its per-batch host loop with numpy assembly
(/root/reference/sres/controller/dual_trainer.py:340-420 process_image +
data/inference.py tile mosaics), which crosses to the host once per batch.

Reports regions/min and model-output Mpx/s, median of --windows windows
(first call = compile, excluded). Synthetic tiles-domain dataset at the
flagship operating point: 48x48 LR tiles, x4, rcan-10-20-64 lane_pack 2,
bf16. --grid N gives an NxN tile region (default 16 -> 3072x3072 HR px).

Usage: python scripts/bench/region_infer_bench.py [--cpu] [--grid 16]
       [--windows 3] [--model rcan-10-20-64]
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..")))

import argparse
import statistics
import tempfile
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--grid", type=int, default=16,
                   help="NxN tile grid; HR region = (192*N)^2 px")
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--model", type=str, default="rcan-10-20-64")
    p.add_argument("--seamless", action="store_true",
                   help="bench infer_region_seamless (overlap-margin mode)")
    p.add_argument("--spatial", action="store_true",
                   help="bench infer_region_spatial (whole-region GSPMD — "
                        "no tiling; on one chip this is the full-image "
                        "forward)")
    p.add_argument("--stream", type=int, default=0, metavar="N",
                   help="also bench infer_region_stream over N timeslices "
                        "(prefetch-pipelined: host prep + D2H overlap device "
                        "compute) vs N sequential infer_region calls")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from sres_tpu.config import ConfigContext
    from sres_tpu.data.inference_io import TSet
    from sres_tpu.trainer import ModelTrainer

    hr_px = 192 * args.grid  # 48 LR * x4 per tile
    tmp = tempfile.mkdtemp(prefix="sres_region_bench_")
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": tmp,
        "dataset.image_size": {"y": hr_px, "x": hr_px},
        "dataset.ntimes": 2, "dataset.nan_fraction": 0.1,
        "task.batch_size": 72,
        "task.ttsplit": {"train": 0.5, "valid": 0.5, "test": 0.0},
    }
    with ConfigContext("sres", model=args.model, **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        trainer.init_data_timestamps()
        ctime = trainer.data_timestamps[TSet.Train][0]
        infer = (trainer.infer_region_seamless if args.seamless
                 else trainer.infer_region_spatial if args.spatial
                 else trainer.infer_region)

        t0 = time.perf_counter()
        region = infer(ctime)  # compile + first run
        compile_s = time.perf_counter() - t0
        img = next(iter(region.values()))["model"]
        assert img.data.shape == (hr_px, hr_px), img.data.shape
        ntiles = args.grid * args.grid

        dts = []
        for _ in range(max(1, args.windows)):
            t0 = time.perf_counter()
            region = infer(ctime)
            # the LArray .data is a fetched numpy array — the D2H of the four
            # assembled images is inside the timed region by construction
            float(np.nansum(next(iter(region.values()))["model"].data))
            dts.append(time.perf_counter() - t0)

        med = statistics.median(dts)
        print(f"region {hr_px}x{hr_px} HR px ({args.grid}x{args.grid} tiles, "
              f"{ntiles} tiles), model {args.model}, "
              f"{'seamless' if args.seamless else 'spatial' if args.spatial else 'padded-batch'} mode, "
              f"platform {jax.devices()[0].platform}")
        print(f"  first call (compile+run): {compile_s:.1f} s")
        print(f"  windows s: {[round(d, 3) for d in dts]}  (median {med:.3f})")
        print(f"  regions/min: {60.0 / med:.2f}")
        print(f"  model-output Mpx/s: {hr_px * hr_px / med / 1e6:.2f}")
        print(f"  tiles/s (end-to-end incl. assembly+D2H): {ntiles / med:.1f}")

        if args.stream > 0 and not (args.seamless or args.spatial):
            # stream the same timeslice N times: host prep re-runs per entry
            # (its cost is real each call), so the overlap win is like-for-like
            # against N sequential infer_region calls — all three variants
            # share the one compiled step (same process), so the A/B is clean
            ctimes = [ctime] * args.stream

            def run(tag, it):
                t0 = time.perf_counter()
                for _, res in it:
                    float(np.nansum(next(iter(res.values()))["model"].data))
                dt = time.perf_counter() - t0
                seq = med * args.stream
                print(f"  {tag} x{args.stream}: {dt:.2f} s total, "
                      f"{dt / args.stream:.3f} s/region "
                      f"({60.0 * args.stream / dt:.2f} regions/min) vs "
                      f"sequential {seq:.2f} s — {seq / dt:.2f}x")

            run("seq-loop", ((ct, trainer.infer_region(ct)) for ct in ctimes))
            run("stream(prep-overlap)",
                trainer.infer_region_stream(ctimes, prefetch=2))
            run("stream(+fetch-overlap)",
                trainer.infer_region_stream(ctimes, prefetch=2, overlap_fetch=True))


if __name__ == "__main__":
    main()
