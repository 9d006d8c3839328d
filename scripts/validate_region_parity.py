"""Region-scale two-stack parity A/B on a generated SWOT-format dataset
(round-5 / VERDICT r4 item #2).

The environment has no SWOT data mounts, but nothing blocks a REAL
region-scale run on generated SWOT-format binaries: this script writes a
full-region fixture through the production SWOT layout
(``sres_tpu.data.synthetic.write_swot_fixture`` — mask template +
big-endian shrunk value files; reference reader:
/root/reference/sres/base/source/swot/raw.py:133-145), then

  1. trains OUR full stack (SWOT loader → lnorm → NaN-tile dropping →
     padded batches → compiled train/eval steps → checkpoints/CSV) while
     recording the exact (hr, weight) batch stream it consumes;
  2. replays the identical stream through the REFERENCE's own torch RCAN
     module (imported unmodified from /root/reference via tests/ref_zoo)
     with the reference's loop semantics — bicubic LR synthesis
     (dual_trainer.py:557-571), RMSE loss (:205-212), torch Adam (:126),
     per-batch backward/step — from identical initial weights;
  3. runs region inference BOTH sides for each timestep: ours via
     ``trainer.process_image`` (the reference's assembly path,
     dual_trainer.py:396-480), the reference via its torch forward +
     the same denorm/mosaic, both saved as standard inference NetCDFs;
  4. runs the data_downsample scaling sweep BOTH sides
     (scaling_results-swot-1.1v_20-20e.py:26-44 semantics);
  5. diffs everything with the validate_reference_parity kit machinery:
     per-batch loss trajectories, per-variable RMS deltas + assembled
     PSNR at region scale, sweep loss%% deltas.

Prints ONE JSON report line; exit 0 iff all diffs pass ``--tolerance``.

Usage (defaults: 960x1280 HR px region = 30 tiles/slice, 3 slices,
3 effective epochs, reduced RCAN, CPU f32):
  python scripts/validate_region_parity.py
  python scripts/validate_region_parity.py --nx 512 --nepochs 5 \
      --override model.nfeatures=32

Opt-in slow test: tests/test_region_parity.py (SRES_SLOW=1).
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
from typing import Dict, List

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _torch_apply_network(tmodel, hr_np, scale: float, data_downsample: float,
                         torch, F):
    """The reference's apply_network semantics (dual_trainer.py:557-571):
    optional degradation, bicubic /scale LR synthesis, forward. Returns
    (lr, out) torch tensors (NCHW f32)."""
    x = torch.tensor(hr_np, dtype=torch.float32)
    if data_downsample > 1.0:
        x = F.interpolate(x, scale_factor=1.0 / data_downsample, mode="bicubic")
    lr = F.interpolate(x, scale_factor=1.0 / scale, mode="bicubic")
    with torch.no_grad():
        out = tmodel(lr)
    # fractional factors leave the target 1px larger: crop target to product
    # (reference dual_trainer.py:200-203; ours: losses.conform_to_product)
    x = x[:, :, : out.shape[2], : out.shape[3]]
    return x, lr, out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=320,
                   help="LLC tile edge: the assembled global panel is "
                        "(3nx, 4nx) px -> 960x1280 at the default (30 "
                        "192px-HR tiles per timeslice)")
    p.add_argument("--ntimes", type=int, default=4)
    p.add_argument("--nepochs", type=int, default=3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--tolerance", type=float, default=0.02)
    p.add_argument("--sweep-factors", default="1.0,1.25")
    p.add_argument("--override", action="append", default=[],
                   help="extra dot-key config overrides (k=v)")
    p.add_argument("--keep", action="store_true", help="keep the tmp tree")
    args = p.parse_args()

    os.environ.setdefault("SRES_LOG_TO_STDERR", "1")

    import numpy as np
    import torch
    import torch.nn.functional as F

    import jax
    jax.config.update("jax_platforms", "cpu")

    from ref_zoo import get_ref_model, have_reference
    from validate_reference_parity import diff_inference_dirs, diff_sweeps

    from sres_tpu.config import ConfigContext, cfg
    from sres_tpu.data.inference_io import (ResultStructure, TSet,
                                            save_inference_results)
    from sres_tpu.data.norm import denorm
    from sres_tpu.data.synthetic import write_swot_fixture
    from sres_tpu.trainer import ModelTrainer
    from sres_tpu.util.torch_export import export_variables

    if not have_reference():
        print(json.dumps({"error": "/root/reference not present"}))
        sys.exit(2)
    torch.set_num_threads(max(1, os.cpu_count() or 1))

    root = tempfile.mkdtemp(prefix="region_parity_")
    data_root = os.path.join(root, "swot")
    fx = write_swot_fixture(data_root, nx=args.nx, ntimes=args.ntimes)

    over: Dict = {
        "platform.root": root,
        "pipeline.device": "cpu", "pipeline.precision": "f32",
        "dataset.dataset_root": fx["root"],
        "dataset.dataset_files": fx["files"],
        "dataset.template": fx["template"],
        "dataset.roi": None,               # full (3nx, 4nx) panel
        "task.batch_size": args.batch,
        "task.xyflip": False,              # determinism across the two stacks
        "task.ttsplit": {"train": 0.5, "valid": 0.5, "test": 0.0},
        # reduced RCAN: region-scale parity is a DATA/LOOP/ASSEMBLY property,
        # not a model-size one (model-forward parity at full flagship size is
        # golden-tested in tests/test_golden_parity.py)
        "model.nfeatures": 16, "model.nlayers": 2, "model.nblocks": 2,
        "model.lane_pack": 1,
    }
    for kv in args.override:
        k, v = kv.split("=", 1)
        try:
            v = eval(v, {}, {})
        except Exception:
            pass
        over[k] = v

    MCFG_KEYS = ["name", "nfeatures", "nlayers", "nblocks", "cbottleneck",
                 "kernel_size", "downscale_factors"]
    record: List = []
    report: Dict = {"region_px": [3 * args.nx, 4 * args.nx],
                    "pass": True}

    ConfigContext.set_defaults(platform="local", task="SST-tiles-48",
                               dataset="swot", pipeline="sres")
    with ConfigContext("sres", model="rcan-10-10-64", **over) as cc:
        trainer = ModelTrainer(cc, seed=args.seed)
        mcfg = {k: cfg().model.get(k) for k in MCFG_KEYS
                if cfg().model.get(k) is not None}
        lr0 = float(cfg().task.lr)
        scale = float(np.prod(mcfg["downscale_factors"]))
        init_tw = export_variables("rcan", {"params": trainer.state.params}, mcfg)

        orig_train, orig_eval = trainer._run_train_step, trainer._run_eval_step

        def rec_train(hr, w, ctime):
            state, metrics = orig_train(hr, w, ctime)
            record.append(("train", np.array(hr), np.array(w),
                           float(metrics["sloss"])))
            return state, metrics

        def rec_eval(hr, w, ctime):
            metrics, outputs = orig_eval(hr, w, ctime)
            record.append(("eval", np.array(hr), np.array(w),
                           float(metrics["sloss"])))
            return metrics, outputs

        trainer._run_train_step, trainer._run_eval_step = rec_train, rec_eval
        # reference quirk: refresh runs nepochs-1 epochs
        trainer.train(args.nepochs + 1, refresh_state=True, seed=args.seed)
        trainer._run_train_step, trainer._run_eval_step = orig_train, orig_eval

        ntr = sum(1 for r in record if r[0] == "train")
        nev = len(record) - ntr
        report["batches"] = {"train": ntr, "eval": nev}

        # ---- 2. reference replay from identical init -----------------------
        tmodel = get_ref_model("rcan", mcfg, 1, 1)
        torch.nn.Module.load_state_dict(
            tmodel, {k: torch.from_numpy(np.ascontiguousarray(v))
                     for k, v in init_tw.items()}, strict=True)
        tmodel.train()   # the reference never switches to eval (PARITY quirk 9)
        opt = torch.optim.Adam(tmodel.parameters(), lr=lr0, weight_decay=0.0)
        tlosses = []
        for phase, hr, w, _ in record:
            nvalid = int(w.sum())
            x = torch.tensor(hr[:nvalid], dtype=torch.float32)
            lr_in = F.interpolate(x, scale_factor=1.0 / scale, mode="bicubic")
            if phase == "train":
                opt.zero_grad()
                out = tmodel(lr_in)
                loss = torch.sqrt(torch.mean((out - x) ** 2))
                loss.backward()
                opt.step()
            else:
                with torch.no_grad():
                    out = tmodel(lr_in)
                    loss = torch.sqrt(torch.mean((out - x) ** 2))
            tlosses.append(float(loss.detach()))

        ours_losses = [r[3] for r in record]
        rel = [abs(a - b) / max(abs(b), 1e-12)
               for a, b in zip(ours_losses, tlosses)]
        report["trajectory"] = {
            "steps_compared": len(rel),
            "mean_rel_loss_delta": round(float(np.mean(rel)), 6),
            "max_rel_loss_delta": round(float(np.max(rel)), 6),
            "final_rel_loss_delta": round(rel[-1], 6),
            "final_loss_ours": round(ours_losses[-1], 6),
            "final_loss_ref": round(tlosses[-1], 6),
        }
        if rel[-1] > args.tolerance:
            report["pass"] = False

        # ---- 3. region inference artifacts, both stacks ---------------------
        # ours: the production process_image path on the FINAL state
        # (update_model=False so both stacks use their end-of-replay weights)
        ours_results = cfg().platform.results
        ref_results = os.path.join(root, "ref_results")
        trainer.init_data_timestamps()
        train_times = trainer.data_timestamps[TSet.Train]
        vname = trainer.target_variables[0]
        nts = min(2, len(train_times))
        for ts in range(nts):
            images, losses = trainer.process_image(TSet.Validation, ts,
                                                   update_model=False)
            save_inference_results(vname, ResultStructure.Image,
                                   images[vname], ts, losses[vname])

        # reference side: its torch forward over the same tile batches +
        # the same denorm/mosaic (its np.block assembly semantics,
        # dual_trainer.py:449-480 == trainer.assemble_images)
        tmodel_eval = tmodel    # reference stays in train mode (quirk 9)
        for ts in range(nts):
            ctime = train_times[ts]
            with trainer.loader_lock:
                timeslice = trainer.dataset.load_timeslice(ctime)
                tile_iter = trainer._tile_iterator(ctime)
                batches = []
                mlosses, ilosses = [], []
                for ctile in iter(tile_iter):
                    batch = trainer.dataset.get_batch_array(ctile, ctime)
                    if batch is None:
                        break
                    hr = np.asarray(batch.data, np.float32)
                    x, lr_t, out = _torch_apply_network(
                        tmodel_eval, hr, scale, 1.0, torch, F)
                    interp = F.interpolate(lr_t, scale_factor=scale,
                                           mode="bicubic")
                    mlosses.append(float(torch.sqrt(torch.mean((out - x) ** 2))))
                    ilosses.append(float(torch.sqrt(torch.mean((interp - x) ** 2))))
                    attrs = batch.attrs
                    batches.append(dict(
                        input=denorm(lr_t.numpy(), attrs),
                        target=denorm(x.numpy(), attrs),
                        interpolated=denorm(interp.numpy(), attrs),
                        model=denorm(out.numpy(), attrs)))
            tile_ids = np.asarray(timeslice.coords["tiles"])
            grid_shape = timeslice.attrs["grid_shape"]
            images = trainer.assemble_images(batches, 0, tile_ids, grid_shape)
            losses = dict(model=float(np.mean(mlosses)),
                          interpolated=float(np.mean(ilosses)))
            cfg().platform["results"] = ref_results
            try:
                save_inference_results(vname, ResultStructure.Image,
                                       images, ts, losses)
            finally:
                cfg().platform["results"] = ours_results

        inference_report = diff_inference_dirs(
            os.path.join(ours_results, "inference"),
            os.path.join(ref_results, "inference"), args.tolerance)
        report["inference"] = inference_report
        report["pass"] = report["pass"] and inference_report["pass"]

        # ---- 4. scaling sweep, both stacks ----------------------------------
        factors = [float(x) for x in args.sweep_factors.split(",") if x]
        ours_sweep: Dict[str, float] = {}
        ref_sweep: Dict[str, float] = {}
        for dsf in factors:
            ratios_o, ratios_r = [], []
            for ts in range(nts):
                ctime = train_times[ts]
                with trainer.loader_lock:
                    trainer.dataset.load_timeslice(ctime)
                    tile_iter = trainer._tile_iterator(ctime)
                    for ctile in iter(tile_iter):
                        batch = trainer.dataset.get_batch_array(ctile, ctime)
                        if batch is None:
                            break
                        hr = np.asarray(batch.data, np.float32)
                        hrp, wp, nvalid = trainer._pad_batch(batch)
                        metrics, _ = trainer._run_eval_step(hrp, wp, ctime) \
                            if dsf == 1.0 else _eval_at_factor(
                                trainer, hrp, wp, float(dsf))
                        m = jax.device_get(metrics)
                        ratios_o.append(100.0 * float(m["sloss"])
                                        / max(float(m["interp_sloss"]), 1e-12))
                        # reference: torch apply_network at this factor
                        x, lr_t, out = _torch_apply_network(
                            tmodel_eval, hr, scale, float(dsf), torch, F)
                        interp = F.interpolate(lr_t, scale_factor=scale,
                                               mode="bicubic")
                        ml = float(torch.sqrt(torch.mean((out - x) ** 2)))
                        il = float(torch.sqrt(torch.mean((interp - x) ** 2)))
                        ratios_r.append(100.0 * ml / max(il, 1e-12))
            ours_sweep[f"{dsf:.2f}"] = round(float(np.mean(ratios_o)), 4)
            ref_sweep[f"{dsf:.2f}"] = round(float(np.mean(ratios_r)), 4)
        sweep_report = diff_sweeps(ours_sweep, ref_sweep, args.tolerance)
        report["sweep"] = sweep_report
        report["pass"] = report["pass"] and sweep_report["pass"]

    report["root"] = root if args.keep else "(removed)"
    if not args.keep:
        import shutil
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(report))
    sys.exit(0 if report["pass"] else 1)


def _eval_at_factor(trainer, hrp, wp, dsf: float):
    """Jitted eval step at a non-default data_downsample factor, cached per
    factor on the trainer (one compile each)."""
    from sres_tpu.trainer.step import build_eval_step
    cache = getattr(trainer, "_sweep_eval_cache", None)
    if cache is None:
        cache = trainer._sweep_eval_cache = {}
    step = cache.get(dsf)
    if step is None:
        sc = trainer.step_config._replace(data_downsample=dsf)
        step = cache[dsf] = build_eval_step(trainer.model, sc, trainer.mesh)
    return step(trainer.state, hrp, wp)


if __name__ == "__main__":
    main()
