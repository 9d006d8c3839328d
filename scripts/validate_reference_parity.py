"""Real-data parity validation kit (round-2 verdict item #9 / ROADMAP #4).

When the SWOT data paths mount, this script (a) trains/evaluates OUR
framework on the chosen task — producing the loss CSV in the reference's
exact format (``{dataset}_{task}_{model}_losses.csv``,
trainer/results.py) — and (b) diffs the per-epoch train/val loss and loss%%
trajectories and PSNR against a CSV produced by the REFERENCE's run of the
same recipe (its ResultsAccumulator writes the identical format:
/root/reference/sres/model/manager.py:117-183, rows
``tset, fractional_epoch, loss, interp_loss``).

Usage (real data):
  # 1. run the reference in its own environment, e.g.
  #      python scripts/train/train-rcan-swot-1.1v_20-20e.py
  #    → {processed}/…_result_recs/…_losses.csv
  # 2. run ours + the diff:
  python scripts/validate_reference_parity.py \
      --task SST-tiles-48 --dataset swot_20-20e --model rcan-10-20-64 \
      --nepochs 10 --seed 42 --ref-csv /path/to/reference_losses.csv

Diff only (both CSVs already exist):
  python scripts/validate_reference_parity.py --ours-csv A.csv --ref-csv B.csv

Dry run (no data mounts needed; exercised by tests/test_workflow.py):
  python scripts/validate_reference_parity.py --dry-run

Prints ONE JSON line: per-tset trajectory deltas, final loss%% both sides,
PSNR deltas, and a pass/fail against ``--tolerance`` (default 2%% relative
on the final epoch's loss).
"""
from __future__ import annotations

import argparse
import csv
import json
import math
import os
import sys
from typing import Dict, List, Tuple

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

Rows = Dict[str, List[Tuple[float, float, float]]]   # tset → [(epoch, loss, ref_loss)]


def read_losses_csv(path: str) -> Rows:
    out: Rows = {}
    with open(path) as f:
        for row in csv.reader(f, delimiter=",", quotechar="|"):
            if len(row) < 4:
                continue
            tset, epoch, loss, ref = row[0], float(row[1]), float(row[2]), float(row[3])
            out.setdefault(tset, []).append((epoch, loss, ref))
    for v in out.values():
        v.sort()
    return out


def per_epoch(series: List[Tuple[float, float, float]]) -> Dict[int, Tuple[float, float]]:
    """Collapse fractional-epoch rows to per-epoch means of (loss, interp)."""
    acc: Dict[int, List[Tuple[float, float]]] = {}
    for e, l, r in series:
        acc.setdefault(int(math.ceil(e + 1e-9)), []).append((l, r))
    return {e: (sum(x[0] for x in v) / len(v), sum(x[1] for x in v) / len(v))
            for e, v in acc.items()}


def diff(ours: Rows, ref: Rows, tolerance: float) -> Dict:
    report: Dict = {"tsets": {}, "pass": True}
    for tset in sorted(set(ours) & set(ref)):
        a, b = per_epoch(ours[tset]), per_epoch(ref[tset])
        common = sorted(set(a) & set(b))
        if not common:
            continue
        rel = [abs(a[e][0] - b[e][0]) / max(b[e][0], 1e-12) for e in common]
        e_last = common[-1]
        lp = lambda le: 100.0 * le[0] / max(le[1], 1e-12)     # loss%% metric
        psnr = lambda le: -20.0 * math.log10(max(le[0], 1e-12))
        report["tsets"][tset] = {
            "epochs_compared": len(common),
            "mean_rel_loss_delta": round(sum(rel) / len(rel), 5),
            "final_rel_loss_delta": round(rel[-1], 5),
            "final_loss_pct_ours": round(lp(a[e_last]), 3),
            "final_loss_pct_ref": round(lp(b[e_last]), 3),
            "final_psnr_ours_db": round(psnr(a[e_last]), 3),
            "final_psnr_ref_db": round(psnr(b[e_last]), 3),
            "final_psnr_delta_db": round(psnr(a[e_last]) - psnr(b[e_last]), 4),
        }
        if rel[-1] > tolerance:
            report["pass"] = False
    if not report["tsets"]:
        report["pass"] = False
        report["error"] = "no overlapping (tset, epoch) rows to compare"
    return report


def _parse_overrides(overrides: List[str]) -> Dict:
    over = {}
    for kv in overrides:
        k, v = kv.split("=", 1)
        try:
            v = eval(v, {}, {})     # literal values (same as train.py CLI)
        except Exception:
            pass
        over[k] = v
    return over


def run_ours(task: str, dataset: str, model: str, platform: str,
             nepochs: int, seed: int, overrides: List[str],
             inference_timesteps: int = 0) -> Tuple[str, str]:
    """Train our framework; returns (loss-CSV path, inference dir). When
    ``inference_timesteps`` > 0, also runs tiled + assembled-image inference
    for each timestep and saves the NetCDF artifacts (the reference's
    save_inference_results format — sres/data/inference.py:24-50)."""
    from sres_tpu.config import ConfigContext, cfg
    from sres_tpu.controller import ResultStructure, WorkflowController
    from sres_tpu.trainer import ModelTrainer
    from sres_tpu.trainer.results import ResultsAccumulator

    ConfigContext.set_defaults(platform=platform, task=task,
                               dataset=dataset, pipeline="sres")
    over = _parse_overrides(overrides)
    with ConfigContext("sres", model=model, **over) as cc:
        trainer = ModelTrainer(cc, seed=seed)
        # reference nepochs quirk: refresh runs nepochs-1 epochs
        trainer.train(nepochs + 1, refresh_state=True, seed=seed)
        csv_path = ResultsAccumulator(cc).result_file_path()
        inference_dir = f"{cfg().platform.results}/inference"
        if inference_timesteps > 0:
            wc = WorkflowController(
                "sres", dict(platform=platform, task=task, dataset=dataset,
                             pipeline="sres"), seed=seed)
            wc.init_context(cc, model)
            wc.trainer = trainer
            for ts in range(inference_timesteps):
                wc.inference(ts, ResultStructure.Tiles, save=True)
                wc.inference(ts, ResultStructure.Image, save=True)
        return csv_path, inference_dir


def read_inference_nc(path: str) -> Tuple[Dict[str, "np.ndarray"], Dict[str, float]]:
    """Read one inference NetCDF (either framework's — same format) without
    a config context."""
    import numpy as np
    from scipy.io import netcdf_file

    f = netcdf_file(path, "r", mmap=False)
    losses: Dict[str, float] = {}
    try:
        keys = f.loss_keys.decode() if isinstance(f.loss_keys, bytes) else f.loss_keys
        losses = dict(zip(keys.split(","),
                          np.asarray(f.loss_values, np.float64).tolist()))
    except AttributeError:
        pass
    data = {name: np.array(var[:], np.float32)
            for name, var in f.variables.items()}
    f.close()
    return data, losses


def diff_inference_dirs(ours_dir: str, ref_dir: str, tolerance: float) -> Dict:
    """Diff two inference NetCDF trees file-by-file: per-variable normalized
    RMS deltas, assembled PSNR (model vs target) both sides, loss attrs.
    Matches the reference's artifact contents (inference.py:24-50); the
    'image' files carry the assembled region, so their PSNR delta is the
    assembled-region PSNR parity number."""
    import glob
    import numpy as np

    report: Dict = {"files_compared": 0, "files": {}, "pass": True}
    ref_files = {os.path.relpath(p, ref_dir): p
                 for p in glob.glob(f"{ref_dir}/**/*.nc", recursive=True)}
    ours_files = {os.path.relpath(p, ours_dir): p
                  for p in glob.glob(f"{ours_dir}/**/*.nc", recursive=True)}
    for rel in sorted(set(ref_files) & set(ours_files)):
        a_data, a_loss = read_inference_nc(ours_files[rel])
        b_data, b_loss = read_inference_nc(ref_files[rel])
        entry: Dict = {"vars": {}, "losses": {}}

        def rms2(x, y):
            """NaN-aware RMS of (x − y) over jointly-finite entries (the
            assembled region carries NaN over land/NaN tiles, exactly like
            the reference's artifacts)."""
            m = np.isfinite(x) & np.isfinite(y)
            if not m.any():
                return 0.0
            d = (x[m] - y[m]).astype(np.float64)
            return float(np.sqrt(np.mean(np.square(d))))

        def psnr(d):
            if "model" not in d or "target" not in d or \
                    d["model"].shape != d["target"].shape:
                return None
            return round(-20.0 * math.log10(
                max(rms2(d["model"], d["target"]), 1e-12)), 3)

        for vn in sorted(set(a_data) & set(b_data)):
            if a_data[vn].shape != b_data[vn].shape:
                entry["vars"][vn] = {"error": f"shape {a_data[vn].shape} vs "
                                              f"{b_data[vn].shape}"}
                report["pass"] = False
                continue
            if not (np.isfinite(a_data[vn]) == np.isfinite(b_data[vn])).all():
                entry["vars"][vn] = {"error": "NaN masks differ"}
                report["pass"] = False
                continue
            nrms = rms2(a_data[vn], b_data[vn]) / \
                (rms2(b_data[vn], np.zeros_like(b_data[vn])) + 1e-12)
            entry["vars"][vn] = {"rel_rms_delta": round(nrms, 6)}
            if vn == "model" and not nrms <= tolerance:
                report["pass"] = False
        pa, pb = psnr(a_data), psnr(b_data)
        if pa is not None and pb is not None:
            entry["psnr_ours_db"], entry["psnr_ref_db"] = pa, pb
            entry["psnr_delta_db"] = round(pa - pb, 4)
        for k in sorted(set(a_loss) & set(b_loss)):
            d = abs(a_loss[k] - b_loss[k]) / max(abs(b_loss[k]), 1e-12)
            entry["losses"][k] = {"ours": round(a_loss[k], 6),
                                  "ref": round(b_loss[k], 6),
                                  "rel_delta": round(d, 6)}
            if not d <= tolerance:     # NaN-safe: NaN fails
                report["pass"] = False
        report["files"][rel] = entry
        report["files_compared"] += 1
    if not report["files_compared"]:
        report["pass"] = False
        report["error"] = "no overlapping .nc artifacts to compare"
    return report


def run_scaling_sweep(task: str, dataset: str, model: str, platform: str,
                      seed: int, overrides: List[str], factors: List[float],
                      nts: int) -> Dict[str, float]:
    """The reference's downsample-robustness sweep (scripts/inference/
    scaling_results-swot-1.1v_20-20e.py:26-44): per data_downsample factor,
    mean loss%% (model/interpolated × 100) over ``nts`` timesteps, loading
    the best-val checkpoint. Returns {factor: mean_loss_pct}."""
    import numpy as np

    from sres_tpu.config import ConfigContext
    from sres_tpu.controller import ResultStructure, WorkflowController
    from sres_tpu.trainer import ModelTrainer

    ConfigContext.set_defaults(platform=platform, task=task,
                               dataset=dataset, pipeline="sres")
    over = _parse_overrides(overrides)
    out: Dict[str, float] = {}
    for dsf in factors:
        with ConfigContext("sres", model=model, **over,
                           **{"task.data_downsample": dsf,
                              "task.xyflip": False}) as cc:
            wc = WorkflowController(
                "sres", dict(platform=platform, task=task, dataset=dataset,
                             pipeline="sres"), seed=seed)
            wc.init_context(cc, model)
            wc.trainer = ModelTrainer(cc, seed=seed)
            ratios = []
            for ts in range(nts):
                _, losses = wc.inference(ts, ResultStructure.Tiles,
                                         save=False)
                for vn, ld in losses.items():
                    ratios.append(100.0 * ld["model"] / ld["interpolated"])
            out[f"{dsf:.2f}"] = round(float(np.mean(ratios)), 4)
    return out


def diff_sweeps(ours: Dict[str, float], ref: Dict[str, float],
                tolerance: float) -> Dict:
    report: Dict = {"ours": ours, "ref": ref, "pass": True, "deltas": {}}
    common = sorted(set(ours) & set(ref))
    if not common:
        return {"ours": ours, "ref": ref, "pass": False,
                "error": "no overlapping sweep factors"}
    for k in common:
        d = abs(ours[k] - ref[k]) / max(abs(ref[k]), 1e-12)
        report["deltas"][k] = round(d, 6)
        if d > tolerance:
            report["pass"] = False
    return report


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="SST-tiles-48")
    p.add_argument("--dataset", default="swot_20-20e")
    p.add_argument("--model", default="rcan-10-20-64")
    p.add_argument("--platform", default="explore")
    p.add_argument("--nepochs", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--ref-csv", default="",
                   help="loss CSV written by the REFERENCE's run")
    p.add_argument("--ours-csv", default="",
                   help="skip training; diff this CSV against --ref-csv")
    p.add_argument("--tolerance", type=float, default=0.02,
                   help="relative final-epoch loss delta that still passes")
    p.add_argument("--dry-run", action="store_true",
                   help="synthetic stand-in: train a tiny model on the "
                        "synthetic dataset, run tiled+image inference and a "
                        "2-factor scaling sweep, then self-diff every "
                        "artifact (CSV, NetCDFs, sweep) — exercises all "
                        "comparison branches with zero data mounts")
    p.add_argument("--override", action="append", default=[],
                   help="extra dot-key config overrides (k=v)")
    p.add_argument("--ref-inference-dir", default="",
                   help="REFERENCE inference NetCDF tree "
                        "({results}/inference) to diff against ours")
    p.add_argument("--inference-timesteps", type=int, default=0,
                   help="run+save tiled & image inference for this many "
                        "timesteps after training (required for the NetCDF "
                        "diff unless the artifacts already exist)")
    p.add_argument("--sweep-factors", default="",
                   help="comma list of task.data_downsample factors: run "
                        "the scaling sweep (mean loss%% per factor)")
    p.add_argument("--sweep-timesteps", type=int, default=2)
    p.add_argument("--ref-sweep-json", default="",
                   help="JSON file {factor: mean_loss_pct} from the "
                        "reference's sweep to diff against ours")
    a = p.parse_args()

    inference_report = sweep_report = None
    if a.dry_run:
        import tempfile
        root = tempfile.mkdtemp(prefix="parity_dry_")
        dry_args = ("synthetic-tiles-48", "synthetic", "edsr", "local")
        dry_over = [f"platform.root={root}", "pipeline.device=cpu",
                    "model.nfeatures=8", "model.nlayers=1",
                    "task.ttsplit={'train':0.75,'valid':0.25,'test':0.0}",
                    "pipeline.precision=f32"] + a.override
        ours_csv, inf_dir = run_ours(*dry_args, 2, a.seed, dry_over,
                                     inference_timesteps=1)
        ref_csv = a.ref_csv or ours_csv     # self-diff validates the machinery
        # all three comparison branches, self-diffed (zero deltas expected)
        inference_report = diff_inference_dirs(inf_dir, inf_dir, a.tolerance)
        sweep = run_scaling_sweep(*dry_args, a.seed, dry_over,
                                  [1.0, 1.25], 1)
        sweep_report = diff_sweeps(sweep, dict(sweep), a.tolerance)
    elif a.ours_csv:
        ours_csv, ref_csv = a.ours_csv, a.ref_csv
    else:
        if not a.ref_csv:
            print(json.dumps({"error": "--ref-csv required (or --dry-run)"}))
            sys.exit(2)
        ours_csv, inf_dir = run_ours(a.task, a.dataset, a.model, a.platform,
                                     a.nepochs, a.seed, a.override,
                                     a.inference_timesteps)
        ref_csv = a.ref_csv
        if a.ref_inference_dir:
            inference_report = diff_inference_dirs(
                inf_dir, a.ref_inference_dir, a.tolerance)
        if a.sweep_factors:
            sweep = run_scaling_sweep(
                a.task, a.dataset, a.model, a.platform, a.seed, a.override,
                [float(x) for x in a.sweep_factors.split(",")],
                a.sweep_timesteps)
            ref_sweep = (json.load(open(a.ref_sweep_json))
                         if a.ref_sweep_json else dict(sweep))
            sweep_report = diff_sweeps(
                sweep, {f"{float(k):.2f}": v for k, v in ref_sweep.items()},
                a.tolerance)

    report = diff(read_losses_csv(ours_csv), read_losses_csv(ref_csv),
                  a.tolerance)
    report["ours_csv"], report["ref_csv"] = ours_csv, ref_csv
    if inference_report is not None:
        report["inference"] = inference_report
        report["pass"] = report["pass"] and inference_report["pass"]
    if sweep_report is not None:
        report["sweep"] = sweep_report
        report["pass"] = report["pass"] and sweep_report["pass"]
    print(json.dumps(report))
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
