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


def run_ours(task: str, dataset: str, model: str, platform: str,
             nepochs: int, seed: int, overrides: List[str]) -> str:
    """Train our framework; returns the loss-CSV path it wrote."""
    from sres_tpu.config import ConfigContext, cfg
    from sres_tpu.trainer import ModelTrainer
    from sres_tpu.trainer.results import ResultsAccumulator

    ConfigContext.set_defaults(platform=platform, task=task,
                               dataset=dataset, pipeline="sres")
    over = {}
    for kv in overrides:
        k, v = kv.split("=", 1)
        try:
            v = eval(v, {}, {})     # literal values (same as train.py CLI)
        except Exception:
            pass
        over[k] = v
    with ConfigContext("sres", model=model, **over) as cc:
        trainer = ModelTrainer(cc, seed=seed)
        # reference nepochs quirk: refresh runs nepochs-1 epochs
        trainer.train(nepochs + 1, refresh_state=True, seed=seed)
        return ResultsAccumulator(cc).result_file_path()


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
                        "synthetic dataset and diff its CSV against itself")
    p.add_argument("--override", action="append", default=[],
                   help="extra dot-key config overrides (k=v)")
    a = p.parse_args()

    if a.dry_run:
        import tempfile
        root = tempfile.mkdtemp(prefix="parity_dry_")
        ours_csv = run_ours(
            "synthetic-tiles-48", "synthetic", "edsr", "local", 2, a.seed,
            [f"platform.root={root}", "pipeline.device=cpu",
             "model.nfeatures=8", "model.nlayers=1",
             "task.ttsplit={'train':0.75,'valid':0.25,'test':0.0}",
             "pipeline.precision=f32"] + a.override)
        ref_csv = a.ref_csv or ours_csv     # self-diff validates the machinery
    elif a.ours_csv:
        ours_csv, ref_csv = a.ours_csv, a.ref_csv
    else:
        if not a.ref_csv:
            print(json.dumps({"error": "--ref-csv required (or --dry-run)"}))
            sys.exit(2)
        ours_csv = run_ours(a.task, a.dataset, a.model, a.platform,
                            a.nepochs, a.seed, a.override)
        ref_csv = a.ref_csv

    report = diff(read_losses_csv(ours_csv), read_losses_csv(ref_csv),
                  a.tolerance)
    report["ours_csv"], report["ref_csv"] = ours_csv, ref_csv
    print(json.dumps(report))
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
