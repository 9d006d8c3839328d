"""MERRA-2 preprocessing CLI: raw GES-DISC collection files → per-day
caches + per-level norm stats (reference capability:
sres/base/source/merra2/preprocess.py driven via cfg().preprocess — the
reference ships no launcher for it; this is the working equivalent).

Usage:
  python scripts/processing/preprocess_merra2.py \
      --platform local --preprocess merra2-sres --dataset merra2 \
      --task merra2-sr --model rcan-10-20-64 \
      [--year-range 2000 2001 | --start 2000-01-01 --ndays 31] [--reprocess]
"""
from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime, timedelta

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default="local")
    ap.add_argument("--preprocess", default="merra2-sres")
    ap.add_argument("--dataset", default="merra2")
    ap.add_argument("--task", default="merra2-sr")
    ap.add_argument("--model", default="rcan-10-20-64")
    ap.add_argument("--year-range", type=int, nargs=2, default=None)
    ap.add_argument("--start", default=None, help="YYYY-MM-DD")
    ap.add_argument("--ndays", type=int, default=1)
    ap.add_argument("--reprocess", action="store_true")
    ap.add_argument("overrides", nargs="*",
                    help="dot-key overrides: dataset.dataset_root=/data/merra2")
    args = ap.parse_args()
    ccustom = {}
    for ov in args.overrides:
        k, v = ov.split("=", 1)
        try:
            v = eval(v, {}, {})
        except Exception:
            pass
        ccustom[k] = v

    from sres_tpu.config import ConfigContext
    from sres_tpu.data.merra2_preprocess import MERRA2DataProcessor
    from sres_tpu.util.dates import date_list, year_date_range

    with ConfigContext("sres", platform=args.platform, task=args.task,
                       model=args.model, dataset=args.dataset,
                       preprocess=args.preprocess, **ccustom) as _:
        from sres_tpu.config import cfg
        if args.start is not None:
            dates = date_list(datetime.strptime(args.start, "%Y-%m-%d"), args.ndays)
        else:
            yr = args.year_range or list(cfg().preprocess.year_range)
            dates = year_date_range(*yr)
        proc = MERRA2DataProcessor()
        written = proc.process_dates(dates, reprocess=args.reprocess)
        print(f"preprocess_merra2: {written} cache files written "
              f"({len(dates)} dates) under {cfg().platform.processed}/"
              f"{cfg().preprocess.dataset_version}")


if __name__ == "__main__":
    main()
