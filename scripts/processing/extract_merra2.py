"""Download + assemble one day of MERRA2 into the 20-channel H5 input
(reference: /root/reference/sres/base/source/merra2/contrib/extract_merra2.py).

Credentials come from the NASA Earthdata environment variables the reference
uses (EDUSER / EDPSWD). Requires pydap for the network path (not baked into
this image); the extraction/interp/H5 chain itself is network-free and
mock-tested (tests/test_merra2_acquire.py).

  EDUSER=... EDPSWD=... python scripts/processing/extract_merra2.py \
      --timestamp 20210829 [--out MERRA_20210829.h5]

Days produced here feed the yearly-H5 datapipe (sres_tpu/data/merra2_h5.py)
after concatenation over the year.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..")))

from sres_tpu.data.merra2_acquire import acquire_day, open_url_pydap


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--timestamp", required=True, help="YYYYMMDD[HH]")
    p.add_argument("--out", default="", help="output file (default MERRA_<ts>.h5)")
    p.add_argument("--nlat", type=int, default=720)
    p.add_argument("--nlon", type=int, default=1440)
    p.add_argument("--stream", default=None,
                   help="GES-DISC stream (e.g. MERRA2_401); default infers "
                        "the decade stream (MERRA2_100/200/300/400) from "
                        "the date")
    args = p.parse_args()

    user = os.environ.get("EDUSER")
    pswd = os.environ.get("EDPSWD")
    if not user or not pswd:
        sys.exit("set EDUSER / EDPSWD (NASA Earthdata credentials)")
    out = args.out or f"MERRA_{args.timestamp}.h5"
    opener = open_url_pydap(user, pswd)
    path = acquire_day(args.timestamp, out, opener,
                       nlat=args.nlat, nlon=args.nlon, stream=args.stream)
    print(path)


if __name__ == "__main__":
    main()
