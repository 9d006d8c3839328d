"""Opt-in slow region-scale two-stack parity test (round-5 verdict item #2).

Runs scripts/validate_region_parity.py end-to-end on a generated SWOT-format
region: OUR full stack trained + the reference's torch module replay from
identical init, assembled-image NetCDF diff, PSNR deltas, scaling sweep.
~2-4 min on CPU at the test scale; SRES_SLOW=1 enables it (the full
960x1280 default is the recorded PARITY.md run)."""
import json
import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(os.environ.get("SRES_SLOW") != "1",
                    reason="slow two-stack region run; set SRES_SLOW=1")
def test_region_scale_two_stack_parity():
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "/root/repo/scripts/validate_region_parity.py",
         "--nx", "128", "--nepochs", "2"],
        capture_output=True, text=True, timeout=3000, env=env)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["pass"] is True
    assert rep["batches"]["train"] > 0 and rep["batches"]["eval"] > 0
    assert rep["trajectory"]["max_rel_loss_delta"] < 1e-3
    inf = rep["inference"]
    assert inf["files_compared"] >= 2
    for entry in inf["files"].values():
        assert entry["vars"]["model"]["rel_rms_delta"] < 1e-4
        assert abs(entry["psnr_delta_db"]) < 0.01
    assert rep["sweep"]["pass"] is True
