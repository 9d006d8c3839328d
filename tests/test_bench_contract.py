"""Driver-contract guard: bench.py must print exactly ONE JSON line with the
required fields (the driver records it as BENCH_r{N}.json). Runs a tiny
config on CPU."""
import json
import os
import subprocess
import sys


def test_bench_prints_one_json_line():
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "--cpu", "--f32", "--steps", "2",
         "--warmup", "1", "--batch", "4", "--nlayers", "1", "--nblocks", "2",
         "--nfeatures", "16"],
        capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    blob = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in blob
    assert blob["value"] > 0
    # variance guard (round 4): the headline is the MEDIAN of --windows
    # independently timed windows; the spread must be reported
    wins = blob["detail"]["windows_tps"]
    assert len(wins) == 3 and all(w > 0 for w in wins)
    assert blob["detail"]["window_policy"] == "median"
    assert blob["value"] == sorted(wins)[1]


def test_hbm_audit_machinery_and_budget_guard():
    """scripts/bench/hbm_audit.py (round-3 verdict item #5): per-mode AOT
    memory_analysis footprints with budget enforcement. --tiny exercises the
    full mode matrix fast on CPU; an artificially small budget must RED-LINE
    the over-budget modes (exit 1, over_budget recorded)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "/root/repo/scripts/bench/hbm_audit.py",
         "--cpu", "--tiny"],
        capture_output=True, text=True, timeout=540, env=env)
    assert r.returncode == 0, r.stdout + r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["pass"] is True
    assert set(rep["modes"]) == {"train", "train_packed", "winograd",
                                 "winograd_stash", "int8_fused",
                                 "scan_packed", "eval", "serve"}
    for mode, e in rep["modes"].items():
        assert e.get("hbm_model_gb", -1) > 0, (mode, e)
        assert e.get("headroom_gb", -1) > 0, (mode, e)

    # red-line: a 0.03 GB budget is below every train mode's footprint
    r = subprocess.run(
        [sys.executable, "/root/repo/scripts/bench/hbm_audit.py",
         "--cpu", "--tiny", "--modes", "train", "--budget-gb", "0.03"],
        capture_output=True, text=True, timeout=540, env=env)
    assert r.returncode == 1
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["pass"] is False
    assert "over_budget" in rep["modes"]["train"]


def test_hbm_assert_fits_unit():
    import pytest
    from sres_tpu.util.hbm import HBMBudgetError, assert_fits

    assert assert_fits(15.0, "x") == 0.75
    with pytest.raises(HBMBudgetError, match="15.9"):
        assert_fits(15.9, "flagship b72")


def test_bench_region_prints_one_json_line():
    """bench.py --region GRID (round-5 verdict item #6): the region-inference
    benchmark obeys the same one-JSON-line contract, reports regions/min +
    end-to-end tiles/s, and hits the per-grid-shape jit cache across
    timeslices (asserted inside bench.py — a retrace fails the run)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "--cpu", "--f32",
         "--region", "4", "--windows", "2", "--nlayers", "1", "--nblocks", "2",
         "--nfeatures", "8", "--lane_pack", "1"],
        capture_output=True, text=True, timeout=560, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    blob = json.loads(lines[0])
    assert blob["unit"] == "regions/min" and blob["value"] > 0
    d = blob["detail"]
    assert d["grid"] == 4 and d["hr_px"] == 768 and d["tiles"] == 16
    assert d["tiles_per_s_end_to_end"] > 0
    assert len(d["windows_s"]) == 2


def test_bench_reports_hbm_and_flop_transparency():
    """Round-5 scoring-transparency fields: hbm_peak_gb is filled from AOT
    memory_analysis when the backend lacks memory_stats (tagged by
    hbm_peak_src), and the XLA-counted step FLOPs + sustained rate ride in
    the detail next to the measured-peak reference."""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "--cpu", "--f32", "--steps", "2",
         "--warmup", "1", "--batch", "4", "--nlayers", "1", "--nblocks", "2",
         "--nfeatures", "16", "--windows", "1"],
        capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    d = json.loads(r.stdout.strip().splitlines()[-1])["detail"]
    assert d["hbm_peak_gb"] > 0
    assert d["hbm_peak_src"] in ("memory_stats", "aot_memory_analysis")
    # red-line transparency: over-budget non-headline runs keep their
    # measurement and flag it; the tiny config must be within budget
    assert d["hbm_over_budget"] is False
    assert d["xla_tflops_per_step"] > 0
    # rounds to 0.0 at the tiny CPU config; the field must exist and be
    # non-negative (the real value is asserted by eye in BENCH_r05)
    assert d["tflops_sustained"] >= 0
    assert d["measured_peak_tflops"]["bf16"] == 182.0
