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
