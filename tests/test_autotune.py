"""Batch autotuner: search logic (analytic probes) + one real compiled
probe through the CLI machinery (util/autotune.py, scripts/autotune_batch.py).

The reference sizes batches by hand in its task yamls and discovers OOM at
runtime (/root/reference/sres/config/task/*.yaml batch_size); here the
largest fitting batch is found at compile time via AOT memory_analysis.
"""
from __future__ import annotations

import json
import subprocess
import sys

import pytest

from sres_tpu.util.autotune import max_batch_fit


def test_exact_boundary():
    # 0.1 GB/batch, limit 9.55 -> largest multiple of 8 with 0.1*b <= 9.55 = 88
    calls = []

    def probe(b):
        calls.append(b)
        return 0.1 * b

    batch, gb, probed = max_batch_fit(probe, budget_gb=10.0, headroom_gb=0.45,
                                      lo=8, hi=1024, quantum=8)
    assert batch == 88 and abs(gb - 8.8) < 1e-9
    assert all(b % 8 == 0 for b in calls)
    # O(log): exponential bracket 8..128 (5) + bisect 64..128 (<=3)
    assert len(calls) <= 9
    assert probed[batch] == gb


def test_all_fit_returns_hi():
    batch, gb, _ = max_batch_fit(lambda b: 0.001 * b, budget_gb=16.0,
                                 lo=8, hi=512, quantum=8)
    assert batch == 512


def test_none_fit_returns_zero():
    batch, gb, probed = max_batch_fit(lambda b: 100.0, budget_gb=16.0,
                                      lo=8, hi=512)
    assert batch == 0 and list(probed) == [8]


def test_probe_exception_counts_as_oom():
    def probe(b):
        if b > 40:
            raise RuntimeError("RESOURCE_EXHAUSTED")
        return 1.0

    batch, gb, _ = max_batch_fit(probe, budget_gb=16.0, lo=8, hi=1024,
                                 quantum=8)
    assert batch == 40


def test_quantum_respected():
    batch, _, probed = max_batch_fit(lambda b: 0.1 * b, budget_gb=10.0,
                                     headroom_gb=0.0, lo=12, hi=1200,
                                     quantum=12)
    assert batch == 96  # largest multiple of 12 with 0.1*b <= 10 is 96
    assert all(b % 12 == 0 for b in probed)


def test_bad_quantum_raises():
    with pytest.raises(ValueError):
        max_batch_fit(lambda b: 1.0, quantum=0)


def test_non_oom_probe_error_propagates():
    """A bug in the probe (bad config, shape mismatch) must surface — only
    memory exhaustion reads as 'does not fit'."""
    def probe(b):
        raise TypeError("bad model config")

    with pytest.raises(TypeError):
        max_batch_fit(probe, budget_gb=16.0)


def test_lo_rounds_up_never_below_callers_minimum():
    batch, _, probed = max_batch_fit(lambda b: 0.1 * b, budget_gb=16.0,
                                     lo=12, hi=1024, quantum=8)
    assert min(probed) == 16          # 12 rounds UP to the lattice, not down
    assert batch == 152
    with pytest.raises(ValueError):   # no lattice point inside [lo, hi]
        max_batch_fit(lambda b: 1.0, lo=33, hi=40, quantum=16)


@pytest.mark.parametrize("mode", ["train", "eval"])
def test_cli_tiny_real_probe(mode):
    """The CLI's compiled probes on CPU: monotone footprints and a valid
    recommendation for the scaled-down flagship under a small budget."""
    r = subprocess.run(
        [sys.executable, "scripts/autotune_batch.py", "--cpu", "--tiny",
         "--mode", mode, "--lo", "8", "--hi", "64", "--quantum", "8",
         "--budget-gb", "1.0", "--headroom-gb", "0.0"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["recommended_batch"] > 0
    assert res["hbm_gb"] <= 1.0
