"""Compile-time batch autotuning against the HBM budget.

The flagship train step sits 0.36 GB from the v5e cliff at batch 72
(PERF.md round-4 HBM table) — picking the batch for a new model / tile
size / feature combination by trial OOM wastes tunnel round-trips and, on
the axon backend, surfaces as an opaque RESOURCE_EXHAUSTED mid-run. The
reference sizes batches by hand per task yaml and discovers OOM at runtime
(/root/reference/sres/config/task/*.yaml batch_size; sres/base/gpu.py only
prints snapshots after the fact).

Here the search runs entirely at compile time: ``Compiled.memory_analysis()``
works through the axon tunnel (util/hbm.py), so the largest fitting batch is
knowable before the first step is dispatched. Footprint is monotone
non-decreasing in batch (arguments, activations and temporaries all scale
with it; params/optimizer state are constant), so an exponential bracket +
binary search needs only O(log) compiles.

CLI: scripts/autotune_batch.py. Tests: tests/test_autotune.py.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from sres_tpu.util.hbm import DEFAULT_HEADROOM_GB, V5E_HBM_GB


def max_batch_fit(probe_gb: Callable[[int], float],
                  budget_gb: float = V5E_HBM_GB,
                  headroom_gb: float = DEFAULT_HEADROOM_GB,
                  lo: int = 8, hi: int = 4096, quantum: int = 8,
                  ) -> Tuple[int, float, Dict[int, float]]:
    """Largest batch in [lo, hi] (a multiple of ``quantum``) whose step
    footprint ``probe_gb(batch)`` fits ``budget_gb - headroom_gb``.

    ``probe_gb`` raising (backend OOM during compile) counts as not fitting.
    Returns ``(batch, gb, probed)`` with every probe's result; ``batch`` is 0
    when even ``lo`` does not fit. Monotonicity of the footprint in batch is
    assumed (true for batched steps: weights are batch-constant, everything
    else scales linearly).
    """
    if quantum < 1:
        raise ValueError(f"quantum must be >= 1, got {quantum}")
    limit = budget_gb - headroom_gb
    lo = max(quantum, (lo // quantum) * quantum)
    hi = max(lo, (hi // quantum) * quantum)
    probed: Dict[int, float] = {}

    def fits(b: int) -> bool:
        try:
            probed[b] = probe_gb(b)
        except Exception:
            probed[b] = float("inf")
        return probed[b] <= limit

    if not fits(lo):
        return 0, probed[lo], probed
    # exponential bracket: grow from lo until over budget or past hi
    good, cand = lo, lo
    while cand < hi:
        cand = min(hi, cand * 2)
        if fits(cand):
            good = cand
            if cand == hi:
                return good, probed[good], probed
        else:
            break
    else:
        return good, probed[good], probed
    # binary search in (good, cand) on the quantum lattice
    bad = cand
    while bad - good > quantum:
        mid = ((good + bad) // 2 // quantum) * quantum
        if mid in (good, bad):
            break
        if fits(mid):
            good = mid
        else:
            bad = mid
    return good, probed[good], probed


def step_probe(build_step: Callable[[int], Tuple[Callable, tuple]],
               ) -> Callable[[int], float]:
    """Adapt a ``batch -> (jitted_fn, sample_args)`` builder into a
    ``batch -> footprint GB`` probe (lower + backend compile, no dispatch)."""
    from sres_tpu.util.hbm import compiled_hbm_gb

    def probe(batch: int) -> float:
        fn, sample = build_step(batch)
        return compiled_hbm_gb(fn.lower(*sample).compile())

    return probe
