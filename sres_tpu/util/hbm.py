"""HBM footprint accounting and budget guards.

The axon tunnel returns no runtime ``memory_stats()`` (hbm_peak_gb = -1),
but AOT ``Compiled.memory_analysis()`` works through it — so the footprint
of a step executable is knowable BEFORE the first dispatch. The flagship
train step at batch 72 measures 15.65 GB of a v5e's 16 GB (round 3), one
feature away from OOM: these guards turn that cliff into an explicit,
testable budget. Replaces the reference's CUDA memory snapshots
(/root/reference/sres/base/gpu.py:23-33) with a compile-time contract.
"""
from __future__ import annotations

from typing import Optional

# v5e HBM per chip; overridable per call for other parts
V5E_HBM_GB = 16.0
# leave room for XLA runtime scratch, infeed buffers, and the next feature
DEFAULT_HEADROOM_GB = 0.25


class HBMBudgetError(RuntimeError):
    pass


def compiled_hbm_gb(compiled) -> float:
    """Total device-memory footprint (GB) of a jax ``Compiled`` executable:
    arguments + outputs + temporaries − aliased (donated) buffers."""
    ma = compiled.memory_analysis()
    tot = (ma.argument_size_in_bytes + ma.output_size_in_bytes
           + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    return round(tot / 1e9, 3)


def assert_fits(gb: float, label: str, budget_gb: float = V5E_HBM_GB,
                headroom_gb: float = DEFAULT_HEADROOM_GB) -> float:
    """Raise HBMBudgetError when a step's footprint exceeds the budget
    (minus headroom); returns the headroom left (GB) otherwise."""
    limit = budget_gb - headroom_gb
    if gb > limit:
        raise HBMBudgetError(
            f"{label}: step executable needs {gb:.3f} GB > "
            f"{limit:.3f} GB budget ({budget_gb:g} GB HBM - "
            f"{headroom_gb:g} GB headroom). Reduce batch / enable remat "
            f"(model.remat_trunk) / drop SRES_WINO_STASH_PRIMAL.")
    return round(limit - gb, 3)


def check_step_fits(fn, *sample, label: str = "train step",
                    budget_gb: Optional[float] = None) -> float:
    """Lower+compile ``fn`` on the current backend and assert its footprint
    fits. Returns the measured GB. Works through the axon tunnel."""
    compiled = fn.lower(*sample).compile()
    gb = compiled_hbm_gb(compiled)
    assert_fits(gb, label, budget_gb if budget_gb is not None else V5E_HBM_GB)
    return gb
