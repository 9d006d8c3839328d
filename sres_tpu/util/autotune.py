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


def _is_oom(exc: BaseException) -> bool:
    """Only memory exhaustion counts as 'does not fit'; anything else (bad
    config, shape mismatch, tunnel failure) must propagate to the caller."""
    s = str(exc).lower()
    return ("resource_exhausted" in s or "out of memory" in s
            or "oom" in s or isinstance(exc, MemoryError))


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
    # lo rounds UP to the lattice (the caller's minimum is honored), hi
    # rounds DOWN (stay within the caller's maximum)
    lo = ((max(1, lo) + quantum - 1) // quantum) * quantum
    hi = (hi // quantum) * quantum
    if hi < lo:
        raise ValueError(f"no multiple of quantum={quantum} in [lo, hi] "
                         f"after rounding (lo={lo}, hi={hi})")
    probed: Dict[int, float] = {}

    def fits(b: int) -> bool:
        try:
            probed[b] = probe_gb(b)
        except Exception as exc:
            if not _is_oom(exc):
                raise  # a real bug in the probe must surface, not read as OOM
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


def build_mode_step(model, optimizer, state, has_bn: bool, sc, mesh,
                    mode: str, batch: int) -> Tuple[Callable, tuple]:
    """``(jittable fn, sample args)`` for a bench/audit mode — the single
    home for the step scaffolding shared by scripts/autotune_batch.py and
    scripts/bench/hbm_audit.py (serve-path shardings, has_bn handling, HR
    sizing from the step config) so the two CLIs cannot drift.

    mode: 'train' (uses ``optimizer`` as passed — packed or per-leaf),
    'eval', or 'serve'. HR inputs are (B, C, 48*scale, 48*scale) channel-
    first like the trainer's; serve takes NHWC LR tiles.
    """
    import jax
    import jax.numpy as jnp

    from sres_tpu.parallel.mesh import batch_sharding, replicated
    from sres_tpu.trainer.step import build_eval_step, build_train_step

    if mode == "serve":
        variables = {"params": state.params}
        if has_bn and state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False),
                      in_shardings=(replicated(mesh), batch_sharding(mesh)),
                      out_shardings=batch_sharding(mesh))
        lr = jnp.zeros((batch, 48, 48, sc.nchannels_in), jnp.float32)
        return fwd, (variables, lr)
    hr_px = 48 * sc.scale
    hr = jnp.zeros((batch, sc.nchannels_in, hr_px, hr_px), jnp.float32)
    w = jnp.ones((batch,), jnp.float32)
    if mode == "eval":
        return build_eval_step(model, sc, mesh), (state, hr, w)
    if mode != "train":
        raise ValueError(f"unknown mode '{mode}' (train|eval|serve)")
    return build_train_step(model, optimizer, sc, mesh), (state, hr, w)


def step_probe(build_step: Callable[[int], Tuple[Callable, tuple]],
               ) -> Callable[[int], float]:
    """Adapt a ``batch -> (jitted_fn, sample_args)`` builder into a
    ``batch -> footprint GB`` probe (lower + backend compile, no dispatch)."""
    from sres_tpu.util.hbm import compiled_hbm_gb

    def probe(batch: int) -> float:
        fn, sample = build_step(batch)
        return compiled_hbm_gb(fn.lower(*sample).compile())

    return probe


def resolve_auto_batch(mesh, budget_gb: Optional[float] = None,
                       headroom_gb: Optional[float] = None,
                       hi: int = 1024) -> int:
    """Resolve ``task.batch_size: auto`` from the active config: the largest
    batch (multiple of max(8, mesh data size)) whose compiled TRAIN step fits
    the HBM budget, found entirely at trace/compile time via AOT
    ``memory_analysis()`` — no step is dispatched, so the search cannot OOM
    the device (VERDICT r4 item #7). Budget defaults come from
    ``pipeline.hbm_budget_gb`` / ``pipeline.hbm_headroom_gb`` when set.

    Builds a throwaway model/optimizer/state from cfg() (temporal features
    are omitted: their per-batch footprint is a few floats). The resolved
    value must be written back into ``cfg().task['batch_size']`` by the
    caller so loaders see an int.
    """
    import jax.numpy as jnp

    from sres_tpu.config import cfg
    from sres_tpu.models import build_model
    from sres_tpu.trainer.step import (build_optimizer, build_train_step,
                                       init_state, make_step_config)

    task = cfg().task
    pipeline = cfg().pipeline
    if budget_gb is None:
        budget_gb = float(pipeline.get("hbm_budget_gb", V5E_HBM_GB))
    if headroom_gb is None:
        headroom_gb = float(pipeline.get("hbm_headroom_gb",
                                         DEFAULT_HEADROOM_GB))
    nin = len(list(task.input_variables))
    nout = len(list(task.target_variables))
    precision = pipeline.get("precision", "bf16")
    model = build_model(cfg().model, nin, nout, precision=precision)
    optimizer = build_optimizer(task, packed=bool(pipeline.get("packed_opt",
                                                               False)))
    tsz = task.tile_size
    sample_lr = jnp.zeros((1, tsz["y"], tsz["x"], nin), jnp.float32)
    state, has_bn = init_state(model, optimizer, sample_lr, 0)
    sc = make_step_config(task, cfg().model, has_bn)
    # Probe the SAME program the trainer will dispatch: shard_map,
    # steps_per_dispatch (scanned K-step) and grad_accum (K micro-batch)
    # modes stage K extra input batches and carry different donated layouts,
    # so probing the plain single-step executable would resolve a batch
    # that OOMs the real dispatch (mirrors ModelTrainer.__init__).
    smap = bool(pipeline.get("shard_map", False))
    spd = max(1, int(pipeline.get("steps_per_dispatch", 1)))
    accum = max(1, int(pipeline.get("grad_accum", 1)))
    K = max(spd, accum)
    if K > 1:
        from sres_tpu.trainer.step import (build_accum_train_step,
                                           build_multi_train_step)
        builder = build_accum_train_step if accum > 1 else build_multi_train_step
        step = builder(model, optimizer, sc, mesh, smap=smap)
    else:
        step = build_train_step(model, optimizer, sc, mesh, smap=smap)
    hr_y, hr_x = tsz["y"] * sc.scale, tsz["x"] * sc.scale

    def build_step(batch: int):
        bshape = (K, batch) if K > 1 else (batch,)
        hr = jnp.zeros(bshape + (nin, hr_y, hr_x), jnp.float32)
        w = jnp.ones(bshape, jnp.float32)
        return step, (state, hr, w)

    import math as _math
    ndata = mesh.shape.get("data", 1)
    # multiple of BOTH the 8-lattice and the data-mesh size: every probed
    # batch must shard evenly over the 'data' axis (ndata=6 would otherwise
    # probe indivisible batches and die on a sharding error, not an OOM)
    quantum = _math.lcm(8, ndata)
    batch, gb, probed = max_batch_fit(
        step_probe(build_step), budget_gb=budget_gb, headroom_gb=headroom_gb,
        lo=quantum, hi=hi, quantum=quantum)
    if batch == 0:
        from sres_tpu.util.hbm import HBMBudgetError
        raise HBMBudgetError(
            f"task.batch_size=auto: even batch {quantum} needs {gb:.3f} GB "
            f"> budget {budget_gb - headroom_gb:.3f} GB — shrink the model "
            f"or enable model.remat_trunk")
    from sres_tpu.util.logging import lgm
    lgm().log(f"task.batch_size=auto resolved to {batch} "
              f"({probed.get(batch, float('nan')):.3f} GB of "
              f"{budget_gb:g} GB budget, {len(probed)} compile probes)",
              display=True)
    return batch
