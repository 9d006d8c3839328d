"""Scanned multi-batch train step (trainer/step.py:build_multi_train_step):
K optimizer steps in one dispatch must match K sequential single-step
dispatches exactly (same math, scan is only a dispatch-amortization).

Kept tiny: XLA:CPU executes conv thunks single-threaded inside while loops,
so large shapes here would dominate suite wall time (TPU is unaffected —
measured 228 ms/step steady-state, identical to the per-dispatch path).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sres_tpu.models import build_model
from sres_tpu.parallel.mesh import get_mesh
from sres_tpu.trainer.step import (StepConfig, build_multi_train_step,
                                   build_train_step, init_state)


def _setup(lane_pack=1):
    mcfg = dict(name="rcan", nfeatures=8, nlayers=2, nblocks=2, cbottleneck=2,
                kernel_size=3, downscale_factors=[2, 2], loss_fn="l2",
                lane_pack=lane_pack)
    model = build_model(mcfg, 1, 1, precision="f32")
    opt = optax.adam(1e-3)
    state, has_bn = init_state(model, opt, jnp.zeros((1, 12, 12, 1), jnp.float32),
                               seed=0)
    sc = StepConfig(scale=4, downscale_factors=(2, 2), down_mode="bicubic",
                    up_mode="bicubic", loss_fn="l2", data_downsample=1.0,
                    target_idx=(0,), nchannels_in=1, has_bn=has_bn)
    return model, opt, state, sc


@pytest.mark.parametrize("lane_pack", [1, 2])
def test_scan_matches_sequential(lane_pack):
    model, opt, state, sc = _setup(lane_pack)
    mesh = get_mesh({"data": -1})
    step = build_train_step(model, opt, sc, mesh)
    multi = build_multi_train_step(model, opt, sc, mesh)
    # both builders donate the state: give each its own copy
    copy = jax.jit(lambda s: jax.tree.map(lambda x: x + 0, s))
    state_b = copy(state)

    rng = np.random.default_rng(0)
    K, B = 3, 16
    hrs = rng.normal(size=(K, B, 1, 48, 48)).astype(np.float32)
    w = np.ones((K, B), np.float32)

    seq_losses = []
    s1 = state
    for k in range(K):
        s1, m = step(s1, jnp.asarray(hrs[k]), jnp.asarray(w[k]))
        seq_losses.append(float(m["mloss"]))

    s2, ms = multi(state_b, jnp.asarray(hrs), jnp.asarray(w))
    assert ms["mloss"].shape == (K,)
    np.testing.assert_allclose(np.asarray(ms["mloss"]), seq_losses, rtol=2e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_trainer_steps_per_dispatch(tmp_path):
    """pipeline.steps_per_dispatch=2 trains the same trajectory the per-batch
    loop does (same seeded data order; scan is dispatch-amortization only)."""
    from tests.test_trainer import synth_ctx
    from sres_tpu.data.inference_io import TSet
    from sres_tpu.trainer import ModelTrainer

    losses = {}
    for k in (1, 2):
        with synth_ctx(tmp_path / f"k{k}", **{"pipeline.steps_per_dispatch": k,
                                              "model.nfeatures": 8}) as cc:
            tr = ModelTrainer(cc, seed=0)
            assert tr.steps_per_dispatch == k
            tr.train(nepochs=2, refresh_state=True, seed=0)
            losses[k] = [r.loss for r in tr.results_accum.results
                         if r.tset == TSet.Train]
    assert len(losses[1]) == len(losses[2])
    np.testing.assert_allclose(losses[1], losses[2], rtol=2e-4)


def test_grad_accum_invariants():
    """build_accum_train_step: ONE update per K micro-batches. (a) K
    identical micro-batches reproduce the single-batch step exactly;
    (b) an all-padding micro-batch contributes nothing."""
    from sres_tpu.trainer.step import build_accum_train_step
    model, opt, state, sc = _setup()
    mesh = get_mesh({"data": -1})
    step = build_train_step(model, opt, sc, mesh)
    accum = build_accum_train_step(model, opt, sc, mesh)

    rng = np.random.default_rng(0)
    ndev = len(jax.devices())
    B = 2 * ndev
    hr = rng.normal(size=(B, 1, 48, 48)).astype(np.float32)
    w = np.ones((B,), np.float32)

    # (a) identical micro-batches == single step
    s1, m1 = step(jax.tree.map(jnp.copy, state), jnp.asarray(hr), jnp.asarray(w))
    stack = jnp.asarray(np.stack([hr, hr, hr]))
    wstack = jnp.asarray(np.stack([w, w, w]))
    s2, m2 = accum(jax.tree.map(jnp.copy, state), stack, wstack)
    assert m2["mloss"].shape == (3,)
    np.testing.assert_allclose(float(m2["mloss"][0]), float(m1["mloss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    # (b) all-padding micro-batch is inert: [hr, junk@w=0] == [hr] alone
    junk = rng.normal(size=(B, 1, 48, 48)).astype(np.float32)
    s3, _ = accum(jax.tree.map(jnp.copy, state),
                  jnp.asarray(np.stack([hr, junk])),
                  jnp.asarray(np.stack([w, np.zeros_like(w)])))
    s4, _ = accum(jax.tree.map(jnp.copy, state),
                  jnp.asarray(np.stack([hr])), jnp.asarray(np.stack([w])))
    for a, b in zip(jax.tree.leaves(s3.params), jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=1e-7)


def test_grad_accum_ragged_tail_one_update_per_k(tmp_path):
    """A timeslice whose batch count is not a multiple of K must still apply
    ONE optimizer update per ≤K micro-batches — the tail is padded with
    zero-weight micro-batches, NOT dispatched as full-LR per-batch updates
    (round-2 advisor finding). With K larger than the per-timeslice batch
    count, every timeslice is one ragged tail: exactly one update each."""
    from tests.test_trainer import synth_ctx
    from sres_tpu.data.inference_io import TSet
    from sres_tpu.trainer import ModelTrainer

    # 12-tile grid, batch 4 → 3 batches/timeslice (minus NaN-dropped tiles);
    # K=4 > 3 means the pre-fix code never reached the accum dispatch at all
    with synth_ctx(tmp_path, **{"pipeline.grad_accum": 4,
                                "model.nfeatures": 8}) as cc:
        tr = ModelTrainer(cc, seed=0)
        assert tr.grad_accum == 4
        tr.train(nepochs=2, refresh_state=True, seed=0)   # quirk: runs 1 epoch
        n_train_ts = len(tr.data_timestamps[TSet.Train])
        assert int(tr.state.step) == n_train_ts, \
            (int(tr.state.step), n_train_ts)
        recs = [r for r in tr.results_accum.results if r.tset == TSet.Train]
        assert recs and all(np.isfinite(r.loss) and r.loss > 0 for r in recs)
