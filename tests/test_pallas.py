"""Pallas model-level smoke: the fused RCAN (lane-packed residual-group
kernel, ops/pallas/attic/residual_group.py) builds, runs, and produces the right
shapes in interpret mode. Kernel numerics are covered exhaustively in
tests/test_residual_group_kernel.py; the round-1 per-RCAB kernel was removed
(it loses to XLA's conv emitter — PERF.md)."""
import jax
import jax.numpy as jnp
import numpy as np


def test_fused_rcan_model_matches_shapes():
    from sres_tpu.models import build_model
    mcfg = dict(name="rcan", nfeatures=64, nlayers=1, nblocks=2, cbottleneck=2,
                kernel_size=3, downscale_factors=[2, 2], fused=True)
    model = build_model(mcfg, 1, 1, precision="f32")
    x = jnp.zeros((2, 16, 16, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(v, x, train=False)
    assert y.shape == (2, 64, 64, 1)


def test_fused_rcan_odd_batch():
    """The fused path pads odd batches to the pack size internally."""
    from sres_tpu.models import build_model
    mcfg = dict(name="rcan", nfeatures=64, nlayers=1, nblocks=1, cbottleneck=2,
                kernel_size=3, downscale_factors=[2, 2], fused=True)
    model = build_model(mcfg, 1, 1, precision="f32")
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 8, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(v, x, train=False)
    assert y.shape == (3, 32, 32, 1) and np.isfinite(np.asarray(y)).all()
