"""ops/int8_conv.py — the lean fused-quantization int8 conv (custom VJP).

Exactness: integer-valued operands whose absmax is exactly 127 quantize
losslessly (scale 1), so the quantized conv and BOTH backward contractions
must match the f32 conv's jax.vjp EXACTLY — this pins every transpose/flip/
padding choice in the hand-written backward. Approximation: on gaussian data
the forward/backward stay within the documented ~1.4%-per-conv envelope.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from sres_tpu.ops.int8_conv import int8_conv, int8_conv_fn, int8_conv_full


def _f32_conv(x, w, pad):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), pad, dimension_numbers=dn)


def _int_data(rng, shape, chan_axis_full=None):
    """Random int array in [-127,127] with |max| exactly 127 — per channel of
    ``chan_axis_full`` axes if given, else per the leading axis (samples)."""
    a = rng.integers(-100, 100, size=shape).astype(np.float32)
    if chan_axis_full == "w":       # force per-I and per-O amax = 127
        a[0, 0, :, 0] = 127.0
        a[0, 0, 0, :] = 127.0
    else:                            # per-sample amax = 127
        a[:, 0, 0, 0] = 127.0
    return a


@pytest.mark.parametrize("k,cin,cout", [(3, 8, 8), (1, 8, 4)])
def test_exact_on_lossless_integer_data(k, cin, cout):
    rng = np.random.default_rng(0)
    pad = ((k // 2,) * 2, (k // 2,) * 2)
    x = jnp.asarray(_int_data(rng, (3, 6, 6, cin)))
    w = jnp.asarray(_int_data(rng, (k, k, cin, cout), chan_axis_full="w"))
    g = jnp.asarray(_int_data(rng, (3, 6, 6, cout)))

    # out32=True: f32 accumulator output so integer sums stay exact — pins
    # the backward's transposes/padding/scale math bit-for-bit; the
    # production path (bf16 output, the backend's accelerated form) is
    # checked at tolerance below
    y, vjp = jax.vjp(lambda a, b: int8_conv(a, b, pad, True), x, w)
    yr, vjpr = jax.vjp(lambda a, b: _f32_conv(a, b, pad), x, w)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(yr))
    dx, dw = vjp(g)
    dxr, dwr = vjpr(g)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dxr))
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(dwr))

    yp = int8_conv(x, w, pad)          # production bf16-output path
    rel = np.linalg.norm(np.asarray(yp) - np.asarray(yr)) / \
        np.linalg.norm(np.asarray(yr))
    assert rel < 5e-3, rel


def test_approx_on_gaussian_data():
    rng = np.random.default_rng(1)
    pad = ((1, 1), (1, 1))
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 16, 16)) * 0.1).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(4, 8, 8, 16)).astype(np.float32))

    y, vjp = jax.vjp(lambda a, b: int8_conv(a, b, pad), x, w)
    yr, vjpr = jax.vjp(lambda a, b: _f32_conv(a, b, pad), x, w)

    def relerr(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return np.linalg.norm(a - b) / np.linalg.norm(b)

    assert relerr(y, yr) < 0.03
    (dx, dw), (dxr, dwr) = vjp(g), vjpr(g)
    assert relerr(dx, dxr) < 0.03
    assert relerr(dw, dwr) < 0.03


def test_wrapper_fallback_and_dispatch():
    """int8_conv_fn: supported shapes quantize; stride-2 / grouped calls fall
    back to the exact full-precision conv."""
    rng = np.random.default_rng(2)
    conv = int8_conv_fn()
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32))
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    # stride 2 → identical to lax (fallback)
    got = conv(x, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn)
    want = lax.conv_general_dilated(x, w, (2, 2), ((1, 1), (1, 1)),
                                    dimension_numbers=dn)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # stride 1 → quantized (differs from f32 but within envelope)
    got = conv(x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
    want = lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                    dimension_numbers=dn)
    d = np.linalg.norm(np.asarray(got) - np.asarray(want))
    assert 0 < d / np.linalg.norm(np.asarray(want)) < 0.03


def test_fused_matches_aqt_envelope_in_model():
    """model.quantization=int8_fused's FORWARD stays close to the AQT int8
    forward on the same weights (same scale structure: per-sample
    activations, per-output-channel weights). AQT is serving-only, so the
    comparison is forward-to-forward."""
    import jax
    from sres_tpu.models import build_model

    outs = {}
    for mode in ("int8", "int8_fused"):
        mcfg = dict(name="rcan", nfeatures=8, nlayers=1, nblocks=2,
                    cbottleneck=2, kernel_size=3, downscale_factors=[2, 2],
                    quantization=mode)
        model = build_model(mcfg, 1, 1, precision="f32")
        x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 12, 12, 1))
                        .astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        outs[mode] = np.asarray(model.apply(v, x, train=False))
    rel = (np.linalg.norm(outs["int8_fused"] - outs["int8"])
           / np.linalg.norm(outs["int8"]))
    assert rel < 0.02, rel


@pytest.mark.parametrize("k,cin,cout", [(3, 8, 8), (1, 8, 4)])
def test_full_exact_on_lossless_integer_data(k, cin, cout):
    """int8_conv_full: with lossless integer operands (absmax exactly 127 on
    every scale group) the hand-written int8 BACKWARD contractions must match
    the f32 conv's jax.vjp EXACTLY — pins the dx transpose-flip padding and
    the dw scale-absorption (g·sx per-tensor) bit-for-bit."""
    rng = np.random.default_rng(7)
    pad = ((k // 2,) * 2, (k // 2,) * 2)
    x = jnp.asarray(_int_data(rng, (3, 6, 6, cin)))
    w = jnp.asarray(_int_data(rng, (k, k, cin, cout), chan_axis_full="w"))
    g = jnp.asarray(_int_data(rng, (3, 6, 6, cout)))

    y, vjp = jax.vjp(lambda a, b: int8_conv_full(a, b, pad, True), x, w)
    yr, vjpr = jax.vjp(lambda a, b: _f32_conv(a, b, pad), x, w)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(yr))
    (dx, dw), (dxr, dwr) = vjp(g), vjpr(g)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dxr))
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(dwr))


def test_full_approx_on_gaussian_data():
    """Production (bf16-output) int8_conv_full stays within the quantization
    envelope on gaussian data, forward and both backward contractions."""
    rng = np.random.default_rng(8)
    pad = ((1, 1), (1, 1))
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 16, 16)) * 0.1).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(4, 8, 8, 16)).astype(np.float32))

    y, vjp = jax.vjp(lambda a, b: int8_conv_full(a, b, pad), x, w)
    yr, vjpr = jax.vjp(lambda a, b: _f32_conv(a, b, pad), x, w)

    def relerr(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return np.linalg.norm(a - b) / np.linalg.norm(b)

    assert relerr(y, yr) < 0.03
    (dx, dw), (dxr, dwr) = vjp(g), vjpr(g)
    assert relerr(dx, dxr) < 0.04
    assert relerr(dw, dwr) < 0.04


def test_int8_full_model_step_runs():
    """model.quantization=int8_full trains a tiny RCAN step; loss is finite
    and within the fused path's envelope."""
    import optax
    from sres_tpu.models import build_model
    from sres_tpu.trainer.step import StepConfig, build_train_step, init_state

    losses = {}
    for mode in ("int8_fused", "int8_full"):
        mcfg = dict(name="rcan", nfeatures=8, nlayers=1, nblocks=2,
                    cbottleneck=2, kernel_size=3, downscale_factors=[2, 2],
                    quantization=mode)
        model = build_model(mcfg, 1, 1, precision="f32")
        opt = optax.adam(1e-3)
        state, has_bn = init_state(model, opt,
                                   jnp.zeros((1, 12, 12, 1), jnp.float32), seed=0)
        sc = StepConfig(scale=4, downscale_factors=(2, 2), down_mode="bicubic",
                        up_mode="bicubic", loss_fn="l2", data_downsample=1.0,
                        target_idx=(0,), nchannels_in=1, has_bn=has_bn)
        step = build_train_step(model, opt, sc, mesh=None)
        rng = np.random.default_rng(9)
        hr = jnp.asarray(rng.normal(size=(4, 1, 48, 48)).astype(np.float32))
        wt = jnp.ones((4,), jnp.float32)
        state, m = step(state, hr, wt)
        losses[mode] = float(m["mloss"])
        assert np.isfinite(losses[mode])
    assert abs(losses["int8_full"] - losses["int8_fused"]) \
        / losses["int8_fused"] < 0.05


def test_remat_trunk_identical_tree_and_math():
    """model.remat_trunk (per-group jax.checkpoint, a memory lever) must not
    change the param tree (names stay ResidualGroup_i), the forward
    (bitwise), or the gradients (f32 fusion-order tolerance)."""
    import jax
    import numpy as np
    from sres_tpu.models import build_model

    base = dict(name="rcan", nfeatures=8, nlayers=2, nblocks=2, cbottleneck=2,
                kernel_size=3, downscale_factors=[2, 2],
                quantization="int8_fused")
    m1 = build_model({**base, "remat_trunk": True}, 1, 1, precision="f32")
    m2 = build_model({**base, "remat_trunk": False}, 1, 1, precision="f32")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 12, 12, 1))
                    .astype(np.float32))
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
    assert (str(jax.tree_util.tree_structure(v1))
            == str(jax.tree_util.tree_structure(v2)))
    np.testing.assert_array_equal(np.asarray(m1.apply(v1, x, train=False)),
                                  np.asarray(m2.apply(v2, x, train=False)))
    g1 = jax.grad(lambda v: m1.apply(v, x, train=False).sum())(v1)
    g2 = jax.grad(lambda v: m2.apply(v, x, train=False).sum())(v2)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("quant", ["int8_fused", "int8_full"])
def test_int8_fused_sharded_step_runs(quant):
    """The int8_fused/int8_full train step compiles and runs data-sharded
    over the virtual 8-device mesh (custom VJP + group remat + GSPMD
    compose — int8_full auto-enables per-group remat)."""
    import jax
    import optax
    from jax.sharding import Mesh
    from sres_tpu.models import build_model
    from sres_tpu.trainer.step import StepConfig, build_train_step, init_state

    mcfg = dict(name="rcan", nfeatures=8, nlayers=1, nblocks=2, cbottleneck=2,
                kernel_size=3, downscale_factors=[2, 2],
                quantization=quant)
    model = build_model(mcfg, 1, 1, precision="f32")
    opt = optax.adam(1e-3)
    state, has_bn = init_state(model, opt, jnp.zeros((1, 12, 12, 1), jnp.float32),
                               seed=0)
    sc = StepConfig(scale=4, downscale_factors=(2, 2), down_mode="bicubic",
                    up_mode="bicubic", loss_fn="l2", data_downsample=1.0,
                    target_idx=(0,), nchannels_in=1, has_bn=has_bn)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    step = build_train_step(model, opt, sc, mesh)
    rng = np.random.default_rng(5)
    hr = jnp.asarray(rng.normal(size=(16, 1, 48, 48)).astype(np.float32))
    w = jnp.ones((16,), jnp.float32)
    state, m = step(state, hr, w)
    assert np.isfinite(float(m["mloss"]))
    txt = step.lower(state, hr, w).compile().as_text()
    assert "all-reduce" in txt
