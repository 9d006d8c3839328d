"""model.scan_groups: the lax.scan'd RCAN trunk (models/scan_trunk.py) must
be a pure compile-time transform — identical param tree, outputs equal to
the unrolled path (bit-equal in bf16; one-ulp conv-algorithm noise in f32),
gradients equal to f32 roundoff, and a trunk HLO that no longer scales with
nlayers×nblocks. Replaces the loop structure of the reference RCAN trunk
(sres/model/rcan/network.py:67-80)."""
import jax
import jax.numpy as jnp
import numpy as np

from sres_tpu.models import build_model

BASE = dict(name="rcan", nfeatures=8, nlayers=3, nblocks=2, cbottleneck=2,
            kernel_size=3, downscale_factors=[2, 2], loss_fn="l2",
            lane_pack=2)


def _pair(prec, **kw):
    m0 = build_model(dict(BASE, **kw), 1, 1, precision=prec)
    m1 = build_model(dict(BASE, scan_groups=True, **kw), 1, 1, precision=prec)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 8, 8, 1)), jnp.float32)
    v = m0.init(jax.random.PRNGKey(0), x)
    # same init seed => identical params; trees must match exactly
    v1 = m1.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1)
    return m0, m1, v, x


def test_scan_groups_forward_parity_bf16():
    m0, m1, v, x = _pair("bf16")
    np.testing.assert_array_equal(np.asarray(m0.apply(v, x)),
                                  np.asarray(m1.apply(v, x)))


def test_scan_groups_forward_parity_f32():
    m0, m1, v, x = _pair("f32")
    y0, y1 = m0.apply(v, x), m1.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=0, atol=1e-5)


def test_scan_groups_grad_parity():
    m0, m1, v, x = _pair("f32")

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x) ** 2)

    g0 = jax.grad(loss(m0))(v)
    g1 = jax.grad(loss(m1))(v)
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                              jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0,
            atol=5e-6 * (float(jnp.max(jnp.abs(a))) + 1e-30),
            err_msg=jax.tree_util.keystr(k))


def test_scan_groups_remat_grad_parity():
    """remat_trunk on/off are the same math: grads match to f32 roundoff.
    (Default under scan_groups is remat ON — see the residual-size guard
    below for why.)"""
    _, m_on, v, x = _pair("f32")  # m_on: scan_groups with the remat default
    m_off = build_model(dict(BASE, scan_groups=True, remat_trunk=False),
                        1, 1, precision="f32")
    g0 = jax.grad(lambda p: jnp.sum(m_off.apply(p, x) ** 2))(v)
    g1 = jax.grad(lambda p: jnp.sum(m_on.apply(p, x) ** 2))(v)
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                              jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0,
            atol=5e-6 * (float(jnp.max(jnp.abs(a))) + 1e-30),
            err_msg=jax.tree_util.keystr(k))


def test_scan_groups_remat_bounds_residuals():
    """The HBM contract that makes scan_groups usable on chip: WITHOUT remat,
    scan-with-grad stacks every RCAB body intermediate over
    (nlayers, nblocks) — measured 19.4 GB at the flagship batch 72, an OOM
    on a 16 GB v5e. With the default group remat, no
    (nlayers, nblocks, batch, H, W, C) residual survives in the lowered
    gradient HLO."""
    nl, nb = 3, 2
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 8, 8, 1)), jnp.float32)
    # packed batch 2 (lane_pack 2), packed channels 16
    marker = f"{nl}x{nb}x2x8x8x16"

    def grad_hlo(**kw):
        m = build_model(dict(BASE, scan_groups=True, **kw), 1, 1,
                        precision="f32")
        v = m.init(jax.random.PRNGKey(0), x)
        f = jax.jit(jax.grad(lambda p, a: jnp.sum(m.apply(p, a) ** 2)))
        return f.lower(v, x).as_text()

    assert marker in grad_hlo(remat_trunk=False)  # the failure mode exists
    assert marker not in grad_hlo()               # and the default kills it


def test_scan_groups_collapses_hlo():
    """The point of the mode: trunk convs no longer scale with depth.
    3x2 and 6x4 scanned trunks lower to the SAME number of convolutions."""
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 8, 8, 1)), jnp.float32)

    def n_convs(nlayers, nblocks):
        m = build_model(dict(BASE, scan_groups=True, nlayers=nlayers,
                             nblocks=nblocks), 1, 1, precision="f32")
        v = m.init(jax.random.PRNGKey(0), x)
        txt = jax.jit(lambda p, a: m.apply(p, a)).lower(v, x).as_text()
        return txt.count("stablehlo.convolution")

    assert n_convs(3, 2) == n_convs(6, 4)


def test_scan_groups_fallback_quant():
    """Unsupported combos (quantization) silently use the unrolled trunk
    with identical results."""
    m0, m1, v, x = _pair("f32", quantization="int8_fused")
    np.testing.assert_array_equal(np.asarray(m0.apply(v, x)),
                                  np.asarray(m1.apply(v, x)))


def test_packed_opt_bit_equal():
    """pipeline.packed_opt (optax.flatten): Adam on one raveled vector is
    mathematically identical to per-leaf Adam — 3 train steps produce
    bit-equal params. Collapses the per-leaf optimizer graph that dominates
    the flagship step HLO (trainer/step.py:build_optimizer)."""
    import optax
    from jax.sharding import Mesh
    from sres_tpu.trainer.step import (StepConfig, build_train_step,
                                       init_state)

    sc = StepConfig(scale=4, downscale_factors=(2, 2), down_mode="bicubic",
                    up_mode="bicubic", loss_fn="l2", data_downsample=1.0,
                    target_idx=(0,), nchannels_in=1, has_bn=False)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    m = build_model(dict(BASE, lane_pack=1), 1, 1, precision="f32")
    hr = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 1, 48, 48)), jnp.float32)
    w = jnp.ones((4,), jnp.float32)
    finals = []
    for packed in (False, True):
        opt = optax.adam(1e-4)
        if packed:
            opt = optax.flatten(opt)
        st, _ = init_state(m, opt, jnp.zeros((1, 12, 12, 1), jnp.float32),
                           seed=0)
        step = build_train_step(m, opt, sc, mesh)
        for _ in range(3):
            st, _mt = step(st, hr, w)
        finals.append(st.params)
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(finals[0]),
                              jax.tree_util.tree_leaves_with_path(finals[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(k))


def test_packed_opt_checkpoint_interchange():
    """Checkpoints ARE interchangeable across pipeline.packed_opt: the
    ravel/unravel conversion (trainer/opt_interop.py) restores the Adam
    moments exactly in either direction — continuing training after a
    layout switch produces bit-equal params."""
    import optax
    from flax import serialization
    from jax.sharding import Mesh
    from sres_tpu.trainer.opt_interop import restore_converting_opt_layout
    from sres_tpu.trainer.step import (StepConfig, build_train_step,
                                       init_state)

    sc = StepConfig(scale=4, downscale_factors=(2, 2), down_mode="bicubic",
                    up_mode="bicubic", loss_fn="l2", data_downsample=1.0,
                    target_idx=(0,), nchannels_in=1, has_bn=False)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    m = build_model(dict(BASE, lane_pack=1), 1, 1, precision="f32")
    hr = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 1, 48, 48)), jnp.float32)
    w = jnp.ones((4,), jnp.float32)

    def fresh(packed):
        opt = optax.adam(1e-4)
        if packed:
            opt = optax.flatten(opt)
        st, _ = init_state(m, opt, jnp.zeros((1, 12, 12, 1), jnp.float32),
                           seed=0)
        return st, build_train_step(m, opt, sc, mesh)

    # 3 steps per-leaf, then hand the checkpoint to a packed run
    st_p, step_p = fresh(packed=False)
    for _ in range(3):
        st_p, _mt = step_p(st_p, hr, w)
    sd = serialization.to_state_dict(jax.device_get(st_p))

    st_f_tpl, step_f = fresh(packed=True)
    st_f = restore_converting_opt_layout(st_f_tpl, sd)
    assert st_f is not None
    # host snapshots BEFORE stepping: the train step donates its input state
    ref_opt_p = jax.device_get(st_p.opt_state)
    sd_f = serialization.to_state_dict(jax.device_get(st_f))

    # one more step in each layout must agree bit-for-bit
    st_p2, _ = step_p(st_p, hr, w)
    st_f2, _ = step_f(st_f, hr, w)
    for (k, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(st_p2.params),
            jax.tree_util.tree_leaves_with_path(st_f2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(k))

    # and back: packed checkpoint into a per-leaf run, moments exact
    st_back_tpl, _ = fresh(packed=False)
    st_back = restore_converting_opt_layout(st_back_tpl, sd_f)
    assert st_back is not None
    for a, b in zip(jax.tree_util.tree_leaves(st_back.opt_state),
                    jax.tree_util.tree_leaves(ref_opt_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_resblocks_edsr_parity():
    """EDSR's scanned ResBlock trunk (models/scan_trunk.py:scan_resblocks)
    matches the unrolled path: identical param tree, bit-equal bf16
    forward, f32 grads to roundoff."""
    ecfg = dict(name="edsr", nfeatures=8, nlayers=3, res_scale=0.5,
                kernel_size=3, downscale_factors=[2, 2], loss_fn="l2",
                lane_pack=2)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(4, 8, 8, 1)), jnp.float32)
    m0 = build_model(dict(ecfg), 1, 1, precision="bf16")
    m1 = build_model(dict(ecfg, scan_groups=True), 1, 1, precision="bf16")
    v = m0.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(m1.init(jax.random.PRNGKey(0), x)))
    np.testing.assert_array_equal(np.asarray(m0.apply(v, x)),
                                  np.asarray(m1.apply(v, x)))

    f0 = build_model(dict(ecfg), 1, 1, precision="f32")
    f1 = build_model(dict(ecfg, scan_groups=True), 1, 1, precision="f32")
    vf = f0.init(jax.random.PRNGKey(0), x)
    g0 = jax.grad(lambda p: jnp.sum(f0.apply(p, x) ** 2))(vf)
    g1 = jax.grad(lambda p: jnp.sum(f1.apply(p, x) ** 2))(vf)
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                              jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0,
            atol=5e-6 * (float(jnp.max(jnp.abs(a))) + 1e-30),
            err_msg=jax.tree_util.keystr(k))
