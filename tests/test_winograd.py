"""Winograd F(m,3) conv: math oracle vs lax.conv, quad layout, and the
Pallas kernel (ops/pallas/winograd_conv.py) forward + exact-adjoint VJP in
interpret mode. The kernel replaces the reference RCAN trunk's 3×3 convs
(sres/model/rcan/network.py:50-80) with 2.25×/4× fewer MACs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from sres_tpu.ops.winograd import (from_quad, to_quad, transform_weights,
                                   wino_conv_ref, wino_spec)
from sres_tpu.ops.pallas.winograd_conv import wino_conv_quad

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def direct(x, w, b, relu=False):
    y = lax.conv_general_dilated(x.astype(jnp.float32), w.astype(jnp.float32),
                                 (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=DN,
                                 preferred_element_type=jnp.float32)
    y = y + b.astype(jnp.float32)
    return jnp.maximum(y, 0.0) if relu else y


def _data(t=2, h=16, w=16, c=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(t, h, w, c)).astype(np.float32))
    wt = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    return x, wt, b


@pytest.mark.parametrize("m", [2, 4])
def test_factored_transform_programs(m):
    """The straight-line transform programs (bt/at_apply and transposes)
    are exact against their matrices — the kernels' VPU-op-count
    optimization must not change the math."""
    import sres_tpu.ops.winograd as W
    rng = np.random.default_rng(0)
    n = m + 2
    bt, _, at = W._MATS[m]
    xs = [jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
          for _ in range(n)]
    ys = xs[:m]
    for name, outs, mat, terms in [
            ("bt", W.bt_apply(m, xs), bt, xs),
            ("bt_t", W.bt_t_apply(m, xs), bt.T, xs),
            ("at", W.at_apply(m, xs), at, xs),
            ("at_t", W.at_t_apply(m, ys), at.T, ys)]:
        ref = jnp.einsum("ij,j...->i...", jnp.asarray(mat, jnp.float32),
                         jnp.stack(terms))
        np.testing.assert_allclose(jnp.stack(outs), ref, rtol=0, atol=1e-5,
                                   err_msg=f"m={m} {name}")


@pytest.mark.parametrize("m", [2, 4])
def test_weight_transform_programs(m):
    """transform_weights / untransform_weight_grad are compensated
    (double-f32) straight-line VPU programs (no dot/einsum): exact vs the
    G matrices, mutually adjoint, and their lowering contains NO dot op.
    The no-dot property is what makes the serving artifact (params
    constant-folded on host) bitwise equal to a live apply with runtime
    params — MXU dot passes round differently than the host evaluator
    (export_wino_diag.py, round 4); the compensation keeps the group
    chain's gradcheck margins (see the block comment in ops/winograd.py)."""
    import sres_tpu.ops.winograd as W
    rng = np.random.default_rng(1)
    n = m + 2
    g = W._MATS[m][1]
    w = jnp.asarray(rng.normal(size=(3, 3, 6, 5)).astype(np.float32))
    du = jnp.asarray(rng.normal(size=(n * n, 6, 5)).astype(np.float32))
    u = W.transform_weights(w, m)
    ref = jnp.einsum("tp,sq,pqio->tsio", jnp.asarray(g, jnp.float32),
                     jnp.asarray(g, jnp.float32), w).reshape(n * n, 6, 5)
    np.testing.assert_allclose(u, ref, rtol=0, atol=1e-5)
    dw = W.untransform_weight_grad(du, m)
    ref_dw = jnp.einsum("tp,sq,tsio->pqio", jnp.asarray(g, jnp.float32),
                        jnp.asarray(g, jnp.float32),
                        du.reshape(n, n, 6, 5))
    np.testing.assert_allclose(dw, ref_dw, rtol=0, atol=1e-5)
    # adjointness: <Gw, du> == <w, Gᵀdu> (exact-adjoint VJP contract)
    lhs = float(jnp.vdot(u, du))
    rhs = float(jnp.vdot(w, dw))
    assert abs(lhs - rhs) <= 1e-4 * max(1.0, abs(lhs))
    for fn, arg in ((lambda a: W.transform_weights(a, m), w),
                    (lambda a: W.untransform_weight_grad(a, m), du)):
        hlo = jax.jit(fn).lower(arg).as_text()
        assert "dot" not in hlo, f"m={m}: weight transform lowered to a dot"


@pytest.mark.parametrize("m", [2, 4])
def test_reference_matches_lax_conv(m):
    x, w, b = _data(c=8)
    w = w[:, :, :8, :8]
    np.testing.assert_allclose(wino_conv_ref(x, w, b[:8], m),
                               direct(x, w, b[:8]), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("m", [2, 4])
def test_quad_roundtrip(m):
    x, _, _ = _data(h=16, w=24, c=8)
    spec = wino_spec(m, 16, 24)
    np.testing.assert_array_equal(from_quad(to_quad(x, spec), spec), x)


@pytest.mark.parametrize("m,bs", [(2, 1), (2, 2), (4, 1), (4, 2)])
@pytest.mark.parametrize("relu", [False, True])
def test_kernel_forward(m, bs, relu):
    h = w = 16
    x, wt, b = _data(t=2, h=h, w=w)
    spec = wino_spec(m, h, w)
    yq = wino_conv_quad(to_quad(x, spec), wt, b, m, (h, w), relu, bs)
    y = from_quad(yq, spec)
    np.testing.assert_allclose(y, direct(x, wt, b, relu), rtol=2e-4, atol=2e-4)
    # plane borders stay exactly zero (the quad-layout invariant the chain
    # of trunk ops relies on)
    interior = to_quad(from_quad(yq, spec), spec)
    np.testing.assert_array_equal(np.asarray(yq), np.asarray(interior))


@pytest.mark.parametrize("m", [2, 4])
@pytest.mark.parametrize("relu", [False, True])
def test_kernel_gradients(m, relu):
    h = w = 8 if m == 2 else 16
    x, wt, b = _data(t=2, h=h, w=w, seed=3)
    spec = wino_spec(m, h, w)
    gref = jnp.asarray(np.random.default_rng(7).normal(
        size=(2, h, w, 128)).astype(np.float32))

    def loss_wino(x_, w_, b_):
        yq = wino_conv_quad(to_quad(x_, spec), w_, b_, m, (h, w), relu, 1)
        return jnp.sum(from_quad(yq, spec) * gref)

    def loss_direct(x_, w_, b_):
        return jnp.sum(direct(x_, w_, b_, relu) * gref)

    got = jax.grad(loss_wino, argnums=(0, 1, 2))(x, wt, b)
    want = jax.grad(loss_direct, argnums=(0, 1, 2))(x, wt, b)
    for g1, g2, name in zip(got, want, ("dx", "dw", "db")):
        np.testing.assert_allclose(
            g1, g2, rtol=2e-3, atol=2e-3 * float(jnp.max(jnp.abs(g2))),
            err_msg=f"m={m} relu={relu} {name}")


@pytest.mark.parametrize("m", [2, 4])
def test_chain_kernel_forward(m):
    """wino_chain_fwd: K chained conv+relu in one pallas_call (resident
    activations) matches the direct conv chain."""
    from sres_tpu.ops.pallas.winograd_conv import wino_chain_fwd
    rng = np.random.default_rng(3)
    t, h, k = 4, 8, 3
    x = jnp.asarray(rng.normal(size=(t, h, h, 128)).astype(np.float32))
    ws = jnp.asarray((rng.normal(size=(k, 3, 3, 128, 128)) * 0.05).astype(np.float32))
    bv = jnp.asarray((rng.normal(size=(k, 128)) * 0.05).astype(np.float32))
    y = x
    for i in range(k):
        y = direct(y, ws[i], bv[i], relu=True)
    spec = wino_spec(m, h, h)
    out = from_quad(wino_chain_fwd(to_quad(x, spec), ws, bv, m, (h, h), 2),
                    spec)
    np.testing.assert_allclose(out, y, rtol=0,
                               atol=3e-5 * float(jnp.max(jnp.abs(y))))


@pytest.mark.parametrize("m", [2, 4])
def test_group_kernel_forward(m):
    """wino_group_fwd: a 2-RCAB stack (conv+relu→conv→CA→skip per block) in
    one pallas_call matches the composed per-conv path."""
    from sres_tpu.ops.pallas.winograd_conv import wino_group_fwd
    rng = np.random.default_rng(4)
    t, h, nb, cah = 4, 8, 2, 64
    x = jnp.asarray(rng.normal(size=(t, h, h, 128)).astype(np.float32))
    ws = jnp.asarray((rng.normal(size=(nb, 2, 3, 3, 128, 128)) * 0.05).astype(np.float32))
    bv = jnp.asarray((rng.normal(size=(nb, 2, 128)) * 0.05).astype(np.float32))
    cw1 = jnp.asarray((rng.normal(size=(nb, 128, cah)) * 0.1).astype(np.float32))
    cb1 = jnp.asarray((rng.normal(size=(nb, cah)) * 0.1).astype(np.float32))
    cw2 = jnp.asarray((rng.normal(size=(nb, cah, 128)) * 0.1).astype(np.float32))
    cb2 = jnp.asarray((rng.normal(size=(nb, 128)) * 0.1).astype(np.float32))
    q = x
    for i in range(nb):
        r = direct(q, ws[i, 0], bv[i, 0], relu=True)
        r = direct(r, ws[i, 1], bv[i, 1], relu=False)
        mean = jnp.mean(r, axis=(1, 2))                      # (t, 128)
        g = jnp.maximum(mean @ cw1[i] + cb1[i], 0.0)
        g = jax.nn.sigmoid(g @ cw2[i] + cb2[i])
        q = q + r * g[:, None, None, :]
    spec = wino_spec(m, h, h)
    out = from_quad(wino_group_fwd(to_quad(x, spec), ws, bv, cw1, cb1,
                                   cw2, cb2, m, (h, h), 2), spec)
    np.testing.assert_allclose(out, q, rtol=0,
                               atol=3e-5 * float(jnp.max(jnp.abs(q))))


def test_group_vjp_gradcheck():
    """wino_group (whole-group custom VJP: stash sweep + reversed chunked
    backward kernels) — every gradient matches jax.grad of the composed
    direct-conv reference to f32 roundoff. nb=5 > NB_CHUNK exercises the
    ragged chunking."""
    from sres_tpu.ops.pallas.wino_group_grad import wino_group
    rng = np.random.default_rng(7)
    t, hh, nb, cah, m = 4, 8, 5, 64, 4
    x = jnp.asarray(rng.normal(size=(t, hh, hh, 128)).astype(np.float32))
    ws = jnp.asarray((rng.normal(size=(nb, 2, 3, 3, 128, 128)) * 0.05).astype(np.float32))
    bv = jnp.asarray((rng.normal(size=(nb, 2, 128)) * 0.05).astype(np.float32))
    cw1 = jnp.asarray((rng.normal(size=(nb, 128, cah)) * 0.1).astype(np.float32))
    cb1 = jnp.asarray((rng.normal(size=(nb, cah)) * 0.1).astype(np.float32))
    cw2 = jnp.asarray((rng.normal(size=(nb, cah, 128)) * 0.1).astype(np.float32))
    cb2 = jnp.asarray((rng.normal(size=(nb, 128)) * 0.1).astype(np.float32))

    def ref(x, ws, bv, cw1, cb1, cw2, cb2):
        q = x
        for i in range(nb):
            r = direct(q, ws[i, 0], bv[i, 0], relu=True)
            r = direct(r, ws[i, 1], bv[i, 1], relu=False)
            mean = jnp.mean(r, axis=(1, 2))
            g = jnp.maximum(mean @ cw1[i] + cb1[i], 0.0)
            g = jax.nn.sigmoid(g @ cw2[i] + cb2[i])
            q = q + r * g[:, None, None, :]
        return q

    spec = wino_spec(m, hh, hh)

    def ours(x, ws, bv, cw1, cb1, cw2, cb2):
        return from_quad(wino_group(to_quad(x, spec), ws, bv, cw1, cb1,
                                    cw2, cb2, m, (hh, hh), 2), spec)

    loss = lambda f: lambda *a: jnp.sum(f(*a) ** 2)
    g0 = jax.grad(loss(ref), argnums=tuple(range(7)))(x, ws, bv, cw1, cb1,
                                                      cw2, cb2)
    g1 = jax.grad(loss(ours), argnums=tuple(range(7)))(x, ws, bv, cw1, cb1,
                                                       cw2, cb2)
    for nm, a, b in zip(["dx", "dws", "dbv", "dcw1", "dcb1", "dcw2", "dcb2"],
                        g0, g1):
        np.testing.assert_allclose(
            b, a, rtol=0, atol=3e-5 * float(jnp.max(jnp.abs(a)) + 1e-30),
            err_msg=nm)


@pytest.mark.parametrize("m", [2, 4])
def test_rcan_winograd_parity(m):
    """model.winograd runs the whole lane-packed trunk through the kernel
    with the SAME param tree as the direct path: forward and gradients
    match to f32 roundoff (checkpoints/torch-interop are winograd-agnostic)."""
    from sres_tpu.models import build_model
    base = dict(name="rcan", nfeatures=64, nlayers=1, nblocks=2,
                cbottleneck=2, kernel_size=3, downscale_factors=[2, 2],
                loss_fn="l2", lane_pack=2)
    m_dir = build_model(dict(base), 1, 1, precision="f32")
    m_win = build_model(dict(base, winograd=m), 1, 1, precision="f32")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 8, 8, 1)).astype(np.float32))
    v = m_dir.init(jax.random.PRNGKey(0), x)
    y0 = m_dir.apply(v, x)
    # train=False -> whole-group chain kernel; train=True -> per-conv kernels
    # with the exact-adjoint VJP. Same param tree for all three or apply raises.
    for train in (False, True):
        y1 = m_win.apply(v, x, train=train)
        np.testing.assert_allclose(y1, y0, rtol=0,
                                   atol=3e-5 * float(jnp.max(jnp.abs(y0))),
                                   err_msg=f"train={train}")

    def loss(fn):
        return lambda p: jnp.sum(fn.apply({"params": p}, x, train=True) ** 2)

    g0 = jax.grad(loss(m_dir))(v["params"])
    g1 = jax.grad(loss(m_win))(v["params"])
    flat0 = {jax.tree_util.keystr(k): a
             for k, a in jax.tree_util.tree_leaves_with_path(g0)}
    flat1 = {jax.tree_util.keystr(k): a
             for k, a in jax.tree_util.tree_leaves_with_path(g1)}
    assert set(flat0) == set(flat1)
    for k, a in flat0.items():
        np.testing.assert_allclose(
            flat1[k], a, rtol=0, atol=3e-5 * float(jnp.max(jnp.abs(a)) + 1e-30),
            err_msg=k)


def test_edsr_winograd_parity():
    """model.winograd on EDSR: the trunk ResBlocks run through the ungated
    wino_resgroup chain (one pallas_call) with the SAME param tree as the
    direct path — forward and gradients match to f32 roundoff."""
    from sres_tpu.models import build_model
    base = dict(name="edsr", nfeatures=64, nlayers=3, kernel_size=3,
                res_scale=0.8, downscale_factors=[2, 2], loss_fn="l2",
                lane_pack=2)
    m_dir = build_model(dict(base), 1, 1, precision="f32")
    m_win = build_model(dict(base, winograd=4), 1, 1, precision="f32")
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(4, 8, 8, 1)).astype(np.float32))
    v = m_dir.init(jax.random.PRNGKey(0), x)
    y0 = m_dir.apply(v, x)
    y1 = m_win.apply(v, x)   # same tree or apply raises
    np.testing.assert_allclose(y1, y0, rtol=0,
                               atol=3e-5 * float(jnp.max(jnp.abs(y0))))

    def loss(fn):
        return lambda p: jnp.sum(fn.apply({"params": p}, x, train=True) ** 2)

    g0 = jax.grad(loss(m_dir))(v["params"])
    g1 = jax.grad(loss(m_win))(v["params"])
    flat0 = {jax.tree_util.keystr(k): a
             for k, a in jax.tree_util.tree_leaves_with_path(g0)}
    flat1 = {jax.tree_util.keystr(k): a
             for k, a in jax.tree_util.tree_leaves_with_path(g1)}
    assert set(flat0) == set(flat1)
    for k, a in flat0.items():
        np.testing.assert_allclose(
            flat1[k], a, rtol=0,
            atol=3e-5 * float(jnp.max(jnp.abs(a)) + 1e-30), err_msg=k)


def test_edsr_winograd_fallback():
    """EDSR: unsupported geometry (H % m != 0) silently falls back to the
    direct path with identical results."""
    from sres_tpu.models import build_model
    base = dict(name="edsr", nfeatures=64, nlayers=2, kernel_size=3,
                res_scale=1.0, downscale_factors=[2, 2], loss_fn="l2",
                lane_pack=2)
    x = jnp.asarray(np.random.default_rng(5).normal(
        size=(2, 10, 10, 1)).astype(np.float32))  # 10 % 4 != 0
    m_dir = build_model(dict(base), 1, 1, precision="f32")
    m_win = build_model(dict(base, winograd=4), 1, 1, precision="f32")
    v = m_dir.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(m_win.apply(v, x), m_dir.apply(v, x))


def test_winograd_sharded_grad():
    """The winograd train path (chain kernels + VJP) composes with a dp
    mesh under plain GSPMD: every pallas entry registers its batch-parallel
    sharding contract via custom_partitioning (ops/pallas/partition.py), so
    the sharded jit runs per-shard — NO activation all-gathers; the weight
    grads arrive through the partitioner's all-reduce — and matches the
    unsharded gradients. Closes ROADMAP 3b (pipeline.shard_map is no longer
    required for pure-dp winograd; it remains as the manual alternative)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from sres_tpu.models import build_model
    base = dict(name="rcan", nfeatures=64, nlayers=1, nblocks=2,
                cbottleneck=2, kernel_size=3, downscale_factors=[2, 2],
                loss_fn="l2", lane_pack=2, winograd=4)
    m = build_model(dict(base), 1, 1, precision="f32")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(16, 8, 8, 1)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(m.apply(p, x, train=True) ** 2)

    g0 = jax.grad(loss)(v, x)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    vs = jax.device_put(v, NamedSharding(mesh, P()))
    jitted = jax.jit(jax.grad(loss))
    hlo = jitted.lower(vs, xs).compile().as_text()
    assert hlo.count("all-gather") == 0, "winograd kernels were gathered"
    assert hlo.count("all-reduce(") >= 1, "missing weight-grad all-reduce"
    g1 = jitted(vs, xs)
    for (k0, a), (k1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(
            b, a, rtol=0, atol=1e-4 * float(jnp.max(jnp.abs(a)) + 1e-30),
            err_msg=jax.tree_util.keystr(k0))


def test_rcan_winograd_fallback():
    """Unsupported geometry (H not divisible by m, or packed C != 128)
    silently falls back to the direct path with identical results."""
    from sres_tpu.models import build_model
    base = dict(name="rcan", nfeatures=64, nlayers=1, nblocks=1,
                cbottleneck=2, kernel_size=3, downscale_factors=[2, 2],
                loss_fn="l2", lane_pack=2)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 10, 10, 1)).astype(np.float32))  # 10 % 4 != 0
    m_dir = build_model(dict(base), 1, 1, precision="f32")
    m_win = build_model(dict(base, winograd=4), 1, 1, precision="f32")
    v = m_dir.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(m_win.apply(v, x), m_dir.apply(v, x))


def test_kernel_chain_gradcheck():
    """Two chained wino convs with relu (the RCAB inner pattern) — gradients
    match the direct-conv chain; exercises the yq-residual relu path."""
    m, h, w = 2, 8, 8
    x, w1, b1 = _data(t=2, h=h, w=w, seed=5)
    _, w2, b2 = _data(t=2, h=h, w=w, seed=6)
    spec = wino_spec(m, h, w)

    def loss_wino(x_, wa, ba, wb, bb):
        q = to_quad(x_, spec)
        q = wino_conv_quad(q, wa, ba, m, (h, w), True, 1)
        q = wino_conv_quad(q, wb, bb, m, (h, w), False, 1)
        return jnp.sum(from_quad(q, spec) ** 2)

    def loss_direct(x_, wa, ba, wb, bb):
        return jnp.sum(direct(direct(x_, wa, ba, True), wb, bb) ** 2)

    got = jax.grad(loss_wino, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    want = jax.grad(loss_direct, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for g1, g2, name in zip(got, want, ("dx", "dw1", "db1", "dw2", "db2")):
        np.testing.assert_allclose(
            g1, g2, rtol=3e-3, atol=3e-3 * float(jnp.max(jnp.abs(g2))),
            err_msg=name)


def test_group_trail_vjp_gradcheck():
    """wino_group_trail: the RCAB stack PLUS the group's trailing conv and
    group skip (reference rcan/network.py:67-69) folded into the same
    pallas_call — all gradients (incl. the trailing conv's) match jax.grad
    of the composed direct-conv reference."""
    from sres_tpu.ops.pallas.wino_group_grad import wino_group_trail
    rng = np.random.default_rng(11)
    t, hh, nb, cah, m = 4, 8, 2, 64, 4
    x = jnp.asarray(rng.normal(size=(t, hh, hh, 128)).astype(np.float32))
    ws = jnp.asarray((rng.normal(size=(nb, 2, 3, 3, 128, 128)) * 0.05).astype(np.float32))
    bv = jnp.asarray((rng.normal(size=(nb, 2, 128)) * 0.05).astype(np.float32))
    cw1 = jnp.asarray((rng.normal(size=(nb, 128, cah)) * 0.1).astype(np.float32))
    cb1 = jnp.asarray((rng.normal(size=(nb, cah)) * 0.1).astype(np.float32))
    cw2 = jnp.asarray((rng.normal(size=(nb, cah, 128)) * 0.1).astype(np.float32))
    cb2 = jnp.asarray((rng.normal(size=(nb, 128)) * 0.1).astype(np.float32))
    wt = jnp.asarray((rng.normal(size=(3, 3, 128, 128)) * 0.05).astype(np.float32))
    bt = jnp.asarray((rng.normal(size=(128,)) * 0.05).astype(np.float32))

    def ref(x, ws, bv, cw1, cb1, cw2, cb2, wt, bt):
        q = x
        for i in range(nb):
            r = direct(q, ws[i, 0], bv[i, 0], relu=True)
            r = direct(r, ws[i, 1], bv[i, 1], relu=False)
            mean = jnp.mean(r, axis=(1, 2))
            g = jnp.maximum(mean @ cw1[i] + cb1[i], 0.0)
            g = jax.nn.sigmoid(g @ cw2[i] + cb2[i])
            q = q + r * g[:, None, None, :]
        return x + direct(q, wt, bt, relu=False)

    spec = wino_spec(m, hh, hh)

    def ours(x, ws, bv, cw1, cb1, cw2, cb2, wt, bt):
        return from_quad(wino_group_trail(to_quad(x, spec), ws, bv, cw1,
                                          cb1, cw2, cb2, wt, bt, m,
                                          (hh, hh), 2), spec)

    np.testing.assert_allclose(
        ours(x, ws, bv, cw1, cb1, cw2, cb2, wt, bt),
        ref(x, ws, bv, cw1, cb1, cw2, cb2, wt, bt),
        rtol=0, atol=3e-5 * float(jnp.max(jnp.abs(
            ref(x, ws, bv, cw1, cb1, cw2, cb2, wt, bt)))))
    loss = lambda f: lambda *a: jnp.sum(f(*a) ** 2)
    g0 = jax.grad(loss(ref), argnums=tuple(range(9)))(
        x, ws, bv, cw1, cb1, cw2, cb2, wt, bt)
    g1 = jax.grad(loss(ours), argnums=tuple(range(9)))(
        x, ws, bv, cw1, cb1, cw2, cb2, wt, bt)
    for nm, a, b in zip(["dx", "dws", "dbv", "dcw1", "dcb1", "dcw2",
                         "dcb2", "dwt", "dbt"], g0, g1):
        np.testing.assert_allclose(
            b, a, rtol=0, atol=3e-5 * float(jnp.max(jnp.abs(a)) + 1e-30),
            err_msg=nm)


def test_resgroup_trail_gradcheck():
    """wino_resgroup_trail (ungated EDSR trunk + trailing conv + global
    skip, res_scale exercised): forward and all gradients match the
    composed direct path."""
    from sres_tpu.ops.pallas.wino_group_grad import wino_resgroup_trail
    rng = np.random.default_rng(12)
    t, hh, nb, m, rs = 4, 8, 3, 2, 0.7
    x = jnp.asarray(rng.normal(size=(t, hh, hh, 128)).astype(np.float32))
    ws = jnp.asarray((rng.normal(size=(nb, 2, 3, 3, 128, 128)) * 0.05).astype(np.float32))
    bv = jnp.asarray((rng.normal(size=(nb, 2, 128)) * 0.05).astype(np.float32))
    wt = jnp.asarray((rng.normal(size=(3, 3, 128, 128)) * 0.05).astype(np.float32))
    bt = jnp.asarray((rng.normal(size=(128,)) * 0.05).astype(np.float32))

    def ref(x, ws, bv, wt, bt):
        q = x
        for i in range(nb):
            r = direct(q, ws[i, 0], bv[i, 0], relu=True)
            r = direct(r, ws[i, 1], bv[i, 1], relu=False)
            q = q + r * rs
        return x + direct(q, wt, bt, relu=False)

    spec = wino_spec(m, hh, hh)

    def ours(x, ws, bv, wt, bt):
        return from_quad(wino_resgroup_trail(to_quad(x, spec), ws, bv,
                                             wt, bt, m, (hh, hh), 2, rs),
                         spec)

    np.testing.assert_allclose(
        ours(x, ws, bv, wt, bt), ref(x, ws, bv, wt, bt),
        rtol=0, atol=3e-5 * float(jnp.max(jnp.abs(ref(x, ws, bv, wt, bt)))))
    loss = lambda f: lambda *a: jnp.sum(f(*a) ** 2)
    g0 = jax.grad(loss(ref), argnums=tuple(range(5)))(x, ws, bv, wt, bt)
    g1 = jax.grad(loss(ours), argnums=tuple(range(5)))(x, ws, bv, wt, bt)
    for nm, a, b in zip(["dx", "dws", "dbv", "dwt", "dbt"], g0, g1):
        np.testing.assert_allclose(
            b, a, rtol=0, atol=3e-5 * float(jnp.max(jnp.abs(a)) + 1e-30),
            err_msg=nm)


def test_stash_primal_gradcheck(monkeypatch):
    """SRES_WINO_STASH_PRIMAL=1: the primal forward runs the stash sweep
    (astash saved as a VJP residual, no chain replay in backward). Forward
    and gradients of the trail variants match the default mode exactly."""
    monkeypatch.setenv("SRES_WINO_STASH_PRIMAL", "1")
    from sres_tpu.ops.pallas.wino_group_grad import (wino_group,
                                                     wino_group_trail,
                                                     wino_resgroup_trail)
    rng = np.random.default_rng(13)
    t, hh, nb, cah, m = 2, 8, 2, 8, 2
    x = jnp.asarray(rng.normal(size=(t, hh, hh, 128)).astype(np.float32))
    ws = jnp.asarray((rng.normal(size=(nb, 2, 3, 3, 128, 128)) * 0.05).astype(np.float32))
    bv = jnp.asarray((rng.normal(size=(nb, 2, 128)) * 0.05).astype(np.float32))
    cw1 = jnp.asarray((rng.normal(size=(nb, 128, cah)) * 0.1).astype(np.float32))
    cb1 = jnp.asarray((rng.normal(size=(nb, cah)) * 0.1).astype(np.float32))
    cw2 = jnp.asarray((rng.normal(size=(nb, cah, 128)) * 0.1).astype(np.float32))
    cb2 = jnp.asarray((rng.normal(size=(nb, 128)) * 0.1).astype(np.float32))
    wt = jnp.asarray((rng.normal(size=(3, 3, 128, 128)) * 0.05).astype(np.float32))
    bt = jnp.asarray((rng.normal(size=(128,)) * 0.05).astype(np.float32))
    spec = wino_spec(m, hh, hh)
    loss = lambda f: lambda *a: jnp.sum(f(*a) ** 2)

    def gated(x, ws, bv, cw1, cb1, cw2, cb2, wt, bt):
        return from_quad(wino_group_trail(to_quad(x, spec), ws, bv, cw1,
                                          cb1, cw2, cb2, wt, bt, m,
                                          (hh, hh), 2), spec)

    def ungated(x, ws, bv, wt, bt):
        return from_quad(wino_resgroup_trail(to_quad(x, spec), ws, bv,
                                             wt, bt, m, (hh, hh), 2, 0.6),
                         spec)

    def plain(x, ws, bv, cw1, cb1, cw2, cb2):
        return from_quad(wino_group(to_quad(x, spec), ws, bv, cw1, cb1,
                                    cw2, cb2, m, (hh, hh), 2), spec)

    def run():
        y = gated(x, ws, bv, cw1, cb1, cw2, cb2, wt, bt)
        g = jax.grad(loss(gated), argnums=(0, 1, 7))(
            x, ws, bv, cw1, cb1, cw2, cb2, wt, bt)
        yu = ungated(x, ws, bv, wt, bt)
        gu = jax.grad(loss(ungated), argnums=(0, 1, 3))(x, ws, bv, wt, bt)
        yp = plain(x, ws, bv, cw1, cb1, cw2, cb2)
        gp = jax.grad(loss(plain), argnums=(0, 1))(
            x, ws, bv, cw1, cb1, cw2, cb2)
        return (y, yu, yp), g + gu + gp

    ys1, gs1 = run()
    monkeypatch.setenv("SRES_WINO_STASH_PRIMAL", "0")
    ys0, gs0 = run()

    for a, b in zip(ys1, ys0):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    for a, b, nm in zip(gs1, gs0, ["dx", "dws", "dwt", "u_dx", "u_dws",
                                   "u_dwt", "p_dx", "p_dws"]):
        np.testing.assert_allclose(
            a, b, rtol=0, atol=3e-6 * float(jnp.max(jnp.abs(b)) + 1e-30),
            err_msg=nm)


def test_winograd_bf16_noise_envelope():
    """bf16 numerics: winograd transforms round bf16 intermediates that
    direct conv doesn't have, so wino-bf16 != direct-bf16 — the meaningful
    invariant is error vs the f32 ground truth. Measured (PERF.md round-3
    bf16-numerics note): m=2's gradient noise is indistinguishable from the
    direct bf16 path's own noise (median 0.8% vs 1.0%); m=4 roughly doubles
    the median (still the same order as bf16 training noise). This guards
    those envelopes with headroom — a routing/kernel regression shows up as
    orders-of-magnitude, not ×2."""
    from sres_tpu.models import build_model
    base = dict(name="rcan", nfeatures=64, nlayers=1, nblocks=1,
                cbottleneck=2, kernel_size=3, downscale_factors=[2, 2],
                loss_fn="l2", lane_pack=2)
    x = jnp.asarray(np.random.default_rng(21).normal(
        size=(2, 8, 8, 1)).astype(np.float32))
    m_f32 = build_model(dict(base), 1, 1, precision="f32")
    v = m_f32.init(jax.random.PRNGKey(0), x)

    def run(model):
        f = lambda p: jnp.sum(model.apply({"params": p}, x, train=True) ** 2)
        y = model.apply(v, x, train=True)
        g = jax.grad(f)(v["params"])
        return y, {jax.tree_util.keystr(k): a for k, a in
                   jax.tree_util.tree_leaves_with_path(g)}

    y_t, g_t = run(m_f32)

    def errs(model):
        y, g = run(model)
        fe = float(jnp.max(jnp.abs(y - y_t)) / jnp.max(jnp.abs(y_t)))
        rels = sorted(float(jnp.max(jnp.abs(g[k] - a))
                            / (jnp.max(jnp.abs(a)) + 1e-30))
                      for k, a in g_t.items())
        return fe, rels[len(rels) // 2]

    fe_d, med_d = errs(build_model(dict(base), 1, 1, precision="bf16"))
    assert fe_d < 0.02 and med_d < 0.05, (fe_d, med_d)   # bf16 sanity
    for m, f_mult, g_mult in ((2, 4.0, 3.0), (4, 12.0, 6.0)):
        fe, med = errs(build_model(dict(base, winograd=m), 1, 1,
                                   precision="bf16"))
        assert fe <= f_mult * fe_d + 1e-4, (m, fe, fe_d)
        assert med <= g_mult * med_d + 1e-4, (m, med, med_d)


def test_partition_local_block_resize():
    """batch_partitioned re-picks the kernel sample block size for the
    LOCAL shard length: a global batch that divides by the requested bs
    can shard to a local length that doesn't (24 tiles over 8 devices →
    local 3, bs 4 → 3). The sharded forward must still match unsharded
    bit-for-bit in f32 (ops/pallas/partition.py local_bs_argnum)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    t, h, w = 24, 8, 8
    x, wt, b = _data(t=t, h=h, w=w)
    xq = to_quad(x, wino_spec(2, h, w))
    y0 = wino_conv_quad(xq, wt, b, 2, (h, w), relu=True, bs=4)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    xqs = jax.device_put(xq, NamedSharding(mesh, P("data")))
    f = jax.jit(lambda a: wino_conv_quad(a, wt, b, 2, (h, w), relu=True,
                                         bs=4))
    hlo = f.lower(xqs).compile().as_text()
    assert hlo.count("all-gather") == 0, "operand was gathered"
    np.testing.assert_array_equal(np.asarray(f(xqs)), np.asarray(y0))


def test_winograd_2d_mesh_train_step():
    """model.winograd under the 2D dp×sp mesh (pipeline.mesh
    {data,spatial}): the partitioner reshards the spatially-sharded
    activations onto the batch-parallel kernel contract (a gather along
    H — correctness path; dp is the perf path), and the step's loss
    matches the single-device step to f32 noise."""
    from jax.sharding import Mesh
    from sres_tpu.models import build_model
    from sres_tpu.trainer.step import (StepConfig, build_optimizer,
                                       build_train_step, init_state)

    mcfg = dict(name="rcan", nfeatures=64, nlayers=1, nblocks=1,
                cbottleneck=2, kernel_size=3, downscale_factors=[2, 2],
                loss_fn="l2", lane_pack=2, winograd=2)
    model = build_model(mcfg, 1, 1, precision="f32")
    sc = StepConfig(scale=4, downscale_factors=(2, 2), down_mode="bicubic",
                    up_mode="bicubic", loss_fn="l2", data_downsample=1.0,
                    target_idx=(0,), nchannels_in=1, has_bn=False)

    class _T(dict):
        def get(self, k, d=None):
            return dict.get(self, k, d)

        def __getattr__(self, k):
            return self[k]

    opt = build_optimizer(_T(lr=1e-4))
    lr0 = jnp.zeros((1, 12, 12, 1), jnp.float32)
    hr = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 1, 48, 48)), jnp.float32)
    wt = jnp.ones((8,), jnp.float32)
    devices = np.asarray(jax.devices())

    losses = []
    for mesh in (Mesh(devices.reshape(4, 2), ("data", "spatial")),
                 Mesh(devices[:1], ("data",))):
        st, _ = init_state(model, opt, lr0, seed=0)
        _, m = build_train_step(model, opt, sc, mesh)(st, hr, wt)
        losses.append(float(m["mloss"]))
    assert abs(losses[0] - losses[1]) < 1e-5, losses


def test_partition_kill_switch(monkeypatch):
    """SRES_PALLAS_GSPMD=0 routes callers to the raw pallas calls (no
    custom_partitioning wrapper) with identical results — the documented
    escape hatch if a partitioner regression ever lands."""
    t, h, w = 4, 8, 8
    x, wt, b = _data(t=t, h=h, w=w)
    xq = to_quad(x, wino_spec(2, h, w))
    y_on = wino_conv_quad(xq, wt, b, 2, (h, w), relu=True, bs=2)
    monkeypatch.setenv("SRES_PALLAS_GSPMD", "0")
    y_off = wino_conv_quad(xq, wt, b, 2, (h, w), relu=True, bs=2)
    np.testing.assert_array_equal(np.asarray(y_on), np.asarray(y_off))
