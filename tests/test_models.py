"""Model-zoo construction + golden-shape tests (SURVEY.md §4 test pyramid).
Every architecture must initialize from its YAML config and map a
(B, 48, 48, C) LR batch to the (B, 192, 192, C_out) HR shape (×4 = 2×2
stages), or a pyramid of per-stage shapes for multiscale models."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml
from pathlib import Path

from sres_tpu.models import build_model

CONFIG_DIR = Path(__file__).resolve().parent.parent / "config" / "model"

CASES = [
    ("rcan-10-10-64", 1), ("edsr", 1), ("vdsr", 1), ("latticenet", 1),
    ("dbpn", 1), ("srdn", 1), ("unet", 1), ("lapsrn", 1), ("mscnn", 1),
    ("esrt", 1), ("rcan-10-10-64", 2),
]


def _load(name):
    return yaml.safe_load((CONFIG_DIR / f"{name}.yaml").read_text())


@pytest.mark.parametrize("cfg_name,nch", CASES)
def test_forward_shapes(cfg_name, nch):
    mcfg = _load(cfg_name)
    # shrink the heavyweight models for test speed
    if mcfg["name"] in ("rcan",):
        mcfg.update(nlayers=2, nblocks=2)
    if mcfg["name"] in ("edsr", "srdn"):
        mcfg.update(nlayers=2)
    if mcfg["name"] in ("unet", "mscnn"):
        mcfg.update(nlayers=2)  # UNet depth: input must divide 2^depth
    if mcfg["name"] == "dbpn":
        mcfg.update(depth=2)
    size = 24 if mcfg["name"] != "esrt" else 16  # esrt needs H*W % 4 == 0
    tf = np.zeros((2, 4), np.float32) if mcfg["name"] == "unet" else None
    model = build_model(mcfg, nchannels_in=nch, nchannels_out=nch,
                        precision="f32", temporal_features=tf)
    x = jnp.zeros((2, size, size, nch), jnp.float32)
    kwargs = dict(temporal=jnp.asarray(tf)) if tf is not None else {}
    variables = model.init(jax.random.PRNGKey(0), x, train=False, **kwargs)
    if "batch_stats" in variables:
        y, _ = model.apply(variables, x, train=False, **kwargs, mutable=["batch_stats"])
    else:
        y = model.apply(variables, x, train=False, **kwargs)
    if isinstance(y, tuple):  # multiscale pyramid
        assert [t.shape[1] for t in y] == [size * 2, size * 4]
        assert y[-1].shape == (2, size * 4, size * 4, nch)
    else:
        assert y.shape == (2, size * 4, size * 4, nch)
        assert y.dtype == jnp.float32


def test_param_count_rcan_canonical():
    """RCAN-10-20-64 single-channel parameter count — the reference logs
    ntotal_params (dual_trainer.py:343); pin it for regression."""
    mcfg = _load("rcan-10-20-64")
    model = build_model(mcfg, 1, 1, precision="f32")
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)), train=False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    # head 640 + 10 groups × (20 RCABs × (2×36928 + CA 4192) + 36928)
    # + body conv 36928 + pixel-shuffle tail 2×147712 + out conv 577
    assert n == 16_312_449, n


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        build_model({"name": "nope"}, 1, 1)


def test_rcan_lane_pack_equivalence():
    """model.lane_pack=2 (block-diagonal trunk convs on two tiles' packed
    channels — the MXU lane-occupancy optimization, PERF.md) is numerically
    equivalent to the unpacked model and shares its param tree."""
    import jax
    import jax.numpy as jnp
    mcfg = dict(name="rcan", nfeatures=16, nlayers=2, nblocks=2, cbottleneck=2,
                kernel_size=3, downscale_factors=[2, 2])
    m1 = build_model(mcfg, 1, 1, precision="f32")
    m2 = build_model({**mcfg, "lane_pack": 2}, 1, 1, precision="f32")
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 12, 12, 1), jnp.float32)
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(v1) == jax.tree.structure(v2)
    y1 = m1.apply(v1, x, train=False)
    y2 = m2.apply(v1, x, train=False)   # same params through the packed path
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-6, atol=2e-6)
    # odd batch exercises the internal pad/unpad
    xo = x[:5]
    np.testing.assert_allclose(np.asarray(m2.apply(v1, xo, train=False)),
                               np.asarray(m1.apply(v1, xo, train=False)),
                               rtol=2e-6, atol=2e-6)
    # gradients must match too (training runs packed)
    def loss(m, v, x):
        return jnp.sum(m.apply(v, x, train=False) ** 2)
    g1 = jax.grad(lambda v: loss(m1, v, x))(v1)
    g2 = jax.grad(lambda v: loss(m2, v, x))(v1)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_edsr_lane_pack_equivalence():
    """EDSR lane_pack=2 (same lane optimization as RCAN) is numerically
    identical and shares the unpacked param tree."""
    import jax
    import jax.numpy as jnp
    mcfg = dict(name="edsr", nfeatures=16, nlayers=3, kernel_size=3,
                downscale_factors=[2, 2])
    m1 = build_model(mcfg, 1, 1, precision="f32")
    m2 = build_model({**mcfg, "lane_pack": 2}, 1, 1, precision="f32")
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 12, 12, 1), jnp.float32)
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(v1) == jax.tree.structure(
        m2.init(jax.random.PRNGKey(0), x, train=False))
    np.testing.assert_allclose(np.asarray(m2.apply(v1, x, train=False)),
                               np.asarray(m1.apply(v1, x, train=False)),
                               rtol=2e-6, atol=2e-6)


def test_int8_quantized_trunk():
    """model.quantization: int8 (opt-in AQT path, ROADMAP #5): same param
    tree as the full-precision model, forward within int8 quantization
    tolerance of it, and works through the lane-packed trunk. SERVING-ONLY
    (round 3): differentiating through the AQT conv raises — its raw
    round/clip has no STE, so trunk gradients would silently vanish."""
    import pytest
    import jax
    import jax.numpy as jnp
    mcfg = dict(name="rcan", nfeatures=16, nlayers=2, nblocks=2,
                cbottleneck=2, kernel_size=3, downscale_factors=[2, 2])
    m_fp = build_model(mcfg, 1, 1, precision="f32")
    m_q = build_model({**mcfg, "quantization": "int8"}, 1, 1, precision="f32")
    m_qp = build_model({**mcfg, "quantization": "int8", "lane_pack": 2},
                       1, 1, precision="f32")
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 12, 12, 1), jnp.float32)
    v = m_fp.init(jax.random.PRNGKey(0), x, train=False)
    # identical param trees: int8 is a runtime execution mode, not a
    # different checkpoint format
    assert jax.tree.structure(v) == jax.tree.structure(
        m_q.init(jax.random.PRNGKey(0), x, train=False))
    y_fp = np.asarray(m_fp.apply(v, x, train=False))
    y_q = np.asarray(m_q.apply(v, x, train=False))
    rel = np.linalg.norm(y_q - y_fp) / np.linalg.norm(y_fp)
    assert 0 < rel < 0.05, rel          # quantized: close but not identical
    # packed path quantizes per packed conv — compare against unpacked int8
    y_qp = np.asarray(m_qp.apply(v, x, train=False))
    rel_pk = np.linalg.norm(y_qp - y_fp) / np.linalg.norm(y_fp)
    assert rel_pk < 0.05, rel_pk
    with pytest.raises(NotImplementedError, match="SERVING-ONLY"):
        jax.grad(lambda v: jnp.sum(m_q.apply(v, x, train=False) ** 2))(v)


def test_int8_quantized_vdsr():
    """quantization: int8 also covers the VDSR conv stack (BasicBlock
    threading); same param tree, quantization-tolerance forward; serving-
    only (grads raise, see test_int8_quantized_trunk)."""
    import pytest
    import jax
    import jax.numpy as jnp
    mcfg = dict(name="vdsr", nfeatures=16, nlayers=4, kernel_size=3,
                downscale_factors=[2, 2])
    m_fp = build_model(mcfg, 1, 1, precision="f32")
    m_q = build_model({**mcfg, "quantization": "int8"}, 1, 1, precision="f32")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 12, 1), jnp.float32)
    v = m_fp.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(v) == jax.tree.structure(
        m_q.init(jax.random.PRNGKey(0), x, train=False))
    y_fp = np.asarray(m_fp.apply(v, x, train=False))
    y_q = np.asarray(m_q.apply(v, x, train=False))
    rel = np.linalg.norm(y_q - y_fp) / np.linalg.norm(y_fp)
    assert 0 < rel < 0.05, rel
    with pytest.raises(NotImplementedError, match="SERVING-ONLY"):
        jax.grad(lambda v: jnp.sum(m_q.apply(v, x, train=False) ** 2))(v)


def test_int8_fused_training_tracks_f32():
    """Regression for the measured quantized-training property (PERF.md):
    over short horizons the int8_fused STE trajectory tracks f32 closely
    (divergence only appears near convergence). 20 Adam steps on identical
    data: per-step loss gap < 5e-3. (The AQT 'int8' mode is serving-only —
    round 3 found its conv blocks gradients, so the former version of this
    test was tracking a frozen-trunk run.)"""
    import jax
    import jax.numpy as jnp
    import optax
    from sres_tpu.parallel.mesh import get_mesh
    from sres_tpu.trainer.step import StepConfig, build_train_step, init_state

    losses = {}
    for quant in (None, "int8_fused"):
        mcfg = dict(name="rcan", nfeatures=8, nlayers=1, nblocks=2,
                    cbottleneck=2, kernel_size=3, downscale_factors=[2, 2],
                    loss_fn="l2", quantization=quant)
        model = build_model(mcfg, 1, 1, precision="f32")
        opt = optax.adam(1e-3)
        state, has_bn = init_state(model, opt, jnp.zeros((1, 12, 12, 1), jnp.float32),
                                   seed=0)
        sc = StepConfig(scale=4, downscale_factors=(2, 2), down_mode="bicubic",
                        up_mode="bicubic", loss_fn="l2", data_downsample=1.0,
                        target_idx=(0,), nchannels_in=1, has_bn=has_bn)
        step = build_train_step(model, opt, sc, get_mesh({"data": 1}))
        rng = np.random.default_rng(0)
        hr = jnp.asarray(rng.normal(size=(4, 1, 48, 48)).astype(np.float32))
        w = jnp.ones((4,), jnp.float32)
        ls = []
        for _ in range(20):
            state, m = step(state, hr, w)
            ls.append(float(m["mloss"]))
        losses[str(quant)] = np.array(ls)
    gap = np.abs(losses["None"] - losses["int8_fused"])
    assert losses["int8_fused"][-1] < losses["int8_fused"][0]  # it trains
    assert gap.max() < 5e-3, gap.max()                 # and tracks f32
