"""Fused-RCAB Pallas kernel numerics: forward and custom-VJP gradients must
match the unfused flax/XLA composition (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sres_tpu.ops.pallas.rcab import fused_rcab

B, H, W, C, RED = 4, 16, 16, 64, 2
CR = C // RED


def _ref_rcab(x, w1, b1, w2, b2, wd, bd, wu, bu):
    """Unfused reference: lax conv + explicit channel attention."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))
    h = jax.lax.conv_general_dilated(x, w1, (1, 1), "SAME", dimension_numbers=dn) + b1.reshape(1, 1, 1, -1)
    z = jnp.maximum(h, 0.0)
    r = jax.lax.conv_general_dilated(z, w2, (1, 1), "SAME", dimension_numbers=dn) + b2.reshape(1, 1, 1, -1)
    m = jnp.mean(r, axis=(1, 2))
    p = jnp.maximum(m @ wd + bd, 0.0)
    a = jax.nn.sigmoid(p @ wu + bu)
    return x + r * a[:, None, None, :]


def _params(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(scale=0.1, size=s).astype(np.float32))
    return dict(x=mk(B, H, W, C), w1=mk(3, 3, C, C), b1=mk(1, C), w2=mk(3, 3, C, C),
                b2=mk(1, C), wd=mk(C, CR), bd=mk(1, CR), wu=mk(CR, C), bu=mk(1, C))


def test_forward_matches_reference():
    p = _params()
    y = fused_rcab(p["x"], p["w1"], p["b1"], p["w2"], p["b2"],
                   p["wd"], p["bd"], p["wu"], p["bu"])
    yref = _ref_rcab(**p)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref), rtol=2e-5, atol=2e-5)


def test_gradients_match_autodiff():
    p = _params(1)
    names = ["x", "w1", "b1", "w2", "b2", "wd", "bd", "wu", "bu"]
    args = [p[n] for n in names]

    def loss_fused(*a):
        return jnp.sum(jnp.sin(fused_rcab(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_ref_rcab(*a)))

    gf = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    for n, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
                                   err_msg=f"grad mismatch for {n}")


def test_fused_rcan_model_matches_shapes():
    from sres_tpu.models import build_model
    mcfg = dict(name="rcan", nfeatures=64, nlayers=1, nblocks=2, cbottleneck=2,
                kernel_size=3, downscale_factors=[2, 2], fused=True)
    model = build_model(mcfg, 1, 1, precision="f32")
    x = jnp.zeros((2, 16, 16, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(v, x, train=False)
    assert y.shape == (2, 64, 64, 1)
