"""Fused lane-packed ResidualGroup kernel (ops/pallas/attic/residual_group.py):
interpret-mode equivalence of forward AND gradients vs the plain XLA
ResidualGroup composition on identical logical params."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sres_tpu.models.fused import FusedResidualGroup, residual_group_params_to_fused
from sres_tpu.models.layers import ResidualGroup, pack_tiles, unpack_tiles

NF, RED, NB = 64, 2, 3
T, H, W = 2, 10, 12   # rectangular + small


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2 * T, H, W, NF), jnp.float32) * 0.5
    ref = ResidualGroup(NF, 3, RED, NB)
    vref = ref.init(jax.random.PRNGKey(1), x)
    fused = FusedResidualGroup(NF, RED, NB)
    fparams = residual_group_params_to_fused(vref["params"], NB)
    return x, ref, vref, fused, fparams


def test_forward_matches_xla(setup):
    x, ref, vref, fused, fparams = setup
    want = ref.apply(vref, x)
    got_packed = fused.apply({"params": fparams}, pack_tiles(x, 2))
    got = unpack_tiles(got_packed, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_xla(setup):
    x, ref, vref, fused, fparams = setup

    def loss_ref(params, x):
        return jnp.sum(ref.apply({"params": params}, x) ** 2)

    def loss_fused(params, x):
        y = unpack_tiles(fused.apply({"params": params}, pack_tiles(x, 2)), 2)
        return jnp.sum(y ** 2)

    (lr_, gr), (lf, gf) = (jax.value_and_grad(loss_ref, argnums=(0, 1))(vref["params"], x),
                           jax.value_and_grad(loss_fused, argnums=(0, 1))(fparams, x))
    np.testing.assert_allclose(float(lf), float(lr_), rtol=1e-5)
    # input grads
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               rtol=5e-4, atol=5e-4)
    # weight grads: map the nested reference grads into the fused layout
    gref_f = residual_group_params_to_fused(gr[0], NB)
    for k in gf[0]:
        np.testing.assert_allclose(np.asarray(gf[0][k]), np.asarray(gref_f[k]),
                                   rtol=5e-4, atol=5e-4, err_msg=k)


def test_rcan_fused_group_equivalence():
    """RCAN with model.fused=true (Pallas group kernel, packed trunk) matches
    the unfused model numerically; param trees differ (flat stacked vs nested
    — see models/fused.py) so compare through converted params."""
    from sres_tpu.models import build_model
    mcfg = dict(name="rcan", nfeatures=64, nlayers=2, nblocks=2, cbottleneck=2,
                kernel_size=3, downscale_factors=[2, 2])
    m_ref = build_model(mcfg, 1, 1, precision="f32")
    m_fused = build_model({**mcfg, "fused": True}, 1, 1, precision="f32")
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 1), jnp.float32)
    vref = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    vf = m_fused.init(jax.random.PRNGKey(0), x, train=False)
    # graft the reference's params into the fused tree
    pf = dict(vf["params"])
    for g in range(2):
        pf[f"FusedResidualGroup_{g}"] = residual_group_params_to_fused(
            vref["params"][f"ResidualGroup_{g}"], 2)
    for k in vref["params"]:
        if not k.startswith("ResidualGroup"):
            pf[k] = vref["params"][k]
    y_ref = m_ref.apply(vref, x, train=False)
    y_f = m_fused.apply({"params": pf}, x, train=False)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=5e-5, atol=5e-5)


def test_rcan_fused_checkpoint_roundtrip():
    """Unfused ↔ fused RCAN param-tree conversion round-trips and the
    converted trees restore into freshly-initialized models."""
    import jax
    from flax import serialization
    from sres_tpu.models import build_model
    from sres_tpu.models.fused import rcan_params_from_fused, rcan_params_to_fused
    mcfg = dict(name="rcan", nfeatures=64, nlayers=2, nblocks=2, cbottleneck=2,
                kernel_size=3, downscale_factors=[2, 2])
    m_ref = build_model(mcfg, 1, 1, precision="f32")
    m_fused = build_model({**mcfg, "fused": True}, 1, 1, precision="f32")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1), jnp.float32)
    pu = m_ref.init(jax.random.PRNGKey(1), x, train=False)["params"]
    pf = rcan_params_to_fused(pu, 2, 2)
    fresh_f = m_fused.init(jax.random.PRNGKey(2), x, train=False)["params"]
    restored = serialization.from_state_dict(fresh_f, serialization.to_state_dict(pf))
    assert jax.tree.structure(restored) == jax.tree.structure(fresh_f)
    back = rcan_params_from_fused(pf, 2, 2)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(pu)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the fused model with converted params equals the unfused model
    y1 = m_ref.apply({"params": pu}, x, train=False)
    y2 = m_fused.apply({"params": pf}, x, train=False)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=5e-5, atol=5e-5)
