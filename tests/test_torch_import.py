"""Reference-checkpoint import: a synthetic torch state dict with the
reference's RCAN module naming is imported into the flax model, and the flax
forward must match a torch *functional* evaluation of the same weights —
end-to-end numeric parity of the architecture + layout conversion."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sres_tpu.models import build_model
from sres_tpu.util.torch_import import import_rcan

NL, NB, NF, RED = 2, 2, 8, 2


def _synthetic_state(rng):
    """Random tensors under the reference's RCAN state-dict names
    (rcan/network.py head/body/tail structure)."""
    t = lambda *s: torch.tensor(rng.normal(scale=0.1, size=s).astype(np.float32))
    sd = {"head.0.weight": t(NF, 1, 3, 3), "head.0.bias": t(NF)}
    for g in range(NL):
        for b in range(NB):
            base = f"body.{g}.body.{b}"
            sd[f"{base}.body.0.weight"] = t(NF, NF, 3, 3)
            sd[f"{base}.body.0.bias"] = t(NF)
            sd[f"{base}.body.2.weight"] = t(NF, NF, 3, 3)
            sd[f"{base}.body.2.bias"] = t(NF)
            sd[f"{base}.body.3.conv_du.0.weight"] = t(NF // RED, NF, 1, 1)
            sd[f"{base}.body.3.conv_du.0.bias"] = t(NF // RED)
            sd[f"{base}.body.3.conv_du.2.weight"] = t(NF, NF // RED, 1, 1)
            sd[f"{base}.body.3.conv_du.2.bias"] = t(NF)
        sd[f"body.{g}.body.{NB}.weight"] = t(NF, NF, 3, 3)
        sd[f"body.{g}.body.{NB}.bias"] = t(NF)
    sd[f"body.{NL}.weight"] = t(NF, NF, 3, 3)
    sd[f"body.{NL}.bias"] = t(NF)
    sd["tail.0.0.weight"] = t(4 * NF, NF, 3, 3)
    sd["tail.0.0.bias"] = t(4 * NF)
    sd["tail.0.2.weight"] = t(4 * NF, NF, 3, 3)
    sd["tail.0.2.bias"] = t(4 * NF)
    sd["tail.1.weight"] = t(1, NF, 3, 3)
    sd["tail.1.bias"] = t(1)
    return sd


def _torch_forward(sd, x):
    """Procedural torch evaluation of the RCAN graph from the state dict."""
    c = lambda y, n, p=1: F.conv2d(y, sd[f"{n}.weight"], sd[f"{n}.bias"], padding=p)
    y = c(x, "head.0")
    res = y
    for g in range(NL):
        gr = res
        for b in range(NB):
            base = f"body.{g}.body.{b}"
            r = c(gr, f"{base}.body.0")
            r = F.relu(r)
            r = c(r, f"{base}.body.2")
            a = r.mean(dim=(2, 3), keepdim=True)
            a = F.relu(c(a, f"{base}.body.3.conv_du.0", p=0))
            a = torch.sigmoid(c(a, f"{base}.body.3.conv_du.2", p=0))
            gr = gr + r * a
        res = res + c(gr, f"body.{g}.body.{NB}")
    y = y + c(res, f"body.{NL}")
    y = F.pixel_shuffle(c(y, "tail.0.0"), 2)
    y = F.pixel_shuffle(c(y, "tail.0.2"), 2)
    return c(y, "tail.1")


def test_rcan_import_matches_torch_forward():
    rng = np.random.default_rng(0)
    sd = _synthetic_state(rng)
    torch_np = {k: v.numpy() for k, v in sd.items()}
    params = import_rcan(torch_np, nlayers=NL, nblocks=NB)

    mcfg = dict(name="rcan", nfeatures=NF, nlayers=NL, nblocks=NB,
                cbottleneck=RED, kernel_size=3, downscale_factors=[2, 2])
    model = build_model(mcfg, 1, 1, precision="f32")
    x = rng.normal(size=(2, 1, 12, 12)).astype(np.float32)
    ours = model.apply({"params": params},
                       jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    theirs = _torch_forward(sd, torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours)[..., 0], theirs[:, 0],
                               rtol=2e-5, atol=2e-5)


def test_import_tree_structure_matches():
    """Imported tree must restore into a freshly-initialized model."""
    from flax import serialization
    rng = np.random.default_rng(1)
    sd = {k: v.numpy() for k, v in _synthetic_state(rng).items()}
    params = import_rcan(sd, NL, NB)
    mcfg = dict(name="rcan", nfeatures=NF, nlayers=NL, nblocks=NB,
                cbottleneck=RED, kernel_size=3, downscale_factors=[2, 2])
    model = build_model(mcfg, 1, 1, precision="f32")
    fresh = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)), train=False)["params"]
    restored = serialization.from_state_dict(fresh, params)
    assert jax.tree.structure(restored) == jax.tree.structure(fresh)


def test_edsr_import_structure():
    from flax import serialization
    from sres_tpu.util.torch_import import import_model
    rng = np.random.default_rng(2)
    t = lambda *s: rng.normal(scale=0.1, size=s).astype(np.float32)
    nf, nl = 8, 2
    sd = {"head.0.weight": t(nf, 1, 3, 3), "head.0.bias": t(nf)}
    for i in range(nl):
        sd[f"body.{i}.body.0.weight"] = t(nf, nf, 3, 3)
        sd[f"body.{i}.body.0.bias"] = t(nf)
        sd[f"body.{i}.body.2.weight"] = t(nf, nf, 3, 3)
        sd[f"body.{i}.body.2.bias"] = t(nf)
    sd[f"body.{nl}.weight"] = t(nf, nf, 3, 3)
    sd[f"body.{nl}.bias"] = t(nf)
    sd["tail.0.0.weight"] = t(4 * nf, nf, 3, 3)
    sd["tail.0.0.bias"] = t(4 * nf)
    sd["tail.0.2.weight"] = t(4 * nf, nf, 3, 3)
    sd["tail.0.2.bias"] = t(4 * nf)
    sd["tail.1.weight"] = t(1, nf, 3, 3)
    sd["tail.1.bias"] = t(1)
    params = import_model("edsr", sd, dict(nlayers=nl))
    mcfg = dict(name="edsr", nfeatures=nf, nlayers=nl, kernel_size=3,
                downscale_factors=[2, 2])
    model = build_model(mcfg, 1, 1, precision="f32")
    fresh = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)), train=False)["params"]
    from flax import serialization as ser
    restored = ser.from_state_dict(fresh, params)
    assert jax.tree.structure(restored) == jax.tree.structure(fresh)


def test_torch_export_roundtrip():
    """flax → torch export (util/torch_export.py) inverts the importer
    exactly: fresh RCAN/EDSR params survive export → import bit-for-bit,
    and exported key sets match the reference's module names."""
    from sres_tpu.util.torch_export import export_edsr, export_rcan
    from sres_tpu.util.torch_import import import_edsr, import_rcan

    nf, nl, nb = 8, 2, 2
    mcfg = dict(name="rcan", nfeatures=nf, nlayers=nl, nblocks=nb,
                cbottleneck=2, kernel_size=3, downscale_factors=[2, 2])
    model = build_model(mcfg, 1, 1, precision="f32")
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 8, 8, 1)),
                        train=False)["params"]
    tw = export_rcan(params, nl, nb)
    assert "head.0.weight" in tw and f"body.{nl}.bias" in tw \
        and "tail.0.2.weight" in tw and "tail.1.bias" in tw
    assert tw["head.0.weight"].shape == (nf, 1, 3, 3)
    back = import_rcan(tw, nl, nb)
    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(jax.tree.map(jnp.asarray, back))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    mcfg = dict(name="edsr", nfeatures=nf, nlayers=nl, kernel_size=3,
                downscale_factors=[2, 2])
    model = build_model(mcfg, 1, 1, precision="f32")
    params = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 8, 8, 1)),
                        train=False)["params"]
    back = import_edsr(export_edsr(params, nl), nl)
    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(jax.tree.map(jnp.asarray, back))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_export_vdsr_roundtrip():
    from sres_tpu.util.torch_export import export_vdsr
    from sres_tpu.util.torch_import import import_vdsr

    nf, nl = 8, 4
    mcfg = dict(name="vdsr", nfeatures=nf, nlayers=nl, kernel_size=3,
                downscale_factors=[2, 2])
    model = build_model(mcfg, 1, 1, precision="f32")
    params = model.init(jax.random.PRNGKey(6), jnp.zeros((1, 8, 8, 1)),
                        train=False)["params"]
    tw = export_vdsr(params, nl)
    assert f"body.{nl - 1}.0.weight" in tw and tw["body.0.0.weight"].shape == (nf, 1, 3, 3)
    back = import_vdsr(tw, nl)["params"]
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
