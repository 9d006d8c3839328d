"""Training-dynamics parity: N Adam steps on the reference's own torch RCAN
(reference loss = RMSE, torch.optim.Adam with the reference's settings —
dual_trainer.py:126,313-323) must produce the same parameter trajectory as
our optax step on imported weights. This extends the golden forward-parity
proof to the full train step: loss math, gradients, and optimizer update."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from ref_zoo import get_ref_model, requires_reference
from sres_tpu.models import build_model
from sres_tpu.util.torch_import import import_variables

CFGS = {
    "rcan": dict(name="rcan", nfeatures=8, nlayers=1, nblocks=2, cbottleneck=2,
                 kernel_size=3, downscale_factors=[2, 2]),
    "edsr": dict(name="edsr", nfeatures=8, nlayers=2, kernel_size=3,
                 downscale_factors=[2, 2]),
    "vdsr": dict(name="vdsr", nfeatures=8, nlayers=4, kernel_size=3,
                 downscale_factors=[2, 2]),
    "dbpn": dict(name="dbpn", nfeatures=8, nprojectionfeatures=4, depth=2,
                 kernel_size=3, downscale_factors=[2, 2]),
    "latticenet": dict(name="latticenet", nfeatures=16, ndiff=4, kernel_size=3,
                       downscale_factors=[2, 2]),
}
# srdn/esrt carry BatchNorm: batch-mode stats during training need the
# mutable-batch-stats step (covered by forward golden parity + test_zoo
# training); the plain-Adam harness here covers the BN-free archs
LR, STEPS, B = 1e-3, 3, 4


@requires_reference
@pytest.mark.parametrize("arch", sorted(CFGS))
def test_adam_step_parity_vs_reference_torch(arch):
    import torch
    MCFG = CFGS[arch]
    tmodel = get_ref_model(arch, MCFG, 1, 1)
    tmodel = tmodel.train()
    tstate0 = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}

    rng = np.random.default_rng(0)
    xs = rng.normal(size=(STEPS, B, 1, 12, 12)).astype(np.float32)
    ys = rng.normal(size=(STEPS, B, 1, 48, 48)).astype(np.float32)

    # --- reference side: torch Adam + RMSE loss (dual_trainer.py:126,205,313)
    opt = torch.optim.Adam(tmodel.parameters(), lr=LR, weight_decay=0.0)
    tlosses = []
    for i in range(STEPS):
        opt.zero_grad()
        out = tmodel(torch.tensor(xs[i]))
        loss = torch.sqrt(torch.mean((out - torch.tensor(ys[i])) ** 2))
        loss.backward()
        opt.step()
        tlosses.append(float(loss.detach()))

    # --- our side: imported weights, optax.adam, our masked-RMSE loss
    params = import_variables(arch, tstate0, MCFG)["params"]
    model = build_model(MCFG, 1, 1, precision="f32")
    from sres_tpu.trainer.losses import sr_loss
    optimizer = optax.adam(LR)
    opt_state = optimizer.init(params)
    weight = jnp.ones((B,), jnp.float32)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            out = model.apply({"params": p}, x, train=False)
            sloss, mloss = sr_loss(out, y, weight, "l2")
            return mloss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jlosses = []
    for i in range(STEPS):
        params, opt_state, loss = step(
            params, opt_state,
            jnp.asarray(xs[i].transpose(0, 2, 3, 1)),
            jnp.asarray(ys[i].transpose(0, 2, 3, 1)))
        jlosses.append(float(loss))

    np.testing.assert_allclose(jlosses, tlosses, rtol=1e-5, atol=1e-6)

    # parameter trajectories agree after STEPS updates
    tstate = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    ours_final = import_variables(arch, tstate, MCFG)["params"]
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(params)[0],
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(ours_final)[0],
                   key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6, err_msg=str(pa))
