"""Training-dynamics parity: N Adam steps on the reference's own torch
modules (reference loss = RMSE, torch.optim.Adam with the reference's
settings — dual_trainer.py:126,313-323) must produce the same parameter
trajectory as our optax step on imported weights, for ALL TEN archs: the
six stateless ones here, the four BN/stateful ones in the mutable-stats
harness below. This extends the golden forward-parity proof to the full
train step: loss math, gradients, optimizer update, and BN running-stat
semantics."""
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
    # the reference hardcodes MLABlock dim=288 = 32 feats × 9 taps
    "esrt": dict(name="esrt", nfeatures=32, nlayers=1, kernel_size=3,
                 downscale_factors=[2, 2]),
}
LR, STEPS, B = 1e-3, 3, 4

# BN/stateful archs (srdn/unet/mscnn/lapsrn): the mutable-batch-stats harness
# below additionally checks running-stat and eval-forward parity — torch
# updates running_var with the UNBIASED batch variance, which
# models/layers.py:_TorchBNCore reproduces (flax nn.BatchNorm does not;
# round-2 verdict item #4). lapsrn/mscnn also exercise the multiscale
# pyramid loss (reference dual_trainer.py:214-234).
BN_CFGS = {
    "srdn": dict(name="srdn", nfeatures={"hidden": 8, "upscale": 4}, nlayers=2,
                 kernel_size={"features": 5, "hidden": 3, "output": 1},
                 downscale_factors=[2, 2]),
    "unet": dict(name="unet", nfeatures=8, nlayers=2, kernel_size=3,
                 downscale_factors=[2, 2]),
    "mscnn": dict(name="mscnn", nfeatures=8, nlayers=2, kernel_size=3,
                  downscale_factors=[2, 2], ups_mode="bicubic"),
    "lapsrn": dict(name="lapsrn", nfeatures=8, kernel_size=3,
                   downscale_factors=[2, 2], ups_mode="bicubic"),
}


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

    tstate = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    ours_final = import_variables(arch, tstate, MCFG)["params"]
    nviol, ntot, maxabs = 0, 0, 0.0
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(params)[0],
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(ours_final)[0],
                   key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        a, b = np.asarray(a), np.asarray(b)
        if arch == "esrt":
            # esrt: ~10 of 750k elements flip Adam's update sign — where
            # |grad| ~ f32 conv-order drift, torch and XLA disagree on the
            # sign and the element moves up to ±lr per step apart (chaotic,
            # not a mapping bug: losses match to 2e-6). Assert tolerance on
            # the bulk (tree-global budget) and bound the stragglers by the
            # only scale Adam can move them: steps·lr.
            nviol += int((~np.isclose(a, b, rtol=5e-4, atol=5e-5)).sum())
            ntot += a.size
            maxabs = max(maxabs, float(np.max(np.abs(a - b))))
        else:
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6,
                                       err_msg=str(pa))
    if arch == "esrt":
        assert nviol <= 1e-4 * ntot, f"{nviol}/{ntot} violations"
        assert maxabs < STEPS * LR * 1.5, maxabs


def _torch_ref_loss(out, y):
    """The reference's loss dispatcher for l2 (dual_trainer.py:205-234):
    single tensor → RMSE; pyramid list → sum of per-level RMSEs against
    bilinear-downsampled targets (the summed mloss is what backprops)."""
    import torch
    import torch.nn.functional as F

    def rmse(a, b):
        return torch.sqrt(torch.mean((a - b) ** 2))

    if not isinstance(out, (list, tuple)):
        return rmse(out, y), rmse(out, y)
    targets = [y]
    for _ in range(len(out) - 1):
        targets.append(F.interpolate(targets[-1], scale_factor=0.5, mode="bilinear"))
    targets.reverse()
    mloss = sum(rmse(o, t) for o, t in zip(out, targets))
    return rmse(out[-1], y), mloss


@requires_reference
@pytest.mark.parametrize("arch", sorted(BN_CFGS))
def test_adam_step_parity_bn_archs(arch):
    """Training-dynamics parity for the BN/stateful archs: N torch-Adam
    train-mode steps == N of our mutable-batch-stats steps — losses, BN
    running stats (unbiased-var update), and the post-training EVAL-mode
    forward all match."""
    import torch
    MCFG = BN_CFGS[arch]
    extra = {"temporal_features": None} if arch == "unet" else {}
    if arch == "mscnn":
        extra["unet_depth"] = MCFG["nlayers"]  # reference bug, see golden test
    tmodel = get_ref_model(arch, MCFG, 1, 1, **extra).train()
    tstate0 = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}

    rng = np.random.default_rng(0)
    xs = rng.normal(size=(STEPS, B, 1, 12, 12)).astype(np.float32)
    ys = rng.normal(size=(STEPS, B, 1, 48, 48)).astype(np.float32)
    xe = rng.normal(size=(B, 1, 12, 12)).astype(np.float32)

    # --- reference side (train mode: batch stats normalize, running update)
    opt = torch.optim.Adam(tmodel.parameters(), lr=LR, weight_decay=0.0)
    tlosses = []
    for i in range(STEPS):
        opt.zero_grad()
        out = tmodel(torch.tensor(xs[i]))
        _, mloss = _torch_ref_loss(out, torch.tensor(ys[i]))
        mloss.backward()
        opt.step()
        tlosses.append(float(mloss.detach()))
    tmodel.eval()
    with torch.no_grad():
        ref_eval = tmodel(torch.tensor(xe))
    ref_eval = ref_eval[-1] if isinstance(ref_eval, (list, tuple)) else ref_eval

    # --- our side: imported weights+stats, train=True mutable batch_stats
    variables = import_variables(arch, tstate0, MCFG)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    model = build_model(MCFG, 1, 1, precision="f32")
    from sres_tpu.ops.resize import multiscale_targets
    from sres_tpu.trainer.losses import sr_loss
    optimizer = optax.adam(LR)
    opt_state = optimizer.init(params)
    weight = jnp.ones((B,), jnp.float32)

    @jax.jit
    def step(params, bstats, opt_state, x, y):
        def loss_fn(p):
            out, mut = model.apply({"params": p, "batch_stats": bstats}, x,
                                   train=True, mutable=["batch_stats"])
            if isinstance(out, (list, tuple)):
                tgts = multiscale_targets(y, (2, 2), "bilinear")
                sloss, mloss = sr_loss(list(out), tgts, weight, "l2")
            else:
                sloss, mloss = sr_loss(out, y, weight, "l2")
            return mloss, mut["batch_stats"]
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    jlosses = []
    for i in range(STEPS):
        params, bstats, opt_state, loss = step(
            params, bstats, opt_state,
            jnp.asarray(xs[i].transpose(0, 2, 3, 1)),
            jnp.asarray(ys[i].transpose(0, 2, 3, 1)))
        jlosses.append(float(loss))
    np.testing.assert_allclose(jlosses, tlosses, rtol=2e-5, atol=2e-6)

    # running stats match torch's (unbiased running-var update). srdn needs
    # looser tolerances: a single step matches to 1e-7 (probed), but its 5x5
    # feature conv + PReLU + momentum-0.5 stats amplify f32 conv-order drift
    # over 3 coupled Adam steps
    srtol, satol = (5e-3, 3e-4) if arch == "srdn" else (5e-4, 1e-5)
    tstate = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    ref_final = import_variables(arch, tstate, MCFG)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(bstats)[0],
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(
                ref_final["batch_stats"])[0], key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=srtol, atol=satol, err_msg=f"stats {pa}")

    # post-training EVAL forward (uses the running stats) matches
    ours_eval = model.apply({"params": params, "batch_stats": bstats},
                            jnp.asarray(xe.transpose(0, 2, 3, 1)), train=False)
    ours_eval = ours_eval[-1] if isinstance(ours_eval, (list, tuple)) else ours_eval
    ftol = 1e-3 if arch == "srdn" else 1e-4
    np.testing.assert_allclose(
        np.asarray(ours_eval).transpose(0, 3, 1, 2), ref_eval.numpy(),
        rtol=ftol, atol=ftol)


@requires_reference
def test_bn_padded_batch_stats_parity():
    """Padding-aware BatchNorm statistics (models/layers.py bn_sample_weight,
    round 4): a batch padded with zero-weight samples — which the trainer
    must produce for static jit shapes whenever batch % n_devices != 0 —
    normalizes, outputs, and updates running stats EXACTLY like torch seeing
    only the valid samples (reference BN: sres/model/common/unet.py:14-16;
    the reference runs eager with dynamic shapes and never pads)."""
    import torch
    from sres_tpu.models.layers import bn_sample_weight

    mcfg = BN_CFGS["unet"]
    tmodel = get_ref_model("unet", mcfg, 1, 1, temporal_features=None).train()
    tstate0 = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    variables = import_variables("unet", tstate0, mcfg)
    model = build_model(mcfg, 1, 1, precision="f32")

    x = np.random.default_rng(5).normal(size=(3, 1, 12, 12)).astype(np.float32)
    with torch.no_grad():
        yt = tmodel(torch.tensor(x)).numpy()
    tstate = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    ref_after = import_variables("unet", tstate, mcfg)

    # ours: 3 valid + 5 zero-padding samples, weights mark the padding
    xp = np.concatenate([x, np.zeros((5,) + x.shape[1:], np.float32)], 0)
    w = jnp.asarray([1.0] * 3 + [0.0] * 5, jnp.float32)
    with bn_sample_weight(w):
        yo, mut = model.apply(variables, jnp.asarray(xp.transpose(0, 2, 3, 1)),
                              train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yo)[:3].transpose(0, 3, 1, 2), yt,
                               rtol=1e-5, atol=1e-5)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(mut["batch_stats"])[0],
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(
                ref_after["batch_stats"])[0], key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=f"stats {pa}")

    # all-padding batch (the grad-accum ragged-tail case: zero inputs, zero
    # weights): finite outputs, running stats untouched
    w0 = jnp.zeros((8,), jnp.float32)
    with bn_sample_weight(w0):
        y0, mut0 = model.apply(variables,
                               jnp.zeros((8, 12, 12, 1), jnp.float32),
                               train=True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y0)).all()
    for a, b in zip(jax.tree_util.tree_leaves(mut0["batch_stats"]),
                    jax.tree_util.tree_leaves(variables["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
