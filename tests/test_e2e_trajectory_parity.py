"""End-to-end multi-epoch training-trajectory parity vs the reference's full
stack (round-2 verdict item #4).

Our complete ModelTrainer (config → synthetic loader → tile iteration →
padding → compiled train/eval steps → checkpoint/CSV side effects) trains
for several epochs while we record the exact (hr, weight) batch stream it
consumes. The same stream is then replayed through the REFERENCE's own torch
module with the reference's loop semantics — apply_network's bicubic LR
synthesis (dual_trainer.py:557-571), RMSE loss (:205-212), torch.optim.Adam
(:126), per-batch backward/step (:322-323), interleaved per-epoch validation
(record_eval → evaluate, :349-358; NOTE the reference never calls
model.eval(): PARITY.md quirk 9) — and the per-batch train and validation
loss sequences must agree to f32 drift end-to-end. Identical data order is
by construction (the replay consumes the recording), identical init is via
util/torch_export. This would catch any silent optimizer / loss / LR /
batch-semantics drift across the whole stack, not just 3 isolated steps.
"""
import numpy as np
import pytest

import jax

from ref_zoo import get_ref_model, requires_reference
from sres_tpu.config import cfg
from sres_tpu.data.inference_io import TSet
from sres_tpu.trainer import ModelTrainer
from sres_tpu.util.torch_export import export_variables
from tests.test_trainer import synth_ctx

ARCHS = {
    "edsr": {"model.nfeatures": 16, "model.nlayers": 2},
    "rcan": {"model.nfeatures": 8, "model.nlayers": 1, "model.nblocks": 2,
             "model.cbottleneck": 2},
}
MCFG_KEYS = ["name", "nfeatures", "nlayers", "nblocks", "cbottleneck",
             "kernel_size", "downscale_factors"]


@requires_reference
@pytest.mark.parametrize("arch", sorted(ARCHS))
def test_multiepoch_full_stack_trajectory(tmp_path, arch):
    import torch
    import torch.nn.functional as F

    model_key = {"rcan": "rcan-10-10-64", "edsr": "edsr"}[arch]
    over = dict(ARCHS[arch])
    over["dataset.nan_fraction"] = 0.0  # NaN-tile handling covered elsewhere
    record = []
    with synth_ctx(tmp_path, model=model_key, **over) as cc:
        tr = ModelTrainer(cc, seed=0)
        mcfg = {k: cfg().model.get(k) for k in MCFG_KEYS
                if cfg().model.get(k) is not None}
        lr0 = float(cfg().task.lr)
        init_tw = export_variables(arch, {"params": tr.state.params}, mcfg)

        orig_train, orig_eval = tr._run_train_step, tr._run_eval_step

        def rec_train(hr, w, ctime):
            state, metrics = orig_train(hr, w, ctime)
            record.append(("train", np.array(hr), np.array(w),
                           float(metrics["sloss"])))
            return state, metrics

        def rec_eval(hr, w, ctime):
            metrics, outputs = orig_eval(hr, w, ctime)
            record.append(("eval", np.array(hr), np.array(w),
                           float(metrics["sloss"])))
            return metrics, outputs

        tr._run_train_step, tr._run_eval_step = rec_train, rec_eval
        tr.train(nepochs=4, refresh_state=True, seed=0)  # quirk: runs 3 epochs

    n_train = sum(1 for r in record if r[0] == "train")
    n_eval = sum(1 for r in record if r[0] == "eval")
    assert n_train >= 18 and n_eval >= 6, (n_train, n_eval)

    # ---- reference-side replay: the reference's own module + loop semantics
    torch.set_num_threads(1)
    tmodel = get_ref_model(arch, mcfg, 1, 1)
    torch.nn.Module.load_state_dict(
        tmodel, {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in init_tw.items()}, strict=True)
    tmodel.train()  # dual_trainer.py:298; never switched to eval (quirk 9)
    opt = torch.optim.Adam(tmodel.parameters(), lr=lr0, weight_decay=0.0)
    scale = float(np.prod(mcfg["downscale_factors"]))

    tlosses, phases = [], []
    for phase, hr, w, _ in record:
        nvalid = int(w.sum())
        x = torch.tensor(hr[:nvalid], dtype=torch.float32)
        lr_in = F.interpolate(x, scale_factor=1.0 / scale, mode="bicubic")
        if phase == "train":
            opt.zero_grad()
            out = tmodel(lr_in)
            loss = torch.sqrt(torch.mean((out - x) ** 2))
            loss.backward()
            opt.step()
        else:
            with torch.no_grad():
                out = tmodel(lr_in)
                loss = torch.sqrt(torch.mean((out - x) ** 2))
        tlosses.append(float(loss.detach()))
        phases.append(phase)

    ours = [r[3] for r in record]
    # end-to-end f32 drift accumulates over ~30 coupled Adam steps; the
    # sequences must stay within a small relative envelope THROUGHOUT, not
    # just at the start
    np.testing.assert_allclose(ours, tlosses, rtol=2e-3, atol=2e-5,
                               err_msg=f"{arch} loss trajectory diverged")
    # and the early trajectory is tight (catches off-by-one-step errors)
    np.testing.assert_allclose(ours[:6], tlosses[:6], rtol=1e-4, atol=1e-6)
