"""Measured cross-framework A/B: the REFERENCE's eager torch training loop vs
our compiled step, SAME CPU, same model, same synthetic data (round-2 verdict
item #3 — gives the A100 FLOP-model baseline in bench.py a measured
sensitivity bracket; the reference publishes no numbers, SURVEY.md §6).

Reference side: the reference's OWN RCAN module (tests/ref_zoo.py import)
driven with the reference's per-batch loop semantics — array2tensor with
requires_grad=True on the input (sres/base/util/array.py:67-70), bicubic LR
synthesis via F.interpolate (dual_trainer.py:557-571), RMSE loss (:205-212),
interp-baseline loss (:315-318, interp_loss=True as the flagship train
scripts set), torch.optim.Adam zero_grad/backward/step (:309,322-323).
Torch uses all cores (oneDNN intra-op threading), eager fp32 — exactly the
reference's CPU execution mode.

Our side: the same model through build_train_step (one donated jitted
program: LR synthesis, forward, masked RMSE, backward, Adam, interp loss)
on XLA:CPU, f32 for apples-to-apples.

Prints ONE JSON line. CAVEAT (printed in the JSON too): a CPU ratio brackets
framework overhead (dispatch, fusion, memory traffic), not GPU/TPU silicon —
cuDNN-vs-eager on A100 and XLA-vs-eager on CPU are different gaps. Use it as
a bracket alongside the A100 FLOP model, not as a replacement.

Usage:
  python scripts/bench/baseline_ab.py                   # full rcan-10-20-64, batch 36
  python scripts/bench/baseline_ab.py --nlayers 2 --nblocks 4 --steps 3  # quick
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def torch_side(mcfg, hr, steps, warmup):
    import torch
    import torch.nn.functional as F
    from ref_zoo import get_ref_model

    torch.set_num_threads(os.cpu_count() or 1)
    model = get_ref_model("rcan", mcfg, 1, 1, single_thread=False).train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, weight_decay=0.0)
    scale = 4.0

    def step(x_np):
        # reference array2tensor: requires_grad=True on the HR input
        x = torch.tensor(x_np, dtype=torch.float32, requires_grad=True)
        opt.zero_grad()
        lr_in = F.interpolate(x, scale_factor=1.0 / scale, mode="bicubic")
        out = model(lr_in)
        loss = torch.sqrt(torch.mean((out - x) ** 2))
        interp = F.interpolate(lr_in, scale_factor=scale, mode="bicubic")
        interp_loss = torch.sqrt(torch.mean((interp - x) ** 2))
        loss.backward()
        opt.step()
        return float(loss.detach()) + 0.0 * float(interp_loss.detach())

    for _ in range(warmup):
        step(hr)
    t0 = time.time()
    acc = 0.0
    for _ in range(steps):
        acc += step(hr)
    dt = (time.time() - t0) / steps
    return dt, acc


def ours_side(mcfg, hr, steps, warmup):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from sres_tpu.models import build_model
    from sres_tpu.trainer.step import StepConfig, build_train_step, init_state

    model = build_model(dict(mcfg), 1, 1, precision="f32")
    opt = optax.adam(1e-4)
    b, _, h, w = hr.shape
    state, has_bn = init_state(
        model, opt, jnp.zeros((1, h // 4, w // 4, 1), jnp.float32), seed=0)
    sc = StepConfig(scale=4, downscale_factors=(2, 2), down_mode="bicubic",
                    up_mode="bicubic", loss_fn="l2", data_downsample=1.0,
                    target_idx=(0,), nchannels_in=1, has_bn=has_bn)
    step = build_train_step(model, opt, sc, mesh=None)
    hrj = jnp.asarray(hr)
    weight = jnp.ones((b,), jnp.float32)
    for _ in range(warmup):
        state, m = step(state, hrj, weight)
        float(m["mloss"])  # value fetch
    t0 = time.time()
    acc = 0.0
    for _ in range(steps):
        state, m = step(state, hrj, weight)
        acc += float(m["mloss"])  # sync every step, like the torch loop
    dt = (time.time() - t0) / steps
    return dt, acc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=36)  # the reference recipe
    p.add_argument("--nlayers", type=int, default=10)
    p.add_argument("--nblocks", type=int, default=20)
    p.add_argument("--nfeatures", type=int, default=64)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--side", choices=["both", "torch", "ours"], default="both",
                   help="run one side only (lets the two sides run in "
                        "separate processes so allocator state is clean)")
    a = p.parse_args()

    import numpy as np
    mcfg = dict(name="rcan", nfeatures=a.nfeatures, nlayers=a.nlayers,
                nblocks=a.nblocks, cbottleneck=16, kernel_size=3,
                downscale_factors=[2, 2])
    rng = np.random.default_rng(0)
    hr = rng.normal(size=(a.batch, 1, 192, 192)).astype(np.float32)

    out = {"model": f"rcan-{a.nlayers}-{a.nblocks}-{a.nfeatures}",
           "batch": a.batch, "steps": a.steps, "host_cpus": os.cpu_count(),
           "caveat": "CPU ratio brackets framework overhead, not GPU/TPU "
                     "silicon; use alongside the A100 FLOP model"}
    if a.side in ("both", "ours"):
        dt, _ = ours_side(mcfg, hr, a.steps, a.warmup)
        out["ours_cpu_step_s"] = round(dt, 3)
        out["ours_cpu_tiles_per_sec"] = round(a.batch / dt, 2)
    if a.side in ("both", "torch"):
        dt, _ = torch_side(mcfg, hr, a.steps, a.warmup)
        out["torch_cpu_step_s"] = round(dt, 3)
        out["torch_cpu_tiles_per_sec"] = round(a.batch / dt, 2)
    if "ours_cpu_step_s" in out and "torch_cpu_step_s" in out:
        out["ratio_ours_over_torch"] = round(
            out["torch_cpu_step_s"] / out["ours_cpu_step_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
