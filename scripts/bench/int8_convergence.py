"""int8 quality at a CONVERGED operating point (round-2 verdict item #2).

Round 2 measured int8 quality only at epoch 6 of a synthetic probe; the
open question was what happens at the loss plateau, where the ~1.4%
per-conv quantization error is predicted to bind (PERF.md). This script
trains the seeded synthetic task to plateau in four arms with IDENTICAL
data order (same --seed):

  f32          — full-precision reference arm
  int8         — AQT-quantized trunk (HISTORICAL arm: round 3 found AQT's
                 conv blocks gradients — the trunk stays frozen at init,
                 which is what this arm's +27%/−2.1 dB measured; the
                 trainer now refuses quantization='int8', so this arm only
                 runs via --arms for archaeology)
  int8_fused   — the lean forward-quantized path (ops/int8_conv.py),
                 quantized training end-to-end
  int8_full    — int8_fused plus int8 BACKWARD contractions (the training
                 speed path; adds gradient quantization noise)
  serve arms   — the f32-trained best-val checkpoint EVALUATED with the
                 int8 / int8_fused forward (train-bf16-serve-int8, the
                 recommended deployment)

Outputs ONE JSON line: per-arm train/val loss trajectory tail, plateau
detection, final loss% (vs the bicubic baseline) and PSNR, serve-mode
deltas vs the f32 eval, and the loss level at which quantized TRAINING
detaches from the f32 trajectory (the measured noise floor).

CPU-friendly sizes by default (~tens of minutes at 60 epochs on one core);
--nepochs/--nfeatures to scale.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def train_arm(root: str, quant, nepochs: int, seed: int, nfeatures: int):
    from sres_tpu.config import ConfigContext
    from sres_tpu.data.inference_io import TSet
    from sres_tpu.trainer import ModelTrainer

    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": root, "pipeline.device": "cpu",
        "dataset.image_size": {"y": 192, "x": 144}, "dataset.ntimes": 4,
        "dataset.nan_fraction": 0.0,
        "task.tile_size": {"x": 12, "y": 12}, "task.batch_size": 4,
        "task.lr": 1e-3,
        # decay to a converged plateau (constant lr keeps bouncing at 60
        # epochs); same schedule in every arm
        "task.scheduler": {"type": "multistep",
                           "milestones": [nepochs // 2, 3 * nepochs // 4],
                           "gamma": 0.2},
        "task.ttsplit": {"train": 0.75, "valid": 0.25, "test": 0.0},
        "model.nfeatures": nfeatures, "model.nlayers": 2, "model.nblocks": 2,
        "model.lane_pack": 1, "model.quantization": quant,
        "pipeline.precision": "f32",
    }
    with ConfigContext("sres", model="rcan-10-10-64", **over) as cc:
        tr = ModelTrainer(cc, seed=seed)
        tr.train(nepochs + 1, refresh_state=True, seed=seed)  # quirk: +1
        recs = tr.results_accum.results
        per_epoch = {}
        for r in recs:
            if r.tset == TSet.Train:
                e = int(math.ceil(r.epoch + 1e-9))
                per_epoch.setdefault(e, []).append((r.loss, r.ref_loss))
        train_traj = [round(sum(x[0] for x in v) / len(v), 5)
                      for _, v in sorted(per_epoch.items())]
        val = [(r.loss, r.ref_loss) for r in recs if r.tset == TSet.Validation]
        return dict(train_traj=train_traj,
                    val_traj=[round(v[0], 5) for v in val],
                    final_val=val[-1][0] if val else float("nan"),
                    final_val_interp=val[-1][1] if val else float("nan"))


def serve_arm(f32_root: str, quant: str, seed: int, nfeatures: int):
    """Evaluate the f32-trained best-val checkpoint with a quantized forward."""
    from sres_tpu.config import ConfigContext
    from sres_tpu.data.inference_io import TSet
    from sres_tpu.trainer import ModelTrainer

    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": f32_root, "pipeline.device": "cpu",
        "dataset.image_size": {"y": 192, "x": 144}, "dataset.ntimes": 4,
        "dataset.nan_fraction": 0.0,
        "task.tile_size": {"x": 12, "y": 12}, "task.batch_size": 4,
        "task.ttsplit": {"train": 0.75, "valid": 0.25, "test": 0.0},
        "model.nfeatures": nfeatures, "model.nlayers": 2, "model.nblocks": 2,
        "model.lane_pack": 1, "model.quantization": quant,
        "pipeline.precision": "f32",
    }
    with ConfigContext("sres", model="rcan-10-10-64", **over) as cc:
        tr = ModelTrainer(cc, seed=seed)
        _, losses = tr.evaluate(TSet.Validation, update_model=True,
                                update_checkpoint=False)
        return dict(val=losses.get("model", float("nan")),
                    interp=losses.get("interpolated", float("nan")))


def detach_epoch(f32_traj, q_traj, rel=0.05):
    """First epoch where the quantized train loss exceeds f32 by > rel."""
    for i, (a, b) in enumerate(zip(f32_traj, q_traj)):
        if b > a * (1 + rel):
            return i + 1, f32_traj[i]
    return None, None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nepochs", type=int, default=60)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--nfeatures", type=int, default=16)
    p.add_argument("--plateau-window", type=int, default=5)
    p.add_argument("--arms", type=str, default="f32,int8_fused,int8_full",
                   help="comma list of arms to train (f32 is always the "
                        "control and must be included); serve arms run for "
                        "every non-f32 arm listed")
    a = p.parse_args()

    psnr = lambda l: round(-20.0 * math.log10(max(l, 1e-12)), 3)
    out = {"nepochs": a.nepochs, "seed": a.seed, "nfeatures": a.nfeatures,
           "arms": {}}
    arms = [s.strip() for s in a.arms.split(",") if s.strip()]
    assert "f32" in arms, "--arms must include the f32 control"
    roots = {}
    for arm in arms:
        quant = None if arm == "f32" else arm
        roots[arm] = tempfile.mkdtemp(prefix=f"conv_{arm}_")
        r = train_arm(roots[arm], quant, a.nepochs, a.seed, a.nfeatures)
        w = a.plateau_window
        tail = r["train_traj"][-w:]
        r["plateaued"] = bool(len(r["train_traj"]) >= 2 * w and
                              abs(tail[0] - tail[-1]) / max(tail[0], 1e-12) < 0.02)
        r["final_train"] = tail[-1] if tail else float("nan")
        r["final_val_loss_pct"] = round(
            100 * r["final_val"] / max(r["final_val_interp"], 1e-12), 2)
        r["final_val_psnr_db"] = psnr(r["final_val"])
        out["arms"][arm] = r

    f32 = out["arms"]["f32"]
    qarms = [x for x in arms if x != "f32"]
    for arm in qarms:
        e, lvl = detach_epoch(f32["train_traj"], out["arms"][arm]["train_traj"])
        out["arms"][arm]["detach_epoch"] = e
        out["arms"][arm]["detach_loss_level"] = lvl
        out["arms"][arm]["final_val_delta_vs_f32"] = round(
            out["arms"][arm]["final_val"] - f32["final_val"], 5)

    # serve arms evaluate the f32 run's BEST-VAL checkpoint — the f32
    # control must go through the identical path (the last-epoch val above
    # is not the best-val checkpoint's loss)
    out["serve"] = {}
    f32_serve = serve_arm(roots["f32"], None, a.seed, a.nfeatures)
    out["serve"]["f32"] = f32_serve
    for quant in qarms:
        s = serve_arm(roots["f32"], quant, a.seed, a.nfeatures)
        s["delta_vs_f32_serve"] = round(s["val"] - f32_serve["val"], 5)
        s["rel_delta"] = round(s["delta_vs_f32_serve"] / max(f32_serve["val"], 1e-12), 4)
        out["serve"][quant] = s

    print(json.dumps(out))


if __name__ == "__main__":
    main()
