"""Compiled train/eval steps — the TPU-native replacement for the reference's
eager per-batch loop (reference: sres/controller/dual_trainer.py:296-323,
apply_network :557-571).

One jitted program per step fuses the whole pipeline: NCHW→NHWC layout,
optional data_downsample degradation, target channel select, bicubic LR
synthesis (MXU matmuls), model forward, masked loss, backward, optimizer
update, and the bicubic-interpolation baseline loss. Parameters/optimizer
state are replicated over the mesh; the tile batch is sharded on the 'data'
axis, so XLA emits a psum over ICI for the gradients. The train state is
donated — parameters update in place in HBM.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from sres_tpu.ops.resize import downsample, interp_mode, multiscale_targets, upsample
from sres_tpu.parallel.mesh import batch_sharding, replicated
from sres_tpu.trainer.losses import sr_loss


class SRTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class StepConfig(NamedTuple):
    """Static (trace-time) configuration distilled from cfg()."""
    scale: int
    downscale_factors: Tuple[int, ...]
    down_mode: str
    up_mode: str
    loss_fn: str
    data_downsample: float
    target_idx: Tuple[int, ...]   # channel indices of target variables
    nchannels_in: int
    has_bn: bool


def make_step_config(task, model_cfg, has_bn: bool) -> StepConfig:
    input_vars = list(task.input_variables)
    target_vars = list(task.target_variables)
    return StepConfig(
        scale=math.prod(model_cfg.downscale_factors),
        downscale_factors=tuple(model_cfg.downscale_factors),
        down_mode=interp_mode(task.get("downsample_mode", "cubic")),
        up_mode=interp_mode(task.get("upsample_mode", "cubic")),
        loss_fn=model_cfg.get("loss_fn", "l2"),
        data_downsample=float(task.get("data_downsample", 1.0)),
        target_idx=tuple(input_vars.index(v) for v in target_vars),
        nchannels_in=len(input_vars),
        has_bn=has_bn,
    )


def prepare_inputs(hr_nchw: jnp.ndarray, sc: StepConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HR batch → (lr_input, hr_target), both NHWC f32
    (reference apply_network: dual_trainer.py:557-571)."""
    x = jnp.transpose(hr_nchw, (0, 2, 3, 1)).astype(jnp.float32)
    if sc.data_downsample > 1.0:
        x = downsample(x, sc.data_downsample, sc.down_mode)
    target = x if len(sc.target_idx) == sc.nchannels_in else x[..., list(sc.target_idx)]
    lr = downsample(x, float(sc.scale), sc.down_mode)
    return lr, target


def _apply(model, params, batch_stats, lr, train: bool, sc: StepConfig):
    variables = {"params": params}
    if sc.has_bn:
        variables["batch_stats"] = batch_stats
        if train:
            out, mut = model.apply(variables, lr, train=True, mutable=["batch_stats"])
            return out, mut["batch_stats"]
        return model.apply(variables, lr, train=False), batch_stats
    return model.apply(variables, lr, train=train), batch_stats


def _losses(out, target, weight, sc: StepConfig):
    if isinstance(out, tuple):
        targets = multiscale_targets(target, sc.downscale_factors, "bilinear")
        return sr_loss(list(out), targets, weight, sc.loss_fn)
    return sr_loss(out, target, weight, sc.loss_fn)


def build_train_step(model, optimizer: optax.GradientTransformation,
                     sc: StepConfig, mesh: Optional[Mesh] = None) -> Callable:
    """Returns train_step(state, hr_nchw, weight) -> (state, metrics)."""

    def train_step(state: SRTrainState, hr: jnp.ndarray, weight: jnp.ndarray):
        lr, target = prepare_inputs(hr, sc)

        def loss_fn(params):
            out, new_bs = _apply(model, params, state.batch_stats, lr, True, sc)
            sloss, mloss = _losses(out, target, weight, sc)
            return mloss, (sloss, new_bs)

        (mloss, (sloss, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        # interp baseline with the interpolation as the "product" so the
        # larger target is cropped under fractional data_downsample (the
        # reference's train-time order would shape-error there; its eval
        # order, used here, is the working one — dual_trainer.py:519)
        interp = upsample(lr, float(sc.scale), sc.up_mode)
        interp_sloss, _ = _losses(interp, target, weight, sc)
        metrics = dict(mloss=mloss, sloss=sloss, interp_sloss=interp_sloss)
        return new_state, metrics

    if mesh is not None:
        repl, bsh = replicated(mesh), batch_sharding(mesh)
        return jax.jit(train_step, donate_argnums=0,
                       in_shardings=(repl, bsh, bsh),
                       out_shardings=(repl, repl))
    return jax.jit(train_step, donate_argnums=0)


def build_eval_step(model, sc: StepConfig, mesh: Optional[Mesh] = None) -> Callable:
    """Returns eval_step(state, hr_nchw, weight) ->
    (metrics, (lr, out, target, interp)) with NCHW f32 outputs for the
    result-merging / image-assembly host path."""

    def eval_step(state: SRTrainState, hr: jnp.ndarray, weight: jnp.ndarray):
        lr, target = prepare_inputs(hr, sc)
        out, _ = _apply(model, state.params, state.batch_stats, lr, False, sc)
        sloss, mloss = _losses(out, target, weight, sc)
        interp = upsample(lr, float(sc.scale), sc.up_mode)
        interp_sloss, _ = _losses(interp, target, weight, sc)
        final = out[-1] if isinstance(out, tuple) else out
        to_nchw = lambda a: jnp.transpose(a, (0, 3, 1, 2))
        metrics = dict(mloss=mloss, sloss=sloss, interp_sloss=interp_sloss)
        return metrics, (to_nchw(lr), to_nchw(final), to_nchw(target), to_nchw(interp))

    if mesh is not None:
        repl, bsh = replicated(mesh), batch_sharding(mesh)
        return jax.jit(eval_step,
                       in_shardings=(repl, bsh, bsh),
                       out_shardings=(repl, (bsh, bsh, bsh, bsh)))
    return jax.jit(eval_step)


def build_optimizer(task) -> optax.GradientTransformation:
    """Adam with the task lr / weight decay (reference: dual_trainer.py:126)."""
    lr = float(task.lr)
    wd = float(task.get("weight_decay", 0.0))
    if wd > 0.0:
        return optax.adamw(lr, weight_decay=wd)
    return optax.adam(lr)


def init_state(model, optimizer, sample_lr: jnp.ndarray, seed: int,
               temporal=None) -> Tuple[SRTrainState, bool]:
    """Initialize params (+batch_stats) and optimizer state."""
    kwargs = {}
    variables = model.init(jax.random.PRNGKey(seed), sample_lr, train=False, **kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    state = SRTrainState(step=jnp.zeros((), jnp.int32), params=params,
                         batch_stats=batch_stats, opt_state=opt_state)
    return state, "batch_stats" in variables
