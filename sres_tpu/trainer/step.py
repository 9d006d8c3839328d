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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sres_tpu.ops.resize import downsample, interp_mode, multiscale_targets, upsample
from sres_tpu.parallel.mesh import batch_sharding, image_sharding, replicated
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
    ntemporal: int = 0            # >0: model takes per-batch time features


def make_step_config(task, model_cfg, has_bn: bool, ntemporal: int = 0) -> StepConfig:
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
        ntemporal=ntemporal,
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


def _apply(model, params, batch_stats, lr, train: bool, sc: StepConfig,
           temporal=None, smap_mesh: Optional[Mesh] = None, weight=None):
    variables = {"params": params}
    kw = {"temporal": temporal} if sc.ntemporal > 0 else {}
    if sc.has_bn:
        variables["batch_stats"] = batch_stats
        if train:
            # padding-aware BN batch statistics: ragged batches are padded
            # with zero-weight samples for the static jit shapes — scope the
            # weights so train-mode BatchNorm skips them (models/layers.py)
            from sres_tpu.models.layers import bn_sample_weight
            with bn_sample_weight(weight):
                out, mut = model.apply(variables, lr, train=True,
                                       mutable=["batch_stats"], **kw)
            return out, mut["batch_stats"]
        return model.apply(variables, lr, train=False, **kw), batch_stats
    if smap_mesh is not None:
        # pipeline.shard_map: run the model apply PER data-shard inside
        # shard_map instead of leaving partitioning to GSPMD. Semantically
        # identical for pure dp (shard_map is differentiable; the replicated
        # param spec transposes to a psum of the gradients), but it
        # GUARANTEES per-shard execution of custom kernels — GSPMD would
        # all-gather around pallas_calls (winograd chains, window attention)
        # on real multi-chip. BN models are excluded (cross-shard batch
        # stats); the 2D data×spatial mesh falls back to GSPMD (callers
        # gate on spatial == 1).
        shard_map = getattr(jax, "shard_map", None)
        if shard_map is None:  # pre-0.8 jax
            from jax.experimental.shard_map import shard_map

        def local(p, x, *t):
            kw2 = {"temporal": t[0]} if t else {}
            return model.apply({"params": p}, x, train=train, **kw2)

        in_specs = (P(), P("data")) + ((P("data"),) if sc.ntemporal > 0 else ())
        import inspect
        flag = ("check_vma" if "check_vma" in
                inspect.signature(shard_map).parameters else "check_rep")
        fn = shard_map(local, mesh=smap_mesh, in_specs=in_specs,
                       out_specs=P("data"), **{flag: False})
        args = (params, lr) + ((temporal,) if sc.ntemporal > 0 else ())
        return fn(*args), batch_stats
    return model.apply(variables, lr, train=train, **kw), batch_stats


def _losses(out, target, weight, sc: StepConfig):
    if isinstance(out, tuple):
        targets = multiscale_targets(target, sc.downscale_factors, "bilinear")
        return sr_loss(list(out), targets, weight, sc.loss_fn)
    return sr_loss(out, target, weight, sc.loss_fn)


def _interp_baseline(lr: jnp.ndarray, sc: StepConfig) -> jnp.ndarray:
    """Bicubic-upsample baseline on the TARGET channels. With target ⊂ input
    the interpolation of the full input has more channels than the target;
    the reference's interp loss would broadcast-error there (dual_trainer.py
    :316-318 — unexercised: all its tasks have target == input). We select
    the target channels so the baseline is defined for every task."""
    interp = upsample(lr, float(sc.scale), sc.up_mode)
    if len(sc.target_idx) != sc.nchannels_in:
        interp = interp[..., list(sc.target_idx)]
    return interp


def _train_step_core(model, optimizer: optax.GradientTransformation,
                     sc: StepConfig,
                     smap_mesh: Optional[Mesh] = None) -> Callable:
    """The pure (untraced) train-step body shared by the per-batch jit and
    the scanned multi-batch jit."""

    def train_step(state: SRTrainState, hr: jnp.ndarray, weight: jnp.ndarray,
                   temporal: Optional[jnp.ndarray] = None):
        lr, target = prepare_inputs(hr, sc)

        def loss_fn(params):
            out, new_bs = _apply(model, params, state.batch_stats, lr, True, sc,
                                 temporal, smap_mesh, weight=weight)
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
        interp = _interp_baseline(lr, sc)
        interp_sloss, _ = _losses(interp, target, weight, sc)
        metrics = dict(mloss=mloss, sloss=sloss, interp_sloss=interp_sloss)
        return new_state, metrics

    return train_step


def _smap_mesh(mesh: Optional[Mesh], sc: StepConfig, smap: bool):
    """The mesh to shard_map the model apply over, or None: requires the
    flag, a pure-dp mesh (spatial == 1), and a BN-free model."""
    if not (smap and mesh is not None and not sc.has_bn):
        return None
    return mesh if mesh.shape.get("spatial", 1) == 1 else None


def build_train_step(model, optimizer: optax.GradientTransformation,
                     sc: StepConfig, mesh: Optional[Mesh] = None,
                     smap: bool = False) -> Callable:
    """Returns train_step(state, hr_nchw, weight) -> (state, metrics)."""
    train_step = _train_step_core(model, optimizer, sc, _smap_mesh(mesh, sc, smap))
    if mesh is not None:
        # hr: batch over 'data' + (2D mesh) H over 'spatial' — GSPMD
        # spatially partitions every conv; weight stays per-tile
        repl, bsh = replicated(mesh), batch_sharding(mesh)
        ish = image_sharding(mesh)
        insh = (repl, ish, bsh) + ((bsh,) if sc.ntemporal > 0 else ())
        fn = train_step if sc.ntemporal > 0 else (lambda s, h, w: train_step(s, h, w))
        return jax.jit(fn, donate_argnums=0,
                       in_shardings=insh,
                       out_shardings=(repl, repl))
    return jax.jit(train_step, donate_argnums=0, static_argnums=())


def build_multi_train_step(model, optimizer: optax.GradientTransformation,
                           sc: StepConfig, mesh: Optional[Mesh] = None,
                           smap: bool = False) -> Callable:
    """Returns multi_step(state, hr_stack, weight_stack) -> (state, metrics).

    Runs K optimizer steps in ONE device dispatch via ``lax.scan`` over a
    staged stack of K batches (hr_stack: (K, B, C, H, W), weight_stack:
    (K, B); optional temporal_stack: (K, B, ntf)). Metrics come back stacked
    (K,) per key so the host can still log every batch. Amortizes per-dispatch
    host latency (the reference pays a full Python round trip per batch,
    dual_trainer.py:296-323); especially valuable on remote/tunneled device
    transports. The batch dim (axis 1) is sharded over the mesh's data axis;
    the scan axis is time, never sharded."""
    core = _train_step_core(model, optimizer, sc, _smap_mesh(mesh, sc, smap))

    def multi_step(state: SRTrainState, hr_stack: jnp.ndarray,
                   weight_stack: jnp.ndarray,
                   temporal_stack: Optional[jnp.ndarray] = None):
        xs = (hr_stack, weight_stack) + (
            (temporal_stack,) if sc.ntemporal > 0 else ())

        def body(st, x):
            return core(st, *x)

        return jax.lax.scan(body, state, xs)

    if mesh is not None:
        repl = replicated(mesh)
        ssh = NamedSharding(mesh, P(None, "data"))
        ish = image_sharding(mesh, batch_dim=1, h_dim=3)
        insh = (repl, ish, ssh) + ((ssh,) if sc.ntemporal > 0 else ())
        fn = multi_step if sc.ntemporal > 0 else (lambda s, h, w: multi_step(s, h, w))
        return jax.jit(fn, donate_argnums=0,
                       in_shardings=insh, out_shardings=(repl, repl))
    return jax.jit(multi_step, donate_argnums=0)


def build_accum_train_step(model, optimizer: optax.GradientTransformation,
                           sc: StepConfig, mesh: Optional[Mesh] = None,
                           smap: bool = False) -> Callable:
    """Returns accum_step(state, hr_stack, weight_stack) -> (state, metrics).

    Gradient accumulation: ONE optimizer update from K staged micro-batches
    (hr_stack: (K, B, C, H, W)) at B-batch activation memory. The applied
    gradient is the padding-weight-weighted mean of the per-micro-batch loss
    gradients — i.e. the objective is the weighted mean of the K batch
    RMSEs (for l2), not the RMSE of the pooled K·B batch; identical-data
    micro-batches reproduce the single-batch step exactly and all-padding
    micro-batches contribute nothing (both tested). BN batch_stats advance
    per micro-batch.
    Metrics come back (K,)-stacked like build_multi_train_step. New
    capability vs the reference (single-GPU, per-batch updates); enables
    large effective batches past one chip's HBM, e.g. bf16 at the int8
    path's effective batch. Config: ``pipeline.grad_accum: K``."""

    def accum_step(state: SRTrainState, hr_stack: jnp.ndarray,
                   weight_stack: jnp.ndarray,
                   temporal_stack: Optional[jnp.ndarray] = None):
        zeros = jax.tree.map(jnp.zeros_like, state.params)
        xs = (hr_stack, weight_stack) + (
            (temporal_stack,) if sc.ntemporal > 0 else ())

        def micro(carry, x):
            gacc, swacc, bs = carry
            hr, weight = x[0], x[1]
            temporal = x[2] if sc.ntemporal > 0 else None
            lr, target = prepare_inputs(hr, sc)

            def loss_fn(params):
                out, new_bs = _apply(model, params, bs, lr, True, sc, temporal,
                                     _smap_mesh(mesh, sc, smap), weight=weight)
                sloss, mloss = _losses(out, target, weight, sc)
                return mloss, (sloss, new_bs)

            (mloss, (sloss, new_bs)), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            sw = jnp.sum(weight)
            # all-padding micro-batch: d(sqrt)/dx at 0 is inf -> NaN grads;
            # the where() hard-selects 0 so the batch is inert
            gacc = jax.tree.map(
                lambda a, g: a + jnp.where(sw > 0, sw * g, 0.0), gacc, grads)
            interp = _interp_baseline(lr, sc)
            interp_sloss, _ = _losses(interp, target, weight, sc)
            metrics = dict(mloss=mloss, sloss=sloss, interp_sloss=interp_sloss)
            return (gacc, swacc + sw, new_bs), metrics

        (gacc, swacc, new_bs), metrics = jax.lax.scan(
            micro, (zeros, jnp.zeros((), jnp.float32), state.batch_stats), xs)
        grads = jax.tree.map(lambda a: a / jnp.maximum(swacc, 1e-12), gacc)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    if mesh is not None:
        repl = replicated(mesh)
        ssh = NamedSharding(mesh, P(None, "data"))
        ish = image_sharding(mesh, batch_dim=1, h_dim=3)
        insh = (repl, ish, ssh) + ((ssh,) if sc.ntemporal > 0 else ())
        fn = accum_step if sc.ntemporal > 0 else (lambda s, h, w: accum_step(s, h, w))
        return jax.jit(fn, donate_argnums=0,
                       in_shardings=insh, out_shardings=(repl, repl))
    return jax.jit(accum_step, donate_argnums=0)


def build_eval_step(model, sc: StepConfig, mesh: Optional[Mesh] = None,
                    smap: bool = False) -> Callable:
    """Returns eval_step(state, hr_nchw, weight) ->
    (metrics, (lr, out, target, interp)) with NCHW f32 outputs for the
    result-merging / image-assembly host path."""

    def eval_step(state: SRTrainState, hr: jnp.ndarray, weight: jnp.ndarray,
                  temporal: Optional[jnp.ndarray] = None):
        lr, target = prepare_inputs(hr, sc)
        out, _ = _apply(model, state.params, state.batch_stats, lr, False, sc,
                        temporal, _smap_mesh(mesh, sc, smap))
        sloss, mloss = _losses(out, target, weight, sc)
        interp = _interp_baseline(lr, sc)
        interp_sloss, _ = _losses(interp, target, weight, sc)
        final = out[-1] if isinstance(out, tuple) else out
        to_nchw = lambda a: jnp.transpose(a, (0, 3, 1, 2))
        metrics = dict(mloss=mloss, sloss=sloss, interp_sloss=interp_sloss)
        return metrics, (to_nchw(lr), to_nchw(final), to_nchw(target), to_nchw(interp))

    if mesh is not None:
        repl, bsh = replicated(mesh), batch_sharding(mesh)
        ish = image_sharding(mesh)
        insh = (repl, ish, bsh) + ((bsh,) if sc.ntemporal > 0 else ())
        fn = eval_step if sc.ntemporal > 0 else (lambda s, h, w: eval_step(s, h, w))
        return jax.jit(fn,
                       in_shardings=insh,
                       out_shardings=(repl, (ish, ish, ish, ish)))
    return jax.jit(eval_step)


def build_optimizer(task, packed: bool = False) -> optax.GradientTransformation:
    """Adam with the task lr / weight decay (reference: dual_trainer.py:126).

    With ``task.scheduler`` configured the learning rate becomes an injected
    hyperparameter updated once per epoch from the host (the reference steps
    an injected torch scheduler per epoch: dual_trainer.py:278,333-334) —
    no retrace, the compiled step reads the lr from the optimizer state.

    ``packed`` (pipeline.packed_opt) wraps the transformation in
    optax.flatten: the update runs on ONE raveled parameter vector instead
    of ~1630 leaves, collapsing the per-leaf Adam graph that dominates the
    flagship step HLO (one sqrt per leaf — measured ~80% of the module's
    text) to a handful of flat-vector ops. Mathematically identical
    (elementwise optimizer); the optimizer STATE becomes flat vectors, but
    checkpoints interchange exactly across the flag — CheckpointManager
    converts the Adam moments through trainer/opt_interop.py on restore.
    Default ON (pipeline.packed_opt) since the round-4 on-chip A/B:
    compile −50%, runtime neutral-to-better (PERF.md). The injected-lr
    state path is unchanged (flatten preserves the inner state type)."""
    lr = float(task.lr)
    wd = float(task.get("weight_decay", 0.0))
    base = partial(optax.adamw, weight_decay=wd) if wd > 0.0 else optax.adam
    opt = (optax.inject_hyperparams(base)(learning_rate=lr)
           if task.get("scheduler", None) else base(lr))
    return optax.flatten(opt) if packed else opt


def lr_at_epoch(task, epochs_completed: int) -> float:
    """Learning rate after ``epochs_completed`` per-epoch scheduler steps,
    following torch scheduler semantics (StepLR/MultiStepLR/ExponentialLR/
    CosineAnnealingLR). ``task.scheduler``:
      {type: step, step_size: N, gamma: g}
      {type: multistep, milestones: [..], gamma: g}
      {type: exponential, gamma: g}
      {type: cosine, t_max: N, eta_min: m}
    """
    lr0 = float(task.lr)
    sched = task.get("scheduler", None)
    if not sched:
        return lr0
    stype = sched["type"]
    e = max(0, int(epochs_completed))
    if stype == "step":
        return lr0 * float(sched.get("gamma", 0.1)) ** (e // int(sched["step_size"]))
    if stype == "multistep":
        passed = sum(1 for m in sched["milestones"] if e >= int(m))
        return lr0 * float(sched.get("gamma", 0.1)) ** passed
    if stype == "exponential":
        return lr0 * float(sched["gamma"]) ** e
    if stype == "cosine":
        t_max = int(sched["t_max"])
        eta_min = float(sched.get("eta_min", 0.0))
        return eta_min + 0.5 * (lr0 - eta_min) * (1.0 + math.cos(math.pi * e / t_max))
    raise ValueError(f"Unknown scheduler type: {stype}")


def set_learning_rate(state: SRTrainState, lr: float) -> SRTrainState:
    """Write the injected lr hyperparameter into the optimizer state
    (no-op when the optimizer was built without a scheduler)."""
    opt = state.opt_state
    if hasattr(opt, "hyperparams") and "learning_rate" in opt.hyperparams:
        hp = dict(opt.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return state.replace(opt_state=opt._replace(hyperparams=hp))
    return state


def init_state(model, optimizer, sample_lr: jnp.ndarray, seed: int,
               temporal=None) -> Tuple[SRTrainState, bool]:
    """Initialize params (+batch_stats) and optimizer state. ``temporal``
    (B, ntf) shapes the UNet bottleneck for time-feature injection
    (reference: unet/network.py:44-56)."""
    kwargs = {} if temporal is None else {"temporal": temporal}
    variables = model.init(jax.random.PRNGKey(seed), sample_lr, train=False, **kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    state = SRTrainState(step=jnp.zeros((), jnp.int32), params=params,
                         batch_stats=batch_stats, opt_state=opt_state)
    return state, "batch_stats" in variables
