"""ModelTrainer — the training/eval engine (reference:
sres/controller/dual_trainer.py).

Orchestration (epochs → timeslices → tile batches, checkpoint/resume,
loss CSV, best-val tracking, image assembly) stays in Python; every per-batch
computation — LR synthesis, forward, loss, backward, optimizer update,
interpolation baseline — runs inside one donated, mesh-sharded jitted step
(trainer/step.py). Per-batch metrics stay on device; the host syncs once per
timeslice when recording losses, so the step stream never blocks on Python.

Ragged final batches (NaN-filtered tile counts vary per timeslice,
SURVEY.md §7) are padded to a fixed size with 0-weight tiles; the pad size is
rounded up to the mesh's data-axis size so every batch shards evenly.
"""
from __future__ import annotations

import math
import random
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sres_tpu.config import ConfigContext, cfg
from sres_tpu.data.batch import BatchDataset
from sres_tpu.data.inference_io import TSet
from sres_tpu.data.input_pipeline import iter_pipelined
from sres_tpu.data.norm import denorm
from sres_tpu.data.tiles import TileIterator, batchDomain
from sres_tpu.models import build_model
from sres_tpu.parallel.mesh import get_mesh, pad_to_multiple
from sres_tpu.trainer.checkpoints import CheckpointManager
from sres_tpu.trainer.results import ResultsAccumulator
from sres_tpu.trainer.step import (SRTrainState, build_eval_step,
                                   build_multi_train_step, build_optimizer,
                                   build_train_step, init_state, lr_at_epoch,
                                   make_step_config, set_learning_rate)
from sres_tpu.util.larray import LArray
from sres_tpu.util.logging import lgm

TimeType = Any


def ttsplit_times(times: List[TimeType]) -> Dict[TSet, List[TimeType]]:
    """Contiguous train/valid/test split by the task fractions
    (reference: dual_trainer.py:28-36)."""
    ttsplit = cfg().task.ttsplit
    start, result, nt = 0, {}, len(times)
    for tset_name, frac in ttsplit.items():
        end = start + int(float(frac) * nt)
        result[TSet(tset_name)] = times[start:end]
        start = end
    return result


class ModelTrainer:
    def __init__(self, cc: ConfigContext, seed: int = 4456):
        self.context = cc
        self.results_accum = ResultsAccumulator(cc)
        self.domain = batchDomain.from_config(cfg().task.get("batch_domain", "tiles"))
        self.target_variables: List[str] = list(cfg().task.target_variables)
        self.input_variables: List[str] = list(cfg().task.input_variables)
        self.downscale_factors = list(cfg().model.downscale_factors)
        self.scale_factor = math.prod(self.downscale_factors)
        self.model_name: str = cfg().model.name

        from sres_tpu.parallel.mesh import initialize_distributed, sync_seed
        initialize_distributed()  # no-op outside a multi-host launch
        seed = sync_seed(seed)    # hosts must agree (time-based default seed)
        self.mesh = get_mesh(dict(cfg().pipeline.get("mesh", {"data": -1})))
        self.ndata = self.mesh.shape["data"]
        if str(cfg().task.batch_size) == "auto":
            # task.batch_size: auto — resolve the largest HBM-fitting batch
            # at compile time (AOT memory_analysis; OOM-safe, no dispatch)
            # and write it back so loaders/iterators see an int
            # (util/autotune.resolve_auto_batch; VERDICT r4 item #7)
            from sres_tpu.util.autotune import resolve_auto_batch
            cfg().task["batch_size"] = resolve_auto_batch(self.mesh)
        self.batch_size: int = int(cfg().task.batch_size)
        self.pad_size: int = pad_to_multiple(self.batch_size, self.ndata)

        self.conform_to_data_grid()
        self.dataset = BatchDataset(cfg().task, seed=seed)

        # temporal features: sin/cos day+year phases per dataset timestamp,
        # injected at the UNet bottleneck (reference: manager.py:30-54,
        # unet/network.py:44-56 — a dead path there; live here)
        self.temporal_features: Optional[np.ndarray] = None
        self._time_pos: Dict[Any, int] = {}
        if bool(cfg().model.get("use_temporal_features", False)):
            from sres_tpu.models.temporal import get_temporal_features
            times = list(self.dataset.get_batch_time_coords())
            self.temporal_features = get_temporal_features(np.asarray(times))
            self._time_pos = {t: i for i, t in enumerate(times)}
        ntemporal = 0 if self.temporal_features is None else self.temporal_features.shape[1]

        precision = cfg().pipeline.get("precision", "bf16")
        self.model = build_model(cfg().model, len(self.input_variables),
                                 len(self.target_variables), precision=precision,
                                 temporal_features=self.temporal_features)
        self.optimizer = build_optimizer(
            cfg().task, packed=bool(cfg().pipeline.get("packed_opt", False)))

        tsz = cfg().task.tile_size
        sample_lr = jnp.zeros((1, tsz["y"], tsz["x"], len(self.input_variables)), jnp.float32)
        sample_t = None if ntemporal == 0 else jnp.zeros((1, ntemporal), jnp.float32)
        self.state, has_bn = init_state(self.model, self.optimizer, sample_lr, seed,
                                        temporal=sample_t)
        self.step_config = make_step_config(cfg().task, cfg().model, has_bn,
                                            ntemporal=ntemporal)
        # pipeline.shard_map: run the model apply per data-shard inside
        # shard_map (guaranteed per-shard execution of pallas kernels under
        # dp; see trainer/step.py:_apply). No-op on BN models / 2D meshes.
        self._smap = bool(cfg().pipeline.get("shard_map", False))
        self._train_step = build_train_step(self.model, self.optimizer,
                                            self.step_config, self.mesh,
                                            smap=self._smap)
        self._eval_step = build_eval_step(self.model, self.step_config,
                                          self.mesh, smap=self._smap)
        # infer_region's jitted step, cached per grid shape: jit's trace
        # cache is keyed on the function OBJECT, so rebuilding the closure
        # every call would retrace + recompile the whole region program per
        # timeslice (~70-100 s through the axon tunnel — measured,
        # scripts/bench/region_infer_bench.py round 4)
        self._region_step_cache: Dict[tuple, Any] = {}
        # K>1: stage K padded batches and run them in one scanned dispatch
        # (trainer/step.py:build_multi_train_step). Note the first two multi
        # dispatches each compile once (the donated carry's layouts differ
        # from the fresh state's).
        self.steps_per_dispatch = max(1, int(cfg().pipeline.get("steps_per_dispatch", 1)))
        # K>1: ONE optimizer update per K staged micro-batches (exact
        # big-effective-batch training at 1/K activation memory). Shares the
        # staging machinery with steps_per_dispatch; mutually exclusive.
        self.grad_accum = max(1, int(cfg().pipeline.get("grad_accum", 1)))
        assert self.steps_per_dispatch == 1 or self.grad_accum == 1, \
            "pipeline.steps_per_dispatch and pipeline.grad_accum are exclusive"
        if self.grad_accum > 1:
            from sres_tpu.trainer.step import build_accum_train_step
            self.steps_per_dispatch = self.grad_accum
            self._multi_step = build_accum_train_step(
                self.model, self.optimizer, self.step_config, self.mesh,
                smap=self._smap)
        else:
            self._multi_step = (build_multi_train_step(
                self.model, self.optimizer, self.step_config, self.mesh,
                smap=self._smap)
                if self.steps_per_dispatch > 1 else None)

        self.checkpoint_manager = CheckpointManager()
        # batch-shuffle rng: seeded, NOT the global random module — shuffle
        # order must be reproducible across processes (multi-host training
        # shards the same shuffled batch sequence on every host)
        self._shuffle_rng = random.Random(seed)
        # Serializes loader access between the infer_region_stream prefetch
        # worker and any concurrent trainer call that touches the dataset
        # (load_timeslice/select_batch are stateful on the shared loader):
        # _prepare_region_inputs and the evaluate/process_image timeslice
        # sections all acquire it, so concurrent calls serialize instead of
        # racing on the loader's current-slice state.
        import threading
        self.loader_lock = threading.RLock()
        from concurrent.futures import ThreadPoolExecutor
        self._prefetch = (ThreadPoolExecutor(1, thread_name_prefix="timeslice-prefetch")
                          if bool(cfg().pipeline.get("prefetch", True)) else None)
        # host input pipeline (data/input_pipeline.py): sync | threads | grain
        self.input_backend = str(cfg().pipeline.get("input_backend", "sync"))
        self.input_depth = int(cfg().pipeline.get("input_depth", 2))
        self.input_workers = int(cfg().pipeline.get("num_workers", 1))
        from sres_tpu.util.diagnostics import apply_pipeline_debug_flags
        apply_pipeline_debug_flags()
        self.data_timestamps: Dict[TSet, List[TimeType]] = {}
        self.validation_loss = float("inf")
        self.train_state_meta: Dict[str, Any] = {}
        self.time_index: int = -1
        self.tile_index: int = -1
        self.current_losses: Dict[str, float] = {}
        # merged eval result tensors per tset (reference: dual_trainer.py:136-139)
        self.input: Dict[TSet, Optional[np.ndarray]] = {}
        self.target: Dict[TSet, Optional[np.ndarray]] = {}
        self.product: Dict[TSet, Optional[np.ndarray]] = {}
        self.interp: Dict[TSet, Optional[np.ndarray]] = {}

    # ------------------------------------------------------------- utilities
    def _temporal_arg(self, ctime, n: int):
        """Per-batch (n, ntf) time-feature rows for the current timeslice
        (None when temporal features are disabled)."""
        if self.step_config.ntemporal == 0:
            return None
        feat = self.temporal_features[self._time_pos.get(ctime, 0)]
        return np.broadcast_to(np.asarray(feat, np.float32)[None, :],
                               (n, feat.shape[0]))

    def _shard_inputs(self, *arrays, batch_dim: int = 0):
        """Multi-host: each process transfers only its slice of the global
        batch (parallel/mesh.py:make_global_batch); single-process passes
        through untouched (jit device-puts against in_shardings)."""
        if jax.process_count() == 1:
            return arrays
        from sres_tpu.parallel.mesh import make_global_batch
        # arrays[0] is the NCHW hr batch (or its (K,B,...) stack): also
        # H-shard it when the mesh has a spatial axis
        return tuple(a if a is None else
                     make_global_batch(np.asarray(a), self.mesh, batch_dim=batch_dim,
                                       h_dim=(batch_dim + 2 if i == 0 else None))
                     for i, a in enumerate(arrays))

    def _run_train_step(self, hr, weight, ctime):
        n = hr.shape[0]
        if self.step_config.ntemporal:
            hr, weight, t = self._shard_inputs(hr, weight, self._temporal_arg(ctime, n))
            return self._train_step(self.state, hr, weight, t)
        hr, weight = self._shard_inputs(hr, weight)
        return self._train_step(self.state, hr, weight)

    def _run_multi_step(self, staged, ctime):
        """One scanned dispatch over K staged (hr, weight) padded batches;
        returns (state, metrics) with (K,)-shaped metric arrays."""
        hr = np.stack([s[0] for s in staged])
        w = np.stack([s[1] for s in staged])
        if self.step_config.ntemporal:
            n = staged[0][0].shape[0]
            t = np.stack([self._temporal_arg(ctime, n)] * len(staged))
            hr, w, t = self._shard_inputs(hr, w, t, batch_dim=1)
            return self._multi_step(self.state, hr, w, t)
        hr, w = self._shard_inputs(hr, w, batch_dim=1)
        return self._multi_step(self.state, hr, w)

    def _run_eval_step(self, hr, weight, ctime):
        n = hr.shape[0]
        if self.step_config.ntemporal:
            hr, weight, t = self._shard_inputs(hr, weight, self._temporal_arg(ctime, n))
            metrics, outputs = self._eval_step(self.state, hr, weight, t)
        else:
            hr, weight = self._shard_inputs(hr, weight)
            metrics, outputs = self._eval_step(self.state, hr, weight)
        if jax.process_count() > 1:
            # eval outputs are batch-sharded; the host-side result merge needs
            # the full global arrays on every host
            from jax.experimental import multihost_utils
            outputs = multihost_utils.process_allgather(outputs, tiled=True)
        return metrics, outputs

    @property
    def nparams(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.state.params))

    def get_dataset(self) -> BatchDataset:
        return self.dataset

    def conform_to_data_grid(self) -> None:
        """Snap task.origin onto the tile grid when task.conform_to_grid is
        set (pixel-space analogue of the reference's coordinate snapping,
        dual_trainer.py:179-187)."""
        if not cfg().task.get("conform_to_grid", False):
            return
        ts = cfg().task.tile_size
        origin = dict(cfg().task.get("origin", {}) or {})
        snapped = {d: int(round(origin.get(d, 0) / (ts[d] * self.scale_factor)))
                   * ts[d] * self.scale_factor for d in ("x", "y")}
        if snapped != origin:
            lgm().log(f" ** snap_origin_to_data_grid: {origin} -> {snapped}", display=True)
        cfg().task["origin"] = snapped

    def get_sample_target(self) -> Optional[LArray]:
        """First tile batch of the first timeslice (reference:
        SRModels.sample_target, manager.py:56-66)."""
        times = self.get_dset_time_indices()
        self.dataset.load_timeslice(times[0])
        return self.dataset.get_batch_array(dict(start=0, end=self.batch_size), times[0])

    def get_sample_input(self, targets_only: bool = True) -> Optional[LArray]:
        """Bicubic-downsampled sample batch (reference: SRModels.sample_input)."""
        from sres_tpu.ops.resize import downsample
        target = self.get_sample_target()
        if target is None:
            return None
        nhwc = np.transpose(target.data, (0, 2, 3, 1))
        lr = np.asarray(downsample(nhwc, float(self.scale_factor), self.step_config.down_mode))
        return LArray(np.transpose(lr, (0, 3, 1, 2)), target.dims,
                      dict(target.coords), dict(target.attrs))

    def get_dset_time_indices(self) -> List[TimeType]:
        return self.dataset.get_dset_time_indices()

    def init_data_timestamps(self) -> None:
        if not self.data_timestamps:
            ctimes = self.dataset.get_batch_time_coords()
            self.data_timestamps = ttsplit_times(ctimes)
            lgm().log(f"init_data_timestamps: {len(ctimes)} times", display=True)

    def _pad_batch(self, batch: LArray) -> Tuple[np.ndarray, np.ndarray, int]:
        """(B,C,H,W) LArray → fixed-size padded arrays + valid count."""
        data = batch.data
        nvalid = data.shape[0]
        if nvalid < self.pad_size:
            pad = np.zeros((self.pad_size - nvalid,) + data.shape[1:], data.dtype)
            data = np.concatenate([data, pad], axis=0)
        weight = np.zeros((self.pad_size,), np.float32)
        weight[:nvalid] = 1.0
        return data, weight, nvalid

    def _metrics_to_host(self, metrics_list: List[Dict[str, jnp.ndarray]]) -> Dict[str, np.ndarray]:
        """One sync point: device metric scalars → host arrays. Entries may be
        scalars (per-batch steps) or (K,) vectors (scanned multi-steps)."""
        if not metrics_list:
            return {}
        stacked = jax.device_get(metrics_list)
        return {k: np.concatenate([np.atleast_1d(np.asarray(m[k])) for m in stacked])
                for k in stacked[0]}

    # ------------------------------------------------------------------ train
    def train(self, nepochs: int, refresh_state: bool = False, **kwargs) -> Dict[str, float]:
        if nepochs == 0:
            return {}
        if cfg().model.get("quantization") == "int8":
            from sres_tpu.models.layers import _AQT_SERVING_ONLY_MSG
            raise ValueError(_AQT_SERVING_ONLY_MSG)
        from sres_tpu.parallel.mesh import sync_seed
        seed = sync_seed(kwargs.get("seed", 4456))
        # NOTE: the reference's interp_loss kwarg gates the bicubic baseline;
        # here the baseline is always computed inside the compiled step (it is
        # <1% of step time — PERF.md — and feeds the headline loss%% metric),
        # so the kwarg is accepted but has no effect.
        self.dataset.reseed(seed)
        self._shuffle_rng = random.Random(seed)
        ckpt_period = int(cfg().pipeline.get("checkpoint_period", 1))
        epoch0, itime0, epoch_loss = 1, 0, 0.0
        train_start = time.time()

        if refresh_state:
            self.checkpoint_manager.clear_checkpoints()
            self.results_accum.refresh_state()
            lgm().log(" *** No checkpoint loaded: training from scratch *** ", display=True)
        else:
            meta = self.checkpoint_manager.load_checkpoint(self.state, TSet.Train, update_model=True)
            if meta:
                self.state = meta.pop("state", self.state)
                self.results_accum.load_results()
                epoch0 = meta.get("epoch", 1)
                itime0 = meta.get("itime", 0)
                epoch_loss = meta.get("loss", float("inf"))
            # reference semantics (dual_trainer.py:290-293): nepochs += epoch0
            # on EVERY non-refresh run — with no checkpoint epoch0 stays 1, so
            # `train(n)` runs n epochs (guarding this under `if meta` made a
            # fresh no-refresh `-ne 1` run train zero epochs)
            nepochs += epoch0

        self.init_data_timestamps()
        interp_epoch_loss = 0.0
        for epoch in range(epoch0, nepochs):
            epoch_start = time.time()
            if cfg().task.get("scheduler", None):
                # per-epoch scheduler step (reference: dual_trainer.py:333-334)
                self.state = set_learning_rate(
                    self.state, lr_at_epoch(cfg().task, epoch - 1))
            train_times = self.data_timestamps[TSet.Train]
            nts = len(train_times)
            lgm().log(f" ----- Epoch {epoch}/{nepochs} nts={nts} ----- ", display=True)
            for itime in range(itime0, nts):
                ctime = train_times[itime]
                metrics_list = []
                # loader_lock held for the whole timeslice: _tile_iterator's
                # load_timeslice sets the loader's current-slice pointer and
                # every select_batch below reads it — a live
                # infer_region_stream prefetch worker moving the pointer
                # mid-slice would silently train on wrong-slice tiles. The
                # iter_pipelined worker threads run produce() WITHOUT taking
                # the lock (they belong to this critical section; taking it
                # would deadlock against this holder), and prefetch_timeslice
                # only touches the cache (own lock), never the pointer.
                with self.loader_lock:
                    tile_iter = self._tile_iterator(ctime, randomize=True)
                    self._prefetch_next(train_times, itime)
                    # profile the first trained timeslice when pipeline.profile
                    from contextlib import nullcontext
                    from sres_tpu.util.diagnostics import profile_trace
                    prof = profile_trace("train") if (epoch == epoch0 and itime == itime0) \
                        else nullcontext()
                    with prof:
                        staged = []
                        batch_stream = iter_pipelined(
                            self._make_batch_producer(ctime), iter(tile_iter),
                            self.input_backend, self.input_depth, self.input_workers)
                        for hr, weight, nvalid in batch_stream:
                            if self.steps_per_dispatch == 1:
                                self.state, metrics = self._run_train_step(hr, weight, ctime)
                                metrics_list.append(metrics)
                            else:
                                staged.append((hr, weight))
                                if len(staged) == self.steps_per_dispatch:
                                    self.state, metrics = self._run_multi_step(staged, ctime)
                                    metrics_list.append(metrics)
                                    staged = []
                        if staged and self.grad_accum > 1:
                            # ragged tail under gradient accumulation: pad to K with
                            # zero-weight micro-batches (inert by construction in
                            # build_accum_train_step) so the one-update-per-K
                            # large-effective-batch semantics holds; per-batch
                            # dispatch here would apply up to K-1 full-LR updates
                            nreal = len(staged)
                            hr0, w0 = staged[0]
                            staged += [(np.zeros_like(hr0), np.zeros_like(w0))] * \
                                      (self.steps_per_dispatch - nreal)
                            self.state, metrics = self._run_multi_step(staged, ctime)
                            metrics_list.append({k: v[:nreal] for k, v in metrics.items()})
                        else:
                            # ragged tail (< K batches left) in scanned-dispatch
                            # mode: per-batch dispatches are semantically identical
                            # there, so the scanned program compiles for exactly one K
                            for hr, weight in staged:
                                self.state, metrics = self._run_train_step(hr, weight, ctime)
                                metrics_list.append(metrics)
                m = self._metrics_to_host(metrics_list)
                if len(m.get("sloss", ())) == 0:
                    continue
                epoch_loss = float(np.mean(m["sloss"]))
                interp_epoch_loss = float(np.mean(m["interp_sloss"]))
                ratio = 100.0 * epoch_loss / max(interp_epoch_loss, 1e-12)
                lgm().log(
                    f" ** <{self.model_name}> TRAIN E({epoch:3}/{nepochs}) TIME[{itime:3}:{ctime}] "
                    f"-> Loss= {epoch_loss*1000:6.2f} ({interp_epoch_loss*1000:6.2f}): {ratio:.2f}%",
                    display=True)
                if (itime + 1) % ckpt_period == 0 or itime == nts - 1:
                    self.checkpoint_manager.save_checkpoint(
                        self.state, epoch, itime, TSet.Train, epoch_loss, interp_epoch_loss)
                self.results_accum.record_losses(
                    TSet.Train, epoch - 1 + itime / max(nts, 1), epoch_loss,
                    interp_epoch_loss, flush=((itime + 1) % 32 == 0))

            epoch_time = (time.time() - epoch_start) / 60.0
            lgm().log(f"Epoch Execution time: {epoch_time:.1f} min, train-loss: {epoch_loss:.4f}",
                      display=True)
            self.record_eval(epoch, {TSet.Train: epoch_loss}, TSet.Validation)
            from sres_tpu.util.diagnostics import save_memory_snapshot
            save_memory_snapshot()
            itime0 = 0

        train_time = time.time() - train_start
        self.record_eval(nepochs, {}, TSet.Test)
        self.results_accum.flush()
        self.checkpoint_manager.flush()
        lgm().log(f" -------> Training model with {self.nparams} wts took {train_time/60:.2f} min",
                  display=True)
        self.current_losses = dict(prediction=epoch_loss)
        return self.current_losses

    def _make_batch_producer(self, ctime: TimeType):
        """Closure mapping a ctile → padded (hr, weight, nvalid) or None,
        handed to data/input_pipeline.iter_pipelined. In grain mode the xyflip
        index comes from a per-tile derived seed (worker threads would race
        the sequential generator); sync/threads keep the reference's
        sequential draw order."""
        grain_mode = self.input_backend == "grain"

        def produce(ctile):
            flip_index = (self.dataset.flip_index_for(ctime, ctile)
                          if grain_mode else None)
            batch = self.dataset.get_batch_array(ctile, ctime, flip_index=flip_index)
            return None if batch is None else self._pad_batch(batch)

        return produce

    def _tile_iterator(self, ctime: TimeType, randomize: bool = False) -> TileIterator:
        if self.domain == batchDomain.Tiles:
            timeslice = self.dataset.load_timeslice(ctime)
            return TileIterator.get_iterator(ntiles=timeslice.sizes["tiles"],
                                             randomize=randomize, rng=self._shuffle_rng)
        return TileIterator.get_iterator(randomize=randomize, rng=self._shuffle_rng)

    def _prefetch_next(self, times: List[TimeType], itime: int) -> None:
        """Warm the next timeslice on a worker thread so disk IO overlaps the
        device step stream (replaces the reference's fully synchronous loads,
        dual_trainer.py:303)."""
        if self._prefetch is None or itime + 1 >= len(times):
            return
        loader = self.dataset.srbatch.data_loader
        if hasattr(loader, "prefetch_timeslice"):
            self._prefetch.submit(loader.prefetch_timeslice, times[itime + 1])

    def record_eval(self, epoch: int, losses: Dict[TSet, float], tset: TSet, **kwargs):
        if float(cfg().task.ttsplit.get(tset.value, 0.0)) > 0.0:
            _, eval_losses = self.evaluate(tset, update_model=False, **kwargs)
            if eval_losses:
                self.results_accum.record_losses(
                    tset, epoch, eval_losses["model"], eval_losses["interpolated"])
                self.results_accum.flush()
            return eval_losses

    # ---------------------------------------------------------------- evaluate
    def evaluate(self, tset: TSet, **kwargs) -> Tuple[Dict[str, LArray], Dict[str, float]]:
        """Eval over a tset's timeslices; merges per-batch result tensors and
        rolls the best-validation checkpoint (reference: dual_trainer.py:482)."""
        assert tset in (TSet.Validation, TSet.Test), f"Invalid eval tset: {tset.name}"
        self.time_index = kwargs.get("time_index", self.time_index)
        self.tile_index = kwargs.get("tile_index", self.tile_index)
        update_checkpoint = kwargs.get("update_checkpoint", True)
        update_model = kwargs.get("update_model", False)
        epoch = 0
        if update_model or update_checkpoint:
            meta = self.checkpoint_manager.load_checkpoint(self.state, TSet.Validation,
                                                           update_model=update_model)
            if meta is None:
                lgm().log("Error loading checkpoint file, skipping evaluation.", display=True)
                return {}, {}
            if meta:
                if update_model and "state" in meta:
                    self.state = meta["state"]
                self.validation_loss = meta.get("loss", float("inf"))
                epoch = meta.get("epoch", 0)
        self.init_data_timestamps()

        self.clear_results(tset)
        model_losses, interp_losses = [], []
        # loader_lock: serialize with a live infer_region_stream prefetch
        # worker — load_timeslice/select_batch share current-slice state
        with self.loader_lock:
            for itime, ctime in enumerate(self.data_timestamps.get(tset, [])):
                if self.time_index >= 0 and itime != self.time_index:
                    continue
                tile_iter = self._tile_iterator(ctime)
                for itile, ctile in enumerate(iter(tile_iter)):
                    if not self._tile_in_batch(itile, ctile):
                        continue
                    batch = self.dataset.get_batch_array(ctile, ctime)
                    if batch is None:
                        break
                    hr, weight, nvalid = self._pad_batch(batch)
                    metrics, outputs = self._run_eval_step(hr, weight, ctime)
                    m = jax.device_get(metrics)
                    model_losses.append(float(m["sloss"]))
                    interp_losses.append(float(m["interp_sloss"]))
                    self._merge_results(tset, outputs, nvalid)
                    if self.tile_index >= 0:
                        break
                if self.time_index >= 0:
                    break

        if not model_losses:
            return {}, {}
        model_loss = float(np.mean(model_losses))
        interp_loss = float(np.mean(interp_losses))
        if tset == TSet.Validation and update_checkpoint:
            if model_loss < self.validation_loss or self.validation_loss == 0.0:
                self.checkpoint_manager.save_checkpoint(
                    self.state, epoch, 0, TSet.Validation, model_loss, interp_loss)
                self.validation_loss = model_loss
        from sres_tpu.trainer.losses import psnr
        tgt = self.target.get(tset)
        drange = float(np.nanmax(tgt) - np.nanmin(tgt)) if tgt is not None else 1.0
        losses = dict(model=model_loss, interpolated=interp_loss,
                      model_psnr=float(psnr(model_loss, drange)),
                      interpolated_psnr=float(psnr(interp_loss, drange)))
        results = {k: self._to_xa(getattr(self, k)[tset], upscaled=(k == "input"))
                   for k in ("input", "target", "product", "interp")}
        results = dict(input=results["input"], target=results["target"],
                       model=results["product"], interpolated=results["interp"])
        lgm().log(f" -------> Eval {tset.value}: model loss={model_loss:.4f} "
                  f"interp={interp_loss:.4f}", display=True)
        return results, losses

    def _tile_in_batch(self, itile: int, ctile) -> bool:
        if self.tile_index < 0:
            return True
        if self.domain == batchDomain.Time:
            return self.tile_index == itile
        return ctile["start"] <= self.tile_index < ctile["end"]

    def clear_results(self, tset: TSet) -> None:
        for d in (self.input, self.target, self.product, self.interp):
            d[tset] = None

    def _merge_results(self, tset: TSet, outputs, nvalid: int) -> None:
        lr, out, tar, interp = [np.asarray(o)[:nvalid] for o in jax.device_get(outputs)]
        for store, arr in ((self.input, lr), (self.target, tar),
                           (self.product, out), (self.interp, interp)):
            prev = store.get(tset)
            store[tset] = arr if prev is None else np.concatenate([prev, arr], axis=0)

    def _to_xa(self, data: Optional[np.ndarray], upscaled: bool = False) -> Optional[LArray]:
        if data is None:
            return None
        cscale = self.scale_factor if upscaled else 1
        coords = dict(tiles=np.arange(data.shape[0]), channels=self.target_variables
                      if data.shape[1] == len(self.target_variables) else self.input_variables)
        coords["y"] = np.arange(0, data.shape[2] * cscale, cscale)
        coords["x"] = np.arange(0, data.shape[3] * cscale, cscale)
        return LArray(data.astype(np.float32), ["tiles", "channels", "y", "x"], coords)

    # ------------------------------------------------------------ process_image
    def process_image(self, tset: TSet, itime: int, **kwargs
                      ) -> Tuple[Dict[str, Dict[str, LArray]], Dict[str, Dict[str, float]]]:
        """Full-timeslice inference + denorm + region re-assembly
        (reference: dual_trainer.py:396-447)."""
        cfg().task["xyflip"] = False
        update_model = kwargs.get("update_model", True)
        meta = self.checkpoint_manager.load_checkpoint(self.state, TSet.Validation,
                                                       update_model=update_model)
        if meta is None:
            lgm().log("Error loading checkpoint file, skipping evaluation.", display=True)
            return {}, {}
        if meta and update_model and "state" in meta:
            self.state = meta["state"]
        self.init_data_timestamps()
        ctime = self.data_timestamps[TSet.Train][itime]
        cvar = kwargs.get("var", None)
        output_vars = [cvar] if cvar is not None else self.target_variables

        batches, model_losses, interp_losses = [], [], []
        # loader_lock: serialize with a live infer_region_stream prefetch
        # worker (shared stateful loader)
        with self.loader_lock:
            timeslice = self.dataset.load_timeslice(ctime)
            tile_iter = self._tile_iterator(ctime)
            for ctile in iter(tile_iter):
                batch = self.dataset.get_batch_array(ctile, ctime)
                if batch is None:
                    break
                hr, weight, nvalid = self._pad_batch(batch)
                metrics, outputs = self._run_eval_step(hr, weight, ctime)
                m = jax.device_get(metrics)
                model_losses.append(float(m["sloss"]))
                interp_losses.append(float(m["interp_sloss"]))
                lr, out, tar, interp = [np.asarray(o)[:nvalid] for o in jax.device_get(outputs)]
                attrs = batch.attrs
                batches.append(dict(input=denorm(lr, attrs), target=denorm(tar, attrs),
                                    interpolated=denorm(interp, attrs), model=denorm(out, attrs)))

        images, losses = {}, {}
        tile_ids = np.asarray(timeslice.coords["tiles"])
        grid_shape = timeslice.attrs["grid_shape"]
        for ivar, vname in enumerate(output_vars):
            images[vname] = self.assemble_images(batches, ivar, tile_ids, grid_shape)
            losses[vname] = dict(model=float(np.mean(model_losses)),
                                 interpolated=float(np.mean(interp_losses)))
        return images, losses

    def assemble_images(self, batches: List[Dict[str, np.ndarray]], ivar: int,
                        tile_ids: np.ndarray, grid_shape: Dict[str, int],
                        input_ivar: Optional[int] = None) -> Dict[str, LArray]:
        """tile-id → (row, col) mosaic with NaN fill for dropped tiles
        (reference: dual_trainer.py:449-480). ``input_ivar`` selects the
        'input' panel's channel when target ⊂ input leaves the input with
        more channels than the target-shaped panels."""
        assembled: Dict[str, LArray] = {}
        itypes = list(batches[0].keys()) if batches else []
        for image_type in itypes:
            civ = input_ivar if (image_type == "input" and input_ivar is not None) else ivar
            tidx = 0
            block_grid: Optional[List[List[np.ndarray]]] = None
            for b in batches:
                arr = b[image_type][:, civ]
                tile_shape = list(arr.shape[-2:])
                if block_grid is None:
                    empty = np.full(tile_shape, np.nan, np.float32)
                    block_grid = [[empty] * grid_shape["x"] for _ in range(grid_shape["y"])]
                for i in range(arr.shape[0]):
                    tid = int(tile_ids[tidx])
                    ty, tx = tid // grid_shape["x"], tid % grid_shape["x"]
                    block_grid[ty][tx] = arr[i]
                    tidx += 1
            image = np.block(block_grid)
            coords = {cn: np.arange(0.0, 100.0, 100.0 / image.shape[ic])
                      for ic, cn in enumerate(("y", "x"))}
            assembled[image_type] = LArray(image, ["y", "x"], coords)
        return assembled

    # ------------------------------------------------- multi-chip region inference
    def _prepare_region_inputs(self, ctime: TimeType):
        """Host-side prep for one region timeslice: load, pad to the full
        grid slot count, and build the denorm scale/offset panels. Pure
        numpy — safe to run in a prefetch thread (infer_region_stream); holds
        ``self.loader_lock`` for the stateful load+select so a concurrent
        trainer call can't interleave with a background prep."""
        with self.loader_lock:
            timeslice = self.dataset.load_timeslice(ctime)
            grid_shape = dict(timeslice.attrs["grid_shape"])
            nslots = grid_shape["x"] * grid_shape["y"]
            pad_n = pad_to_multiple(nslots, self.ndata)

            loader = self.dataset.srbatch.data_loader
            batch = loader.select_batch((0, timeslice.shape[0]))
        ntiles = batch.shape[0]
        hr = np.zeros((pad_n,) + batch.data.shape[1:], np.float32)
        hr[:ntiles] = batch.data
        weight = np.zeros((pad_n,), np.float32)
        weight[:ntiles] = 1.0
        tile_ids = np.zeros((pad_n,), np.int32)
        tile_ids[:ntiles] = np.asarray(batch.coords["tiles"], np.int32)
        # denorm as x*scale + offset from the batch stats (identity if absent)
        nch = hr.shape[1]
        scale = np.ones((pad_n, 1, 1, nch), np.float32)
        offset = np.zeros((pad_n, 1, 1, nch), np.float32)
        if "mean" in batch.attrs:
            scale[:ntiles] = np.transpose(batch.attrs["std"], (0, 2, 3, 1))
            offset[:ntiles] = np.transpose(batch.attrs["mean"], (0, 2, 3, 1))
        elif "max" in batch.attrs:
            rng_ = batch.attrs["max"] - batch.attrs["min"]
            scale[:ntiles] = np.transpose(rng_, (0, 2, 3, 1))
            offset[:ntiles] = np.transpose(batch.attrs["min"], (0, 2, 3, 1))
        return grid_shape, hr, weight, tile_ids, scale, offset

    def _get_region_step(self, grid_shape: Dict[str, int]):
        """The jitted padded-batch region program, cached per grid shape
        (jit's trace cache is keyed on the function OBJECT, so rebuilding the
        closure every call would retrace + recompile per timeslice — ~70-100 s
        through the axon tunnel; measured, scripts/bench/region_infer_bench.py)."""
        import functools
        from jax.sharding import NamedSharding, PartitionSpec as P
        from sres_tpu.ops.assemble import assemble_tiles
        from sres_tpu.ops.resize import upsample
        from sres_tpu.trainer.step import _apply, prepare_inputs

        sc = self.step_config
        state = self.state
        gs = (grid_shape["y"], grid_shape["x"])

        region_step = self._region_step_cache.get(gs)
        if region_step is None:
            @functools.partial(jax.jit,
                               in_shardings=(jax.tree.map(lambda _: NamedSharding(self.mesh, P()), state),
                                             NamedSharding(self.mesh, P("data")),
                                             NamedSharding(self.mesh, P("data")),
                                             NamedSharding(self.mesh, P("data")),
                                             NamedSharding(self.mesh, P("data")),
                                             NamedSharding(self.mesh, P("data"))),
                               out_shardings=NamedSharding(self.mesh, P()))
            def region_step(state, hr, weight, ids, scale, offset):
                lr, target = prepare_inputs(hr, sc)
                out, _ = _apply(self.model, state.params, state.batch_stats, lr, False, sc)
                if isinstance(out, tuple):
                    out = out[-1]
                interp = upsample(lr, float(sc.scale), sc.up_mode)
                grid = dict(y=gs[0], x=gs[1])
                images = {}
                for name, arr in (("target", target * scale + offset),
                                  ("model", out * scale + offset),
                                  ("interpolated", interp * scale + offset),
                                  ("input", lr * scale + offset)):
                    chans = [assemble_tiles(arr[..., c], ids, grid, weight)
                             for c in range(arr.shape[-1])]
                    images[name] = jnp.stack(chans, axis=0)
                return images
            self._region_step_cache[gs] = region_step
        return region_step

    def _region_result(self, images) -> Dict[str, Dict[str, LArray]]:
        """D2H fetch of a region_step output + LArray wrapping."""
        images = jax.device_get(images)
        result: Dict[str, Dict[str, LArray]] = {}
        for ivar, vname in enumerate(self.target_variables):
            result[vname] = {k: LArray(np.asarray(v[ivar]), ["y", "x"])
                             for k, v in images.items()}
        return result

    def _maybe_update_model(self, kwargs: Dict[str, Any]) -> None:
        if kwargs.get("update_model", False):
            meta = self.checkpoint_manager.load_checkpoint(self.state, TSet.Validation,
                                                           update_model=True)
            if meta and "state" in meta:
                self.state = meta["state"]

    def infer_region(self, ctime: TimeType, **kwargs) -> Dict[str, Dict[str, LArray]]:
        """Full-region tiled inference with on-device assembly: every tile of
        the timeslice runs through the mesh-sharded eval in ONE padded batch
        (padded to the full grid slot count → a single compilation), results
        are denormalized and scattered into the region mosaic on device, and
        only the final images cross to the host (BASELINE.json config #5).
        """
        if self.domain != batchDomain.Tiles:
            raise NotImplementedError(
                "infer_region requires a tiles-domain task (region datasets); "
                "time-domain tasks cover a single tile grid — use evaluate()")
        self._maybe_update_model(kwargs)
        grid_shape, hr, weight, tile_ids, scale, offset = self._prepare_region_inputs(ctime)
        region_step = self._get_region_step(grid_shape)
        images = region_step(self.state, jnp.asarray(hr), jnp.asarray(weight),
                             jnp.asarray(tile_ids), jnp.asarray(scale),
                             jnp.asarray(offset))
        return self._region_result(images)

    def infer_region_stream(self, ctimes, prefetch: int = 2,
                            overlap_fetch: bool = False, **kwargs):
        """Pipelined multi-timeslice region inference: yields
        ``(ctime, result)`` like repeated :meth:`infer_region` calls, but
        overlaps the three serial phases across timeslices —

        - HOST PREP of slice t+1..t+prefetch runs in a worker thread while
          the device computes slice t (numpy load/pad/stats is a multi-second
          cost at production region sizes);
        - with ``overlap_fetch=True``, the DISPATCH of slice t+1 is also
          enqueued before the D2H fetch of slice t blocks (jax dispatch is
          async), so t's image transfer rides behind t+1's compute.

        ``overlap_fetch`` defaults OFF: through the axon tunnel the link is
        effectively serialized, and interleaving t's D2H with t+1's H2D was
        measured SLOWER than sequential (21.4 vs 12.6 s/region at 3072² HR
        px, scripts/bench/region_infer_bench.py --stream); host-prep-only
        overlap is the safe win. Turn it on for locally-attached devices
        where transfers and compute genuinely overlap — but note it keeps
        slice t's full region image set live on device while t+1's inputs
        AND outputs are resident, roughly DOUBLING peak region HBM at
        production sizes (relevant against the 16 GB red-line, util/hbm.py;
        scripts/bench/hbm_audit.py budgets the overlap mode). The reference's
        equivalent scaling sweep re-enters its per-batch host loop per
        timestep (scaling_results-swot-1.1v_20-20e.py:26-44) with no
        overlap."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        if self.domain != batchDomain.Tiles:
            raise NotImplementedError(
                "infer_region_stream requires a tiles-domain task (region "
                "datasets); time-domain tasks cover a single tile grid")
        self._maybe_update_model(kwargs)
        prefetch = max(1, int(prefetch))
        ctimes = list(ctimes)
        # One worker: loader prep is stateful (load_timeslice sets the
        # current slice before select_batch), so preps must serialize.
        with ThreadPoolExecutor(max_workers=1) as pool:
            preps = deque(
                (ct, pool.submit(self._prepare_region_inputs, ct))
                for ct in ctimes[:prefetch])
            nxt = prefetch
            pending = None  # (ctime, dispatched device images) awaiting D2H
            while preps:
                ctime, fut = preps.popleft()
                grid_shape, hr, weight, tile_ids, scale, offset = fut.result()
                region_step = self._get_region_step(grid_shape)
                images = region_step(self.state, jnp.asarray(hr), jnp.asarray(weight),
                                     jnp.asarray(tile_ids), jnp.asarray(scale),
                                     jnp.asarray(offset))
                if nxt < len(ctimes):
                    preps.append((ctimes[nxt],
                                  pool.submit(self._prepare_region_inputs, ctimes[nxt])))
                    nxt += 1
                if not overlap_fetch:
                    yield ctime, self._region_result(images)
                    continue
                if pending is not None:
                    yield pending[0], self._region_result(pending[1])
                pending = (ctime, images)
            if pending is not None:
                yield pending[0], self._region_result(pending[1])

    # --------------------------------------------- seam-free overlapped inference
    def infer_region_seamless(self, ctime: TimeType, margin: int = 8, **kwargs
                              ) -> Dict[str, Dict[str, LArray]]:
        """Seam-free full-region inference: tiles are extracted with a
        reflected halo of ``margin`` HR pixels so the network sees context
        across tile borders; after SR the halos are cropped and only centers
        are assembled (data/overlap.py). Margin must divide the scale factor.

        All six norm schemes are supported (round-2 verdict item #7): local
        stats are window-central, sidecar (tnorm/tscale) stats are indexed by
        the kept tiles' raster order (which matches the sidecar's valid-tile
        rows — the same static-valid-set assumption the batch path makes),
        and global (gnorm/gscale) schemes attach no stats, so panels stay in
        normalized space exactly like the tiled path. target_variables ⊂
        input_variables is handled by channel-slicing the denorm stats."""
        from sres_tpu.data.norm import (denorm as denorm_fn, normalize_batch,
                                        slice_stats)
        from sres_tpu.data.overlap import extract_overlapped_tiles
        assert margin % self.scale_factor == 0, \
            f"margin {margin} must be a multiple of the scale {self.scale_factor}"
        ntype = cfg().task.norm
        if self.domain != batchDomain.Tiles:
            raise NotImplementedError("seamless inference requires a tiles-domain task")
        if kwargs.get("update_model", False):
            meta = self.checkpoint_manager.load_checkpoint(self.state, TSet.Validation,
                                                           update_model=True)
            if meta and "state" in meta:
                self.state = meta["state"]

        # loader_lock: region read + lazy sidecar compute serialize with a
        # live infer_region_stream prefetch worker (shared loader/sidecar)
        with self.loader_lock:
            region = self.dataset.load_region_data(ctime)       # (C, Y, X) raw
            grid = self.dataset.tile_grid
            ishape = dict(c=region.shape[0], y=region.shape[1], x=region.shape[2])
            gs = grid.get_grid_shape(image_shape=ishape)
            roi = grid.get_active_region(image_shape=ishape)
            active = region.data[:, roi["y"][0]:roi["y"][1], roi["x"][0]:roi["x"][1]]
            ts_hr = grid.get_full_tile_size()
            tiles, ids = extract_overlapped_tiles(active, ts_hr, gs, margin)
            if tiles.shape[0] == 0:
                return {}
            sidecar_stats = global_stats = None
            if ntype in ("tnorm", "tscale", "gnorm", "gscale"):
                loader = self.dataset.srbatch.data_loader
                if ntype in ("tnorm", "tscale"):
                    sidecar_stats = loader.sidecar.get(loader._timeslice_iter)
                    nrows = next(iter(sidecar_stats.values())).shape[0]
                    assert tiles.shape[0] == nrows, \
                        (f"region valid-tile count {tiles.shape[0]} != sidecar "
                         f"rows {nrows}: the NaN mask is not static")
                else:
                    global_stats = loader.sidecar.global_stats(loader._timeslice_iter)
        normed, stats = normalize_batch(tiles, ntype, (0, tiles.shape[0]),
                                        sidecar_stats, global_stats,
                                        list(self.input_variables))

        n = normed.shape[0]
        pad_n = pad_to_multiple(n, self.ndata)
        hr = np.zeros((pad_n,) + normed.shape[1:], np.float32)
        hr[:n] = normed
        weight = np.zeros((pad_n,), np.float32)
        weight[:n] = 1.0
        _, outputs = self._run_eval_step(jnp.asarray(hr), jnp.asarray(weight), ctime)
        lr, out, tar, interp = [np.asarray(o)[:n] for o in jax.device_get(outputs)]

        m, mlr = margin, margin // self.scale_factor
        crop = lambda a, mm: a[:, :, mm:a.shape[2] - mm, mm:a.shape[3] - mm] if mm else a
        tidx = list(self.step_config.target_idx)
        tstats = stats if len(tidx) == len(self.input_variables) \
            else slice_stats(stats, tidx)
        batches = [dict(input=denorm_fn(crop(lr, mlr), stats),
                        target=denorm_fn(crop(tar, m), tstats),
                        interpolated=denorm_fn(crop(interp, m), tstats),
                        model=denorm_fn(crop(out, m), tstats))]
        result: Dict[str, Dict[str, LArray]] = {}
        for ivar, vname in enumerate(self.target_variables):
            result[vname] = self.assemble_images(
                batches, ivar, ids, gs,
                input_ivar=self.input_variables.index(vname))
        return result

    def infer_region_spatial(self, ctime: TimeType, **kwargs
                             ) -> Dict[str, Dict[str, LArray]]:
        """Whole-region SPMD inference: the ENTIRE region runs through the
        network as one image with its H axis sharded over the mesh
        (parallel/spatial.py:infer_region_sharded; GSPMD places the conv
        halo exchanges) — no tiling at all, so there are no seams by
        construction and activation memory scales down with devices. The
        TPU-native alternative to host halo tiling (infer_region_seamless)
        for regions that exceed one chip's HBM.

        All six norm schemes are supported (round-2 verdict item #7): local
        stats are computed over the whole region; sidecar schemes
        (tnorm/tscale) build per-PIXEL stats maps from the position-indexed
        sidecar rows (data/norm.py:tile_stats_maps); global schemes
        normalize with the sidecar-global stats and, like the tiled path,
        return normalized-space panels. target_variables ⊂ input_variables
        is handled by channel-slicing stats/maps for the target panels."""
        from sres_tpu.data.norm import (denorm as denorm_fn, normalize_batch,
                                        normalize_with_attrs, slice_stats,
                                        tile_stats_maps)
        from sres_tpu.parallel.spatial import infer_region_sharded
        from sres_tpu.ops.resize import downsample, upsample

        ntype = cfg().task.norm
        if self.domain != batchDomain.Tiles:
            raise NotImplementedError("spatial inference requires a tiles-domain task")
        if kwargs.get("update_model", False):
            meta = self.checkpoint_manager.load_checkpoint(self.state, TSet.Validation,
                                                           update_model=True)
            if meta and "state" in meta:
                self.state = meta["state"]

        # loader_lock: region read + lazy sidecar compute (in the norm
        # branches below, resolved before any device work) serialize with a
        # live infer_region_stream prefetch worker (shared loader/sidecar)
        with self.loader_lock:
            region = self.dataset.load_region_data(ctime)       # (C, Y, X) raw
            if cfg().task.norm in ("tnorm", "tscale"):
                loader = self.dataset.srbatch.data_loader
                loader.sidecar.get(loader._timeslice_iter)
            elif cfg().task.norm in ("gnorm", "gscale"):
                loader = self.dataset.srbatch.data_loader
                loader.sidecar.global_stats(loader._timeslice_iter)
        grid = self.dataset.tile_grid
        ishape = dict(c=region.shape[0], y=region.shape[1], x=region.shape[2])
        roi = grid.get_active_region(image_shape=ishape)
        gs = grid.get_grid_shape(image_shape=ishape)
        active = region.data[:, roi["y"][0]:roi["y"][1], roi["x"][0]:roi["x"][1]]

        axis = "spatial" if "spatial" in self.mesh.axis_names else "data"
        n = self.mesh.shape[axis]
        # H must split evenly across shards AND stay divisible by the scale
        # for the LR synthesis; pad with zeros (post-norm) and crop after
        quantum = n * self.scale_factor
        ypad = pad_to_multiple(active.shape[1], quantum) - active.shape[1]
        sf = float(self.scale_factor)

        # normalization requires NaN-free input: fill the region's holes with
        # the per-channel mean first, remember the mask, and restore the
        # holes on the way out
        raw = active[None].astype(np.float32)
        nan_mask = ~np.isfinite(raw)
        fill = np.nanmean(raw, axis=(2, 3), keepdims=True)
        raw = np.where(nan_mask, fill, raw)
        sf_i = self.scale_factor
        if ntype in ("lnorm", "lscale"):
            normed, stats = normalize_batch(raw, ntype, (0, 1))
            hr_stats = lr_stats = stats
        elif ntype in ("tnorm", "tscale"):
            loader = self.dataset.srbatch.data_loader
            sidecar = loader.sidecar.get(loader._timeslice_iter)
            grid_hw = self.dataset.tile_grid.get_full_tile_size()
            gy, gx = gs["y"], gs["x"]
            ty, tx = grid_hw["y"], grid_hw["x"]
            d = active.reshape(active.shape[0], gy, ty, gx, tx)
            finite = np.isfinite(d).all(axis=(0, 2, 4))      # (gy, gx)
            valid_ids = np.flatnonzero(finite.ravel())
            hr_stats = tile_stats_maps(valid_ids, gs, grid_hw,
                                       active.shape[1:], sidecar,
                                       list(self.input_variables), ntype)
            # tile-constant maps downsample exactly by strided slicing
            lr_stats = {k: v[:, :, ::sf_i, ::sf_i] for k, v in hr_stats.items()}
            normed = normalize_with_attrs(raw, hr_stats)
        else:   # gnorm / gscale: normalize globally; panels stay normalized
            loader = self.dataset.srbatch.data_loader
            g = loader.sidecar.global_stats(loader._timeslice_iter)
            ga = {}
            names = list(self.input_variables)
            col = lambda i: np.asarray([g[v][i] for v in names],
                                       np.float32).reshape(1, -1, 1, 1)
            if ntype == "gnorm":
                ga = {"mean": col(0), "std": np.sqrt(col(1))}
            elif ntype == "gscale":
                ga = {"max": col(2), "min": col(3)}
            else:
                raise ValueError(f"Unknown norm: {ntype}")
            normed = normalize_with_attrs(raw, ga)
            hr_stats = lr_stats = {}   # like the tiled path: no denorm
        hr = np.pad(normed, ((0, 0), (0, 0), (0, ypad), (0, 0)))
        hr_nhwc = jnp.asarray(np.transpose(hr, (0, 2, 3, 1)))

        lr = downsample(hr_nhwc, sf, self.step_config.down_mode)
        out = infer_region_sharded(self.model, self._eval_variables(), lr,
                                   self.mesh, axis=axis)
        interp = upsample(lr, sf, self.step_config.up_mode)
        to_nchw = lambda a: np.transpose(np.asarray(jax.device_get(a), np.float32),
                                         (0, 3, 1, 2))
        crop = lambda a, s: a[:, :, : a.shape[2] - ypad // s if ypad else None, :]
        tidx = list(self.step_config.target_idx)
        full = tidx == list(range(len(self.input_variables)))
        tsel = lambda a: a if full else a[:, tidx]
        t_hr_stats = hr_stats if (full or not hr_stats) \
            else slice_stats(hr_stats, tidx)
        panels = dict(
            input=denorm_fn(crop(to_nchw(lr), sf_i), lr_stats),
            target=denorm_fn(tsel(crop(np.asarray(hr), 1)), t_hr_stats),
            model=denorm_fn(crop(to_nchw(out), 1), t_hr_stats),
            interpolated=denorm_fn(tsel(crop(to_nchw(interp), 1)), t_hr_stats),
        )
        # restore the region's NaN holes on the full-res panels
        tgt_mask = nan_mask[:, tidx]
        for key in ("target", "model", "interpolated"):
            panels[key] = np.where(tgt_mask, np.nan, panels[key])
        result: Dict[str, Dict[str, LArray]] = {}
        for ivar, vname in enumerate(self.target_variables):
            result[vname] = {
                k: LArray(v[0, ivar if k != "input" else
                            self.input_variables.index(vname)], ["y", "x"])
                for k, v in panels.items()}
        return result

    def _eval_variables(self):
        variables = {"params": self.state.params}
        if self.step_config.has_bn and self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        return variables

    # ------------------------------------------------------------------ export
    def to_zarr(self, **kwargs) -> str:
        """Export the region dataset to a zarr store
        (reference: dual_trainer.py:374-394)."""
        from sres_tpu.util.zarrlite import ZarrWriter
        cfg().task["xyflip"] = False
        ctimes = self.get_dset_time_indices()
        name = kwargs.get("name", ConfigContext.defaults.get("dataset", "dataset"))
        zstore = f"{cfg().platform.processed}/{name}.zarr"
        writer: Optional[ZarrWriter] = None
        for ctime in ctimes:
            ts = self.dataset.load_region_data(ctime)
            data = ts.data[None]  # add time dim
            if writer is None:
                writer = ZarrWriter(zstore, data.shape[1:], np.float32,
                                    dim_names=("time", "channels", "y", "x"))
            writer.append(data)
        if writer is not None:
            writer.close()
        lgm().log(f"Saved dataset {name} to zarr store {zstore}", display=True)
        return zstore
