"""WorkflowController — the public API layer (reference:
sres/controller/workflow.py). Train a list of models each in its own config
context, run tile/image-structured inference with NetCDF artifact saving,
export to zarr, and hand out the result-browser views.
"""
from __future__ import annotations

import argparse
import sys
import time
from typing import Any, Dict, List, Optional, Tuple

from sres_tpu.config import ConfigContext, cfg
from sres_tpu.data.inference_io import (ResultStructure, TSet,
                                        save_inference_results)
from sres_tpu.trainer import ModelTrainer
from sres_tpu.util.larray import LArray
from sres_tpu.util.logging import LogManager, lgm


class WorkflowController:
    def __init__(self, cname: str, configuration: Dict[str, Any], **kwargs):
        self.cname = cname
        self.seed = kwargs.get("seed", int(time.time() / 60))
        self.interp_loss = kwargs.get("interp_loss", False)
        # reference API compat: WorkflowController(..., refresh_state=True)
        # behaves like the -r CLI flag (reference: scripts/train/train-dbpn.py)
        self.refresh_state = bool(kwargs.get("refresh_state", False))
        self.config: Optional[ConfigContext] = None
        self.trainer: Optional[ModelTrainer] = None
        self.plot = None
        self.model: Optional[str] = None
        ConfigContext.set_defaults(**configuration)

    # ------------------------------------------------------------------ train
    def train(self, models: List[str], **kwargs) -> None:
        for model in models:
            with ConfigContext(self.cname, model=model, **kwargs) as cc:
                try:
                    self.config = cc
                    LogManager.reset()
                    args = self.get_args()
                    self.trainer = ModelTrainer(cc, seed=self.seed)
                    self.trainer.train(args.nepochs, args.refresh or self.refresh_state,
                                       seed=self.seed, interp_loss=self.interp_loss)
                except Exception as e:
                    lgm().exception(f"Exception while training model: {e}")
                lgm().log(f"Completed training model: {model}", display=True)

    def get_args(self) -> argparse.Namespace:
        """-r/--refresh and -ne/--nepochs CLI flags (reference: workflow.py:44-48).
        Unknown args are ignored so tests/notebooks can call train() directly."""
        p = argparse.ArgumentParser(description=f"Execute workflow {self.cname}")
        p.add_argument("-r", "--refresh", action="store_true",
                       help="delete existing checkpoints and loss history")
        p.add_argument("-ne", "--nepochs", nargs="?", default=cfg().task.nepochs, type=int,
                       help="number of training epochs")
        args, _ = p.parse_known_args()
        return args

    # -------------------------------------------------------------- inference
    def inference(self, timestep: int, data_structure: ResultStructure, **kwargs
                  ) -> Tuple[Dict[str, Dict[str, LArray]], Dict[str, Dict[str, float]]]:
        varnames = self.trainer.target_variables
        region_mode = kwargs.pop("region_mode", "tiled")
        if region_mode not in ("tiled", "seamless", "spatial"):
            raise ValueError(
                f"Unknown region_mode {region_mode!r}: expected one of "
                "'tiled', 'seamless', 'spatial'")
        if data_structure == ResultStructure.Image and region_mode != "tiled":
            # TPU-native region modes beyond the reference's tiled assembly:
            # 'seamless' (host halo tiling) / 'spatial' (whole-region SPMD)
            ctime = self.trainer.get_dset_time_indices()[timestep]
            fn = {"seamless": self.trainer.infer_region_seamless,
                  "spatial": self.trainer.infer_region_spatial}[region_mode]
            image_results = fn(ctime, update_model=True)
            eval_results = {vn: {} for vn in varnames}
        elif data_structure == ResultStructure.Image:
            image_results, eval_results = self.trainer.process_image(
                TSet.Validation, timestep, interp_loss=True, update_model=True, **kwargs)
        elif data_structure == ResultStructure.Tiles:
            image_results, eval_results = {}, {}
            condensed, losses = self.trainer.evaluate(
                TSet.Validation, time_index=timestep, update_checkpoint=False,
                update_model=True, **kwargs)
            if len(varnames) == 1:
                image_results = {varnames[0]: {k: v.isel(channels=0)
                                               for k, v in condensed.items() if v is not None}}
                eval_results = {varnames[0]: losses}
            else:
                for vn in varnames:
                    image_results[vn] = {
                        k: (v.sel(channels=vn) if vn in list(v.coords.get("channels", [])) else v)
                        for k, v in condensed.items() if v is not None}
                    eval_results[vn] = losses
        else:
            raise ValueError(f"Unknown result structure: {data_structure}")
        if kwargs.get("save", True):
            for vn in varnames:
                if vn in image_results and image_results[vn]:
                    save_inference_results(vn, data_structure, image_results[vn],
                                           timestep, eval_results[vn])
        return image_results, eval_results

    def inference_stream(self, timesteps, save: bool = True, prefetch: int = 2,
                         **kwargs):
        """Pipelined multi-timestep image inference: yields
        ``(timestep, image_results)`` and saves the same per-timestep NetCDF
        artifacts as repeated ``inference(t, ResultStructure.Image)`` calls.

        Runs the TPU-native padded-batch region mode
        (ModelTrainer.infer_region_stream): host prep for timestep t+1
        overlaps device compute for t, so a scaling sweep approaches
        max(host, device) per step instead of their sum. The reference's
        sweep re-enters its per-batch host loop each timestep with no
        overlap (scripts/inference/scaling_results-swot-1.1v_20-20e.py:26-44).

        Loads the best-validation checkpoint by default (update_model=True,
        same as inference()); pass update_model=False to stream with the
        in-memory state. Unlike inference(), the streamed NetCDF artifacts
        carry NO per-variable eval losses (empty loss attrs): computing them
        would re-enter the per-tile eval path per timestep and defeat the
        pipelining — run inference(t, ResultStructure.Tiles) for losses."""
        kwargs.setdefault("update_model", True)
        varnames = self.trainer.target_variables
        tindices = self.trainer.get_dset_time_indices()
        timesteps = list(timesteps)
        ctimes = [tindices[t] for t in timesteps]
        stream = self.trainer.infer_region_stream(ctimes, prefetch=prefetch,
                                                  **kwargs)
        for ts, (_, image_results) in zip(timesteps, stream):
            if save:
                for vn in varnames:
                    save_inference_results(vn, ResultStructure.Image,
                                           image_results[vn], ts, {})
            yield ts, image_results

    # ---------------------------------------------------------------- plumbing
    def initialize(self, cname: str, model: str, **kwargs) -> None:
        self.model = model
        self.config = ConfigContext.activate_global(cname, model=model, **kwargs)
        LogManager.reset()
        lgm().log(f"Initialize WorkflowController({cname}), model={model}")
        self.trainer = ModelTrainer(self.config, seed=self.seed)

    def init_context(self, cc: ConfigContext, model: str) -> None:
        self.model = model
        self.config = cc
        self.trainer = ModelTrainer(cc, seed=self.seed)

    def to_zarr(self, **kwargs) -> str:
        return self.trainer.to_zarr(**kwargs)

    # ------------------------------------------------------------------- views
    def get_result_tile_view(self, tset: TSet, **kwargs):
        from sres_tpu.view.tiles import ResultTilePlot
        self.plot = ResultTilePlot(self.trainer, tset, **kwargs)
        return self.plot.plot()

    def get_result_image_view(self, tset: TSet, varname: str, **kwargs):
        from sres_tpu.view.images import ResultImagePlot
        self.plot = ResultImagePlot(self.trainer, tset, varname, **kwargs)
        return self.plot.plot()

    def get_training_view(self, **kwargs):
        from sres_tpu.view.training import TrainingPlot
        self.plot = TrainingPlot(self.trainer, **kwargs)
        return self.plot.plot()

    def test(self, model: str, test_name: str, **kwargs) -> None:
        with ConfigContext(self.cname, model=model, **kwargs) as cc:
            self.config = cc
            self.trainer = ModelTrainer(cc, seed=self.seed)
            if test_name == "load_raw_dataset":
                times = self.trainer.get_dset_time_indices()
                self.trainer.dataset.load_timeslice(times[0])
