"""Result tile browser (reference: sres/view/plot/tiles.py): 2×2 panel of
input/target/interpolated/model from saved inference NetCDFs, with time/tile
steppers and RMSE in the panel titles."""
from __future__ import annotations

import numpy as np

from sres_tpu.data.inference_io import (ResultStructure, TSet, load_inference_results,
                                        time_indices)
from sres_tpu.view.base import Plot, cscale
from sres_tpu.view.widgets import StepSlider

PANELS = ["input", "target", "interpolated", "model"]


class ResultTilePlot(Plot):
    def __init__(self, trainer, tset: TSet, **kwargs):
        super().__init__(trainer, **kwargs)
        self.tset = tset
        self.varname = kwargs.get("varname", trainer.target_variables[0])
        self.tsteps = sorted(time_indices(self.varname, ResultStructure.Tiles))
        self.itime = self.tsteps[0] if self.tsteps else 0
        self.itile = 0
        self.ims = {}

    def _load(self):
        return load_inference_results(self.varname, ResultStructure.Tiles, self.itime)

    def _rmse_suffix(self, panel, results, tile) -> str:
        """RMSE-vs-target in the panel title (reference: tiles.py:137-208)."""
        if panel in ("model", "interpolated") and "target" in results:
            arr = np.asarray(results["target"].data)
            tgt = arr[min(self.itile, arr.shape[0] - 1)].squeeze()
            if tgt.shape == tile.shape:
                return f" rmse={np.sqrt(np.nanmean((tile - tgt) ** 2)):.4f}"
        return ""

    def plot(self):
        results, losses = self._load()
        fig, axs = self.create_figure(2, 2, title=f"{self.varname} tiles")
        self._axes = {}
        ntiles = results["target"].shape[0]
        for k, panel in enumerate(PANELS):
            ax = axs[k // 2][k % 2]
            if panel not in results:
                ax.axis("off")
                continue
            arr = np.asarray(results[panel].data)
            tile = arr[min(self.itile, arr.shape[0] - 1)].squeeze()
            vmin, vmax = cscale(tile)
            self.ims[panel] = ax.imshow(tile, origin="lower", cmap="jet",
                                        vmin=vmin, vmax=vmax)
            self._axes[panel] = ax
            ax.set_title(f"{panel}{self._rmse_suffix(panel, results, tile)}")
        try:
            import ipywidgets as ipw
            tslider = StepSlider("time", len(self.tsteps), self._set_time)
            lslider = StepSlider("tile", ntiles, self._set_tile)
            return ipw.VBox([fig.canvas if hasattr(fig, "canvas") else ipw.Label(""),
                             tslider.gui(), lslider.gui()])
        except Exception:
            return fig

    def _set_time(self, i: int) -> None:
        self.itime = self.tsteps[i] if self.tsteps else 0
        self._refresh()

    def _set_tile(self, i: int) -> None:
        self.itile = i
        self._refresh()

    def _refresh(self) -> None:
        results, _ = self._load()
        for panel, im in self.ims.items():
            arr = np.asarray(results[panel].data)
            tile = arr[min(self.itile, arr.shape[0] - 1)].squeeze()
            im.set_data(tile)
            im.set_clim(*cscale(tile))
            ax = getattr(self, "_axes", {}).get(panel)
            if ax is not None:
                ax.set_title(f"{panel}{self._rmse_suffix(panel, results, tile)}")
