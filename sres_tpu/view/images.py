"""Assembled-region image browser (reference: sres/view/plot/images.py):
4-row input/target/interp/model panels from live trainer.process_image."""
from __future__ import annotations

import numpy as np

from sres_tpu.data.inference_io import TSet
from sres_tpu.view.base import Plot, cscale
from sres_tpu.view.widgets import StepSlider

PANELS = ["input", "target", "interpolated", "model"]


class ResultImagePlot(Plot):
    def __init__(self, trainer, tset: TSet, varname: str, **kwargs):
        super().__init__(trainer, **kwargs)
        self.tset = tset
        self.varname = varname
        self.itime = kwargs.get("itime", 0)
        self.ims = {}

    def _compute(self):
        images, losses = self.trainer.process_image(self.tset, self.itime, var=self.varname)
        return images.get(self.varname, {}), losses.get(self.varname, {})

    def plot(self):
        images, losses = self._compute()
        fig, axs = self.create_figure(2, 2, title=f"{self.varname} region t={self.itime}")
        for k, panel in enumerate(PANELS):
            ax = axs[k // 2][k % 2]
            if panel not in images:
                ax.axis("off")
                continue
            img = np.asarray(images[panel].data).squeeze()
            vmin, vmax = cscale(img)
            self.ims[panel] = ax.imshow(img, origin="lower", cmap="jet", vmin=vmin, vmax=vmax)
            suffix = f" loss={losses.get('model', float('nan')):.4f}" if panel == "model" else ""
            ax.set_title(panel + suffix)
        try:
            import ipywidgets as ipw
            nts = len(self.trainer.data_timestamps.get(TSet.Train, [1]))
            slider = StepSlider("time", nts, self._set_time)
            return ipw.VBox([ipw.Label(""), slider.gui()])
        except Exception:
            return fig

    def _set_time(self, i: int) -> None:
        self.itime = i
        images, _ = self._compute()
        for panel, im in self.ims.items():
            img = np.asarray(images[panel].data).squeeze()
            im.set_data(img)
            im.set_clim(*cscale(img))
