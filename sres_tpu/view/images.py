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

    def select_point(self, event) -> None:
        """Image click callback (reference: images.py:66,97-98); subclasses
        or notebooks may override to pick tiles / probe values."""
        from sres_tpu.util.logging import lgm
        if event.xdata is not None and event.ydata is not None:
            lgm().log(f"Mouse click: button={event.button}, "
                      f"x={event.xdata:.2f}, y={event.ydata:.2f}")

    def _title(self, panel, losses) -> str:
        loss = losses.get({"model": "model", "interpolated": "interpolated"}
                          .get(panel, ""), None)
        return panel if loss is None else f"{panel}, loss={1e3 * loss:.3f}"

    def plot(self):
        images, losses = self._compute()
        fig, axs = self.create_figure(
            2, 2, title=f"{self.varname} region t={self.itime}",
            callbacks=dict(button_press_event=self.select_point))
        self._axes = {}
        for k, panel in enumerate(PANELS):
            ax = axs[k // 2][k % 2]
            if panel not in images:
                ax.axis("off")
                continue
            img = np.asarray(images[panel].data).squeeze()
            vmin, vmax = cscale(img)
            self.ims[panel] = ax.imshow(img, origin="lower", cmap="jet", vmin=vmin, vmax=vmax)
            self._axes[panel] = ax
            ax.set_title(self._title(panel, losses))
        try:
            import ipywidgets as ipw
            nts = len(self.trainer.data_timestamps.get(TSet.Train, [1]))
            slider = StepSlider("time", nts, self._set_time)
            return ipw.VBox([ipw.Label(""), slider.gui()])
        except Exception:
            return fig

    def _set_time(self, i: int) -> None:
        self.itime = i
        images, losses = self._compute()
        if self.fig is not None:
            self.fig.suptitle(f"{self.varname} region t={self.itime}")
        for panel, im in self.ims.items():
            img = np.asarray(images[panel].data).squeeze()
            im.set_data(img)
            im.set_clim(*cscale(img))
            if getattr(self, "_axes", {}).get(panel) is not None:
                self._axes[panel].set_title(self._title(panel, losses))
