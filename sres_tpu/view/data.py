"""Raw data browser (reference: sres/view/plot/data.py DataPlot): input/target
tile panels straight from the dataset, with time/tile steppers."""
from __future__ import annotations

import numpy as np

from sres_tpu.ops.resize import downsample
from sres_tpu.view.base import Plot, cscale


class DataPlot(Plot):
    def __init__(self, trainer, **kwargs):
        super().__init__(trainer, **kwargs)
        self.times = trainer.get_dset_time_indices()
        self.itime = 0
        self.itile = 0
        self.ims = {}

    def _tiles(self):
        return self.trainer.dataset.load_timeslice(self.times[self.itime])

    def plot(self):
        ts = self._tiles()
        fig, axs = self.create_figure(1, 2, title="raw tiles: LR input / HR target")
        hr = ts.data[min(self.itile, ts.shape[0] - 1), 0]
        lr = np.asarray(downsample(hr[None, :, :, None].astype(np.float32),
                                   float(self.trainer.scale_factor)))[0, :, :, 0]
        for ax, (name, img) in zip(np.atleast_1d(axs).ravel(),
                                   [("input (synth LR)", lr), ("target (HR)", hr)]):
            vmin, vmax = cscale(img)
            self.ims[name] = ax.imshow(img, origin="lower", cmap="jet", vmin=vmin, vmax=vmax)
            ax.set_title(name)
        try:
            import ipywidgets as ipw
            from sres_tpu.view.widgets import StepSlider
            tsl = StepSlider("time", len(self.times), self._set_time)
            lsl = StepSlider("tile", ts.shape[0], self._set_tile)
            return ipw.VBox([ipw.Label(""), tsl.gui(), lsl.gui()])
        except Exception:
            return fig

    def _set_time(self, i: int) -> None:
        self.itime = i
        self._refresh()

    def _set_tile(self, i: int) -> None:
        self.itile = i
        self._refresh()

    def _refresh(self) -> None:
        ts = self._tiles()
        hr = ts.data[min(self.itile, ts.shape[0] - 1), 0]
        lr = np.asarray(downsample(hr[None, :, :, None].astype(np.float32),
                                   float(self.trainer.scale_factor)))[0, :, :, 0]
        for name, img in [("input (synth LR)", lr), ("target (HR)", hr)]:
            self.ims[name].set_data(img)
            self.ims[name].set_clim(*cscale(img))
