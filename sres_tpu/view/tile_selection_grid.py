"""Clickable tile-picker over a sample region image
(reference: sres/view/tile_selection_grid.py)."""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


class TileSelectionGrid:
    def __init__(self, trainer, callback: Optional[Callable] = None, **kwargs):
        self.trainer = trainer
        self.callback = callback
        self.fsize = kwargs.get("fsize", 8.0)
        self.selected: Optional[Tuple[int, int]] = None

    def plot(self):
        import matplotlib.pyplot as plt
        from matplotlib.patches import Rectangle
        ds = self.trainer.get_dataset()
        times = ds.get_dset_time_indices()
        region = ds.load_region_data(times[0])
        img = region.data[0]
        grid = self.trainer.dataset.tile_grid
        ishape = dict(c=region.shape[0], y=img.shape[0], x=img.shape[1])
        gs = grid.get_grid_shape(image_shape=ishape)
        ts = grid.get_full_tile_size()

        fig, ax = plt.subplots(figsize=(self.fsize, self.fsize * img.shape[0] / img.shape[1]))
        ax.imshow(img, origin="lower", cmap="jet")
        for iy in range(gs["y"]):
            for ix in range(gs["x"]):
                ax.add_patch(Rectangle((ix * ts["x"], iy * ts["y"]), ts["x"], ts["y"],
                                       fill=False, edgecolor="white", lw=0.6))

        def on_click(event):
            if event.xdata is None:
                return
            ix, iy = int(event.xdata // ts["x"]), int(event.ydata // ts["y"])
            self.selected = (ix, iy)
            if self.callback is not None:
                self.callback(ix, iy)

        fig.canvas.mpl_connect("button_press_event", on_click)
        return fig
