"""Plot scaffolding (reference: sres/view/plot/base.py). matplotlib +
ipywidgets are optional — views degrade to figure-only mode without widgets."""
from __future__ import annotations

from typing import Any, Optional


class Plot:
    def __init__(self, trainer, **kwargs):
        import matplotlib.pyplot as plt
        self.trainer = trainer
        self.fsize = kwargs.get("fsize", 8.0)
        self.plt = plt
        self.fig = None
        self.axs = None

    def create_figure(self, nrows: int = 1, ncols: int = 1, sharex: bool = False,
                      sharey: bool = False, title: Optional[str] = None,
                      callbacks: Optional[dict] = None):
        """callbacks: {mpl event name: handler} wired via mpl_connect
        (reference: view/plot/base.py create_figure + images.py:66)."""
        self.fig, self.axs = self.plt.subplots(
            nrows, ncols, sharex=sharex, sharey=sharey,
            figsize=[self.fsize, self.fsize * 0.75 * nrows / max(ncols, 1)])
        if title:
            self.fig.suptitle(title)
        for event, handler in (callbacks or {}).items():
            self.fig.canvas.mpl_connect(event, handler)
        return self.fig, self.axs

    def plot(self) -> Any:
        raise NotImplementedError


def cscale(data, nsigma: float = 2.0):
    """Color scale = mean ± nsigma·std (reference: view/plot/tiles.py:35)."""
    import numpy as np
    mean, std = float(np.nanmean(data)), float(np.nanstd(data))
    return mean - nsigma * std, mean + nsigma * std


def _vbox(ipw, widgets, fig):
    """Widget box with the figure canvas when the backend is widget-capable
    (ipympl); plain figure otherwise (headless/Agg tests)."""
    try:
        return ipw.VBox(widgets + [fig.canvas])
    except Exception:
        return fig
