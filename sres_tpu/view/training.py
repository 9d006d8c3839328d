"""Training-curve browser (reference: sres/view/plot/training.py): model/ref ×
train/valid loss-vs-epoch from the ResultsAccumulator CSV, log-y, subsampled
to ≤200 points."""
from __future__ import annotations

import numpy as np

from sres_tpu.view.base import Plot

MAX_POINTS = 200


class TrainingPlot(Plot):
    def __init__(self, trainer, **kwargs):
        super().__init__(trainer, **kwargs)
        self.accum = trainer.results_accum
        if not self.accum.results:
            self.accum.load_results()

    def plot(self):
        x, y = self.accum.get_plot_data()
        fig, ax = self.create_figure(title="Training loss")
        for pid in sorted(x.keys()):
            xs, ys = x[pid], y[pid]
            if xs.size == 0:
                continue
            if xs.size > MAX_POINTS:
                stride = xs.size // MAX_POINTS
                xs, ys = xs[::stride], ys[::stride]
            order = np.argsort(xs)
            ax.plot(xs[order], ys[order], label=pid, lw=1.2)
        ax.set_yscale("log")
        ax.set_xlabel("epoch")
        ax.set_ylabel("loss (RMSE)")
        ax.legend()
        return fig
