"""Error-curve plot for saved eval results (reference:
sres/view/training_results.py:37-54 ``mplplot_error``): per-variable RMSE of
(target − product) over the tile axis as labeled line plots."""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

COLORS = ["red", "blue", "green", "cyan", "magenta", "yellow", "grey",
          "brown", "pink", "purple", "orange", "black"]


def rms(a: np.ndarray) -> float:
    return float(np.sqrt(np.nanmean(np.square(a))))


def rmse_per_tile(diff: np.ndarray) -> np.ndarray:
    """(tiles, ...) → per-tile RMSE (reference: training_results.py:17-20)."""
    return np.array([rms(diff[i]) for i in range(diff.shape[0])])


def mplplot_error(target, product, vnames: List[str],
                  norms: Optional[Dict[str, Dict[str, float]]] = None, **kwargs):
    """target/product: LArray (tiles, channels, y, x); one RMSE line per
    variable, optionally normalized by provided {var: {mean, std}} stats."""
    import matplotlib.pyplot as plt

    with plt.ioff():
        fig, ax = plt.subplots(1, 1, figsize=[9, 6], layout="tight")
    channels = list(target.coords.get("channels", vnames))
    for iv, vname in enumerate(vnames):
        ic = channels.index(vname) if vname in channels else iv
        t = np.asarray(target.data[:, ic], np.float64)
        p = np.asarray(product.data[:, ic], np.float64)
        if norms and vname in norms:
            s = norms[vname]
            t = (t - s["mean"]) / s["std"]
            p = (p - s["mean"]) / s["std"]
        err = rmse_per_tile(t - p)
        ax.plot(np.arange(err.size), err, color=COLORS[iv % len(COLORS)], label=vname)
    ax.set_title("  Model Error  ")
    ax.set_xlabel("tile")
    ax.set_ylabel("RMSE")
    ax.legend()
    return fig.canvas


def training_results_view(trainer, tset, **kwargs):
    results, _ = trainer.evaluate(tset, update_model=kwargs.pop("update_model", False),
                                  update_checkpoint=False)
    return mplplot_error(results["target"], results["model"],
                         trainer.target_variables, **kwargs)
