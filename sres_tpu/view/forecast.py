"""Target/product/difference browser (reference: sres/view/plot/forecast.py
``mplplot``): one row per variable, columns target/model/difference, tile
stepper, per-tile RMSE in the difference title, mean±2σ color scaling.

The reference browsed MERRA2 forecast xarray Datasets with level/time axes;
this build browses the evaluate() result LArrays (tiles, channels, y, x) —
the live data source here."""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from sres_tpu.util.larray import LArray
from sres_tpu.view.base import _vbox, cscale
from sres_tpu.view.training_results import rms
from sres_tpu.view.widgets import StepSlider

PTYPES = ["target", "model", "difference"]


def mplplot(target: LArray, vnames: List[str], product: Optional[LArray] = None,
            **kwargs):
    import ipywidgets as ipw
    import matplotlib.pyplot as plt

    nvars = len(vnames)
    ptypes = PTYPES if product is not None else ["target"]
    ncols = len(ptypes)
    channels = list(target.coords.get("channels", vnames))
    fsize = kwargs.get("fsize", 5.0)

    with plt.ioff():
        fig, axs = plt.subplots(nvars, ncols, sharex=True, sharey=True,
                                figsize=[ncols * fsize, nvars * fsize * 0.75],
                                layout="tight")
    axs = np.atleast_2d(axs)
    if axs.shape != (nvars, ncols):
        axs = axs.reshape(nvars, ncols)

    def planes(iv: int, it: int):
        ic = channels.index(vnames[iv]) if vnames[iv] in channels else iv
        t = np.asarray(target.data[:, ic], np.float64)
        if product is None:
            return [t][it]
        p = np.asarray(product.data[:, ic], np.float64)
        return [t, p, t - p][it]

    ims = {}
    for iv in range(nvars):
        for it in range(ncols):
            pvar = planes(iv, it)
            vmin, vmax = cscale(pvar, 2.0)
            ims[(iv, it)] = axs[iv, it].imshow(np.nan_to_num(pvar[0]), cmap="jet",
                                               origin="lower", vmin=vmin, vmax=vmax)
            axs[iv, it].set_title(f"{vnames[iv]} {ptypes[it]}")

    def update(_=None):
        itile = tslider.value
        for iv in range(nvars):
            for it in range(ncols):
                pvar = planes(iv, it)
                ims[(iv, it)].set_data(np.nan_to_num(pvar[itile]))
                title = f"{vnames[iv]} {ptypes[it]}"
                if ptypes[it] == "difference":
                    title += f" (rmse={rms(pvar[itile]):.4f})"
                axs[iv, it].set_title(title)
        fig.canvas.draw_idle()

    tslider = StepSlider("Tile:", target.shape[0], update)
    update()
    return _vbox(ipw, [tslider.gui()], fig)


def forecast_view(trainer, tset, **kwargs):
    results, _ = trainer.evaluate(tset, update_model=kwargs.pop("update_model", False),
                                  update_checkpoint=False)
    return mplplot(results["target"], trainer.target_variables,
                   product=results["model"], **kwargs)
