"""Multiscale image browser (reference: sres/view/multiscale.py:39-88
``mplplot``): one panel per image type, tile + channel steppers, mean±2σ
color scaling. Operates on {name: LArray(tiles, channels, y, x)} dicts —
e.g. the per-level outputs of the pyramid models (LapSRN/MSCNN)."""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from sres_tpu.util.larray import LArray
from sres_tpu.view.base import _vbox, cscale
from sres_tpu.view.widgets import StepSlider


def mplplot(images: Dict[str, LArray], **kwargs):
    import ipywidgets as ipw
    import matplotlib.pyplot as plt

    sample = list(images.values())[0]
    ntiles = sample.shape[0]
    channels: List[str] = list(sample.coords.get("channels", range(sample.shape[1])))
    fsize = kwargs.get("fsize", 5.0)
    ntypes = len(images)

    with plt.ioff():
        fig, axs = plt.subplots(1, ntypes, sharex=False, sharey=False,
                                figsize=[ntypes * fsize * 1.2, fsize], layout="tight")
    axs = np.atleast_1d(axs)
    ims = {}
    for itype, (tname, image) in enumerate(images.items()):
        vmin, vmax = cscale(image.data, 2.0)
        frame = np.nan_to_num(image.data[0, 0])
        ims[itype] = axs[itype].imshow(frame, cmap="jet", origin="lower",
                                       vmin=vmin, vmax=vmax)
        axs[itype].set_title(tname)

    def update(_=None):
        it, ic = tslider.value, cslider.value
        fig.suptitle(f"Tile {it}, Channel: {channels[ic]}", fontsize=10, va="top", y=1.0)
        for itype, (tname, image) in enumerate(images.items()):
            ims[itype].set_data(np.nan_to_num(image.data[it, ic]))
        fig.canvas.draw_idle()

    tslider = StepSlider("Tile:", ntiles, update)
    cslider = StepSlider("Channel:", len(channels), update)
    update()
    return _vbox(ipw, [tslider.gui(), cslider.gui()], fig)


def multiscale_view(trainer, tset, **kwargs):
    """Browse a pyramid model's per-level outputs against the per-level
    interpolation baselines (new composition for the TPU build; the
    reference's multiscale view browsed MERRA2 forecast datasets)."""
    results, _ = trainer.evaluate(tset, update_model=kwargs.pop("update_model", False),
                                  update_checkpoint=False)
    images = {k: v for k, v in results.items() if v is not None}
    return mplplot(images, **kwargs)
