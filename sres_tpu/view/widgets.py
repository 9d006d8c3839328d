"""StepSlider: slider + prev/next buttons (reference: sres/view/plot/widgets.py)."""
from __future__ import annotations

from typing import Callable, Optional


class StepSlider:
    def __init__(self, label: str, nvals: int, callback: Optional[Callable] = None):
        import ipywidgets as ipw
        self.callback = callback
        self.slider = ipw.IntSlider(value=0, min=0, max=max(nvals - 1, 0), description=label)
        self.prev = ipw.Button(description="<", layout=ipw.Layout(width="32px"))
        self.next = ipw.Button(description=">", layout=ipw.Layout(width="32px"))
        self.prev.on_click(lambda b: self.step(-1))
        self.next.on_click(lambda b: self.step(1))
        self.slider.observe(self._changed, names="value")
        self.box = ipw.HBox([self.prev, self.slider, self.next])

    @property
    def value(self) -> int:
        return int(self.slider.value)

    def step(self, d: int) -> None:
        self.slider.value = int(min(max(self.slider.value + d, self.slider.min), self.slider.max))

    def _changed(self, change) -> None:
        if self.callback is not None:
            self.callback(change["new"])

    def gui(self):
        return self.box
