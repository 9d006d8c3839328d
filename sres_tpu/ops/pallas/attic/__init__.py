"""ARCHIVED Pallas kernels — measured losers kept for the record.

``residual_group.py``: the fused lane-packed residual-group kernel
(forward + custom-VJP backward, grad-checked in interpret mode, correct on
chip). Measured 196.8 tiles/s vs 314.4 for the lane-packed XLA composition
(round 2, PERF.md): its backward's per-RCAB HBM stash forces remat (a
second forward) and Mosaic's matmul scheduling trails XLA's conv emitter
by ~20% on these shapes. The round-3 follow-up — int8 in-kernel — was
overtaken by events: XLA lowers convert-from-int8 convs onto the int8 MXU
directly (ops/int8_conv.py), so the quantization-fusion goal is met
without Mosaic. Two consecutive rounds of measurement say the profitable
Pallas boundary on this hardware is matmul-shaped ops on full-lane
operands with modest arithmetic around them (the window-attention kernel,
which stays default-on); RCAB chains are not that. Archived per the
round-2 verdict (item #6): still importable (``model.fused: true`` runs
it; tests stay green), not a production path.
"""
from sres_tpu.ops.pallas.attic.residual_group import fused_residual_group  # noqa: F401
