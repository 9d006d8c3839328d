"""sres_tpu — a TPU-native (JAX/XLA/Pallas) super-resolution framework for
ocean/climate fields, built from scratch with the capabilities of
nasa-nccs-hpda/super-resolution-climate (see SURVEY.md).

Layer map (mirrors the reference's L0-L6, re-designed TPU-first):
  config      — hydra-compatible YAML compose tree (reference: sres/base/util/config.py)
  util        — logging, dates, labeled arrays
  ops         — resize (bicubic as MXU matmuls), pixel shuffle, pallas kernels
  models      — 10-architecture SR zoo behind a registry (reference: sres/model/)
  data        — tile grid, normalization, SWOT/LLC4320/synthetic loaders
  trainer     — jitted train/eval engine, checkpoints, loss CSV
  parallel    — device mesh + sharding specs (new: the reference is single-GPU)
  controller  — WorkflowController public API (reference: sres/controller/workflow.py)
"""

__version__ = "0.1.0"
