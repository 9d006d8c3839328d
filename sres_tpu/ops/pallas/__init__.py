from sres_tpu.ops.pallas.rcab import fused_rcab  # noqa: F401
