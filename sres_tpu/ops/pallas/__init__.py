from sres_tpu.ops.pallas.attic.residual_group import fused_residual_group  # noqa: F401
from sres_tpu.ops.pallas.window_attention import fused_window_attention  # noqa: F401
