from sres_tpu.ops.resize import (  # noqa: F401
    downsample,
    interp_mode,
    resize,
    resize_matrix,
    upsample,
)
from sres_tpu.ops.shuffle import pixel_shuffle  # noqa: F401
