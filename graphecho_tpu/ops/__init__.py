from graphecho_tpu.ops.grl import gradient_reversal
from graphecho_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_nearest,
    upsample_add,
)
from graphecho_tpu.ops.sinkhorn import sinkhorn_rpm, sinkhorn_distance

__all__ = [
    "gradient_reversal",
    "resize_bilinear_align_corners",
    "resize_nearest",
    "upsample_add",
    "sinkhorn_rpm",
    "sinkhorn_distance",
]
