from e2fgvi_tpu.ops.resize import (
    resize_bilinear,
    avg_pool_2x2,
)
from e2fgvi_tpu.ops.warp import grid_sample_bilinear, flow_warp
from e2fgvi_tpu.ops.patches import unfold, fold, fold_normalized
from e2fgvi_tpu.ops.convs import conv2d, conv3d, leaky_relu, layer_norm
from e2fgvi_tpu.ops.dcn import modulated_deform_conv2d

__all__ = [
    "resize_bilinear",
    "avg_pool_2x2",
    "grid_sample_bilinear",
    "flow_warp",
    "unfold",
    "fold",
    "fold_normalized",
    "conv2d",
    "conv3d",
    "leaky_relu",
    "layer_norm",
    "modulated_deform_conv2d",
]
