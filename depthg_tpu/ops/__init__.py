"""TPU-first tensor ops with exact reference (PyTorch) semantics.

All resampling here is expressed as small dense weight-matrix matmuls or
gathers so XLA can map it onto the MXU/VPU instead of scalar loops.
"""

from depthg_tpu.ops.resize import (
    resize_bilinear,
    resize_bicubic,
    adaptive_avg_pool2d,
    adaptive_max_pool2d,
)
from depthg_tpu.ops.sampling import grid_sample, sample, super_perm, random_coords
from depthg_tpu.ops.correlation import norm, tensor_correlation, depth_correlation
from depthg_tpu.ops.depth import (
    depth2points,
    fps_indices,
    farthest_point_sampling_depth,
)

__all__ = [
    "resize_bilinear",
    "resize_bicubic",
    "adaptive_avg_pool2d",
    "adaptive_max_pool2d",
    "grid_sample",
    "sample",
    "super_perm",
    "random_coords",
    "norm",
    "tensor_correlation",
    "depth_correlation",
    "depth2points",
    "fps_indices",
    "farthest_point_sampling_depth",
]
