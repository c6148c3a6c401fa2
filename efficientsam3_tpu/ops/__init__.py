from efficientsam3_tpu.ops.interpolate import resize, resize_bilinear, resize_bicubic
from efficientsam3_tpu.ops.grid_sample import grid_sample
from efficientsam3_tpu.ops.roi_align import roi_align

__all__ = [
    "resize",
    "resize_bilinear",
    "resize_bicubic",
    "grid_sample",
    "roi_align",
]
