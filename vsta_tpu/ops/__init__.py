from .warp import (
    bilinear_sample,
    warp_views,
    fused_warp_proj,
    precompute_warp_lut,
)
from .splat import draw_gaussians, gaussian_radius
from .decode import decode_detections, nms2d
from .losses import heatmap_focal_loss, masked_l1_loss, gather_bev

__all__ = [
    "bilinear_sample",
    "warp_views",
    "fused_warp_proj",
    "precompute_warp_lut",
    "draw_gaussians",
    "gaussian_radius",
    "decode_detections",
    "nms2d",
    "heatmap_focal_loss",
    "masked_l1_loss",
    "gather_bev",
]
