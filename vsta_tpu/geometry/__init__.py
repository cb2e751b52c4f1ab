from .homography import (
    rodrigues,
    compute_homography,
    invert_homography,
    project_points,
    pixel_to_world,
    geom_consistency_error,
)
from .bev import (
    ground_grid,
    meters_to_bev_indices,
    bev_indices_to_meters,
    bev_sample_coords,
    bev_sample_coords_with_depth,
)

__all__ = [
    "rodrigues",
    "compute_homography",
    "invert_homography",
    "project_points",
    "pixel_to_world",
    "geom_consistency_error",
    "ground_grid",
    "meters_to_bev_indices",
    "bev_indices_to_meters",
    "bev_sample_coords",
    "bev_sample_coords_with_depth",
]
