from .calibration import (
    load_wildtrack_calibrations,
    load_camera_xml,
    rescale_intrinsics,
)
from .wildtrack import WildtrackDataset, collate
from .synthetic import generate_synthetic_wildtrack, make_ring_camera
from .pipeline import Prefetcher, split_train_val

__all__ = [
    "load_wildtrack_calibrations",
    "load_camera_xml",
    "rescale_intrinsics",
    "WildtrackDataset",
    "collate",
    "generate_synthetic_wildtrack",
    "make_ring_camera",
    "Prefetcher",
    "split_train_val",
]
