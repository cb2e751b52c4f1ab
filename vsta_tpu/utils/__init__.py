from .visualization import save_bev_heatmap, save_predictions_json, save_learning_curves
from .logging import ScalarLogger, MetricWriter
from .telemetry import device_memory_stats, host_stats

__all__ = [
    "save_bev_heatmap",
    "save_predictions_json",
    "save_learning_curves",
    "ScalarLogger",
    "MetricWriter",
    "device_memory_stats",
    "host_stats",
]
