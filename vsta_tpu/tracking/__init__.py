from .kalman import KalmanFilter2D
from .sort import SortTracker, Track

__all__ = ["KalmanFilter2D", "SortTracker", "Track"]
