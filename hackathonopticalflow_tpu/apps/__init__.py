from .pathfinder import PathfinderApp, PathfinderConfig
from .dense_viewer import DenseViewerApp, DenseViewerConfig
from .tracker_app import TrackerApp, TrackerAppConfig

__all__ = [
    "PathfinderApp",
    "PathfinderConfig",
    "DenseViewerApp",
    "DenseViewerConfig",
    "TrackerApp",
    "TrackerAppConfig",
]
