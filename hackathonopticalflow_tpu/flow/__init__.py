from .lk_grid import lk_grid_flow, lk_grid_flow_video, GridFlowResult
from .dense import farneback_flow, farneback_flow_video
from .tracker import TrackerState, init_tracker, track_step

__all__ = [
    "lk_grid_flow",
    "lk_grid_flow_video",
    "GridFlowResult",
    "farneback_flow",
    "farneback_flow_video",
    "TrackerState",
    "init_tracker",
    "track_step",
]
