from .lk_grid import lk_grid_flow, lk_grid_flow_video, GridFlowResult
from .dense import farneback_flow
from .tracker import TrackerState, init_tracker, track_step

__all__ = [
    "lk_grid_flow",
    "lk_grid_flow_video",
    "GridFlowResult",
    "farneback_flow",
    "TrackerState",
    "init_tracker",
    "track_step",
]
