from .config import (
    LKParams,
    FarnebackParams,
    FeatureParams,
    TrackerParams,
    FilterParams,
    NormalizeParams,
    GridParams,
)
from .grid import measurement_grid

__all__ = [
    "LKParams",
    "FarnebackParams",
    "FeatureParams",
    "TrackerParams",
    "FilterParams",
    "NormalizeParams",
    "GridParams",
    "measurement_grid",
]
