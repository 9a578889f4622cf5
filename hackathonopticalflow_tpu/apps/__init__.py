from .pathfinder import PathfinderApp, PathfinderConfig

__all__ = ["PathfinderApp", "PathfinderConfig"]
