from .video import VideoReader, read_frames, read_gray_pair
from .prefetch import FramePrefetcher, batch_frames
from . import native_lib
from . import tools

__all__ = [
    "VideoReader",
    "read_frames",
    "read_gray_pair",
    "FramePrefetcher",
    "batch_frames",
    "native_lib",
    "tools",
]
