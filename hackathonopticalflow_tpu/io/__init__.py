from .video import VideoReader, read_frames, read_gray_pair

__all__ = ["VideoReader", "read_frames", "read_gray_pair"]
