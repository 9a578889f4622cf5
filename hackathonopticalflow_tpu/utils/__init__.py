from .logging import get_logger, setup_logging
from .profiling import Timer, FpsCounter, device_trace
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "get_logger",
    "setup_logging",
    "Timer",
    "FpsCounter",
    "device_trace",
    "save_checkpoint",
    "load_checkpoint",
]
