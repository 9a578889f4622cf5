from .logging import get_logger, setup_logging
from .profiling import Timer, FpsCounter

__all__ = ["get_logger", "setup_logging", "Timer", "FpsCounter"]
