from .profiling import Timer, time_execution
from .logging import get_logger

__all__ = ["Timer", "time_execution", "get_logger"]
