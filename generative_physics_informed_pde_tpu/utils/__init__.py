"""Generic utilities: timing, experiment databases, string helpers."""

from .strings import ensure_file_extension
from .time import StopWatch, Timer
from .database import ParameterStudy, ResultsDatabase, ParallelStudyPoolBoy
from .params import count_parameters, global_norm, freeze_mask, freeze_optimizer

__all__ = ["ensure_file_extension", "StopWatch", "Timer", "ParameterStudy",
           "ResultsDatabase", "ParallelStudyPoolBoy", "count_parameters",
           "global_norm", "freeze_mask", "freeze_optimizer"]
