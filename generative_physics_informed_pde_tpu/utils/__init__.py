"""Generic utilities: timing, experiment databases, string helpers."""

from .strings import ensure_file_extension
from .time import StopWatch, Timer
from .database import ParameterStudy, ResultsDatabase, ParallelStudyPoolBoy

__all__ = ["ensure_file_extension", "StopWatch", "Timer", "ParameterStudy",
           "ResultsDatabase", "ParallelStudyPoolBoy"]
