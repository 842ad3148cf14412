"""Named experiment presets for models and data."""

from .model import ModelFactory, fetch_dtype
from .data import DataFactory

__all__ = ["ModelFactory", "DataFactory", "fetch_dtype"]
