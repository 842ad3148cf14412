"""Dataset management: loaders, partitioned dataset views."""

from .loader import DataLoader, DataSet

__all__ = ["DataLoader", "DataSet"]
