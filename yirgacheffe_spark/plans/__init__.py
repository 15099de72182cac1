from . import executor
from .session import get_spark

__all__ = ["executor", "get_spark"]
