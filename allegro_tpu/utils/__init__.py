"""Utilities: rank-aware logging, profiling hooks, dtype helpers."""

from .logging import RankedLogger
from .profiling import profile_trace

__all__ = ["RankedLogger", "profile_trace"]
