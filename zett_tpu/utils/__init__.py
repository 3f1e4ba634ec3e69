"""Utilities: profiling, cost analysis."""

from .cost_analysis import cost_analysis
from .profiling import StepTimer, trace

__all__ = ["StepTimer", "cost_analysis", "trace"]
