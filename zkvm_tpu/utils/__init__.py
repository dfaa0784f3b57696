"""Utilities: phase metrics and profiling."""

from .metrics import Metrics, phase, report, trace_to

__all__ = ["Metrics", "phase", "report", "trace_to"]
