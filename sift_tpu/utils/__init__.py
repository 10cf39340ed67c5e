"""Utilities: metrics logging, profiling, debugging."""

from sift_tpu.utils.metrics import MetricsLogger, stage, profile_trace

__all__ = ["MetricsLogger", "stage", "profile_trace"]
